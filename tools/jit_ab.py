"""A/B harness for the residual JIT-churn diagnosis (round 12).

Round 11 measured 2-10 s of HotSpot compiler CPU per RE-execution of
the SAME DataFrame object even with the 10000-entry codegen-class
cache. Hypotheses:

  (a) AQE re-plans each stage per execution and the re-planned
      WholeStageCodegen subtrees get fresh codegenStageIds; with
      ``spark.sql.codegen.useIdInClassName=true`` (default) the stage
      id is embedded in the generated CLASS NAME, i.e. in the source
      text that keys the Janino cache — so every execution is a cache
      MISS on source that differs only by class name.
  (b) AQE itself generates genuinely different plans per run.
  (c) something else (metric ids in source, broadcast relation ids).

Usage:
    python tools/jit_ab.py QUERY [QUERY...] [--reps 4] \
        [--conf spark.sql.adaptive.enabled=false] [--conf k=v ...]

For each query: build the raw plan ONCE, execute it ``--reps`` times
into the noop sink, print per-rep wall / JVM CPU / JIT compiler time.
Compare runs with different --conf sets to attribute the churn.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from de_project_sprint_etl_spark.plans import registry  # noqa: E402
from de_project_sprint_etl_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--fresh-plan", action="store_true",
                    help="rebuild the raw plan per rep (bench methodology)")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark(app_name="jit_ab", extra_conf=extra)
    for k, v in extra.items():
        try:
            spark.conf.set(k, v)
        except Exception as exc:  # static confs can't be re-set post-start
            print(f"# conf {k}: {exc}", file=sys.stderr)
    qs = entrymod.queries()
    jvm_pid = int(spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid())
    clk = os.sysconf("SC_CLK_TCK")
    comp = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getCompilationMXBean()

    def jit_s() -> float:
        return comp.getTotalCompilationTime() / 1000.0

    def jvm_cpu() -> float:
        with open(f"/proc/{jvm_pid}/stat") as fh:
            parts = fh.read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / clk

    print(f"# conf overrides: {extra or 'none'}")
    for name in args.names:
        if name not in qs:
            print(f"!! unknown query: {name}")
            continue
        fn = registry.RAW_QUERIES.get(name, qs[name])
        # warm pass (uncounted): derived-stream caches, parquet footers
        qs[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        registry._PLAN_CACHE.clear()
        df = fn(spark, args.sf_dir)
        rows = []
        for i in range(args.reps):
            if args.fresh_plan and i > 0:
                df = fn(spark, args.sf_dir)
            c0, j0, t0 = jvm_cpu(), jit_s(), time.time()
            df.write.format("noop").mode("overwrite").save()
            rows.append((time.time() - t0, jvm_cpu() - c0, jit_s() - j0))
            spark.catalog.clearCache()
            registry._PLAN_CACHE.clear()
        per = "  ".join(
            f"[{i}] wall={w:.2f} cpu={c:.1f} jit={j:.1f}"
            for i, (w, c, j) in enumerate(rows)
        )
        print(f"{name}: {per}")


if __name__ == "__main__":
    main()
