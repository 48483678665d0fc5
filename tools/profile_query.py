"""Per-query optimization profiler (round 11).

Usage:
    python tools/profile_query.py NAME [NAME...] [--reps 3] [--plan-dir plans/r11 --plan-suffix before]

For each query: one uncounted warm run into the noop sink (bench
methodology — steady-state JIT/codegen, derived-stream caches built),
then ``--reps`` timed runs of a FRESH raw plan each time (same
RAW_QUERIES discipline as bench.py so warm shuffle files can't serve
exchanges), cache cleared between runs. Prints min/median/max so
host-variance outliers are visible, and optionally dumps
``explain("formatted")`` to ``<plan-dir>/<name>_<suffix>.txt``.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from de_project_sprint_etl_spark.plans import registry  # noqa: E402
from de_project_sprint_etl_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--plan-suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="profile")
    qs = entrymod.queries()
    jvm_pid = int(spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid())
    clk = os.sysconf("SC_CLK_TCK")
    _comp = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getCompilationMXBean()

    def jit_s() -> float:
        # cumulative HotSpot compiler CPU (all compiler threads), secs
        return _comp.getTotalCompilationTime() / 1000.0

    def jvm_cpu() -> float:
        # utime+stime of the local-mode JVM (driver+executors in one
        # process) from /proc — getProcessCpuTime is module-blocked
        # through py4j. Python workers are separate processes and not
        # counted; fine for the JVM-side plans this profiles.
        with open(f"/proc/{jvm_pid}/stat") as fh:
            parts = fh.read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / clk

    for name in args.names:
        if name not in qs:
            print(f"!! unknown query: {name}")
            continue
        fn = registry.RAW_QUERIES.get(name, qs[name])
        # warm (uncounted)
        spark.sparkContext.setJobDescription(f"warm: {name}")
        qs[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        registry._PLAN_CACHE.clear()
        spark.sparkContext._jvm.System.gc()
        times = []
        cpus = []
        jits = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"timed[{i}]: {name}")
            # t0 BEFORE the plan build — bench.py counts plan-build time
            # (and any eager work inside it, e.g. iterative queries'
            # localCheckpoints) in the query's number, so we must too
            c0 = jvm_cpu()
            j0 = jit_s()
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            # JVM-process CPU seconds: robust to hypervisor steal, the
            # noise-immune twin of the wall number (same-query A/Bs
            # should improve BOTH or the "win" is scheduling luck)
            cpus.append(jvm_cpu() - c0)
            jits.append(jit_s() - j0)
            spark.catalog.clearCache()
            registry._PLAN_CACHE.clear()
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.plan_dir, f"{name}_{args.plan_suffix}.txt"), "w") as fh:
                fh.write(plan)
        ts = ", ".join(f"{t:.3f}" for t in times)
        print(
            f"{name}: wall min={min(times):.3f} med={statistics.median(times):.3f} "
            f"max={max(times):.3f}  cpu min={min(cpus):.2f} med={statistics.median(cpus):.2f} "
            f"jit min={min(jits):.2f} med={statistics.median(jits):.2f}  [{ts}]"
        )


if __name__ == "__main__":
    main()
