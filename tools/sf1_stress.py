"""Memory-cliff stress run at sf1 (VERDICT r4, next-round #4).

Runs the flagship retention pipeline + the top dedup/ANN queries at the
GENUINE sf1 corpus (tools/gen_sf1.py — 10x the bench scale, ~6M
lineitem) in the 128 GiB sandbox and records, per query:

- steady-state wall time (one warm pass, one timed pass, noop sink)
- shuffle spill (memory + disk bytes, summed over the timed pass's
  stages via the status API — the direct answer to "did it hit the
  cliff")
- plan-shape parity: the number of Exchange / BroadcastExchange nodes
  in the STATICALLY-PLANNED (pre-execution) plan at sf0.1 vs sf1.
  Because the noop write executes its own QueryExecution, the counted
  plan is the dataframe's initial adaptive plan (isFinalPlan=false):
  it reflects Catalyst's size-statistics decisions (file-size-driven
  broadcast choices — which is how it caught the triangle tier's
  broadcast→SMJ shift at sf1) but NOT AQE's runtime conversions. A
  difference is a PROMPT to read executed explains manually (collect()
  the frame, then explain()), not automatically a regression; the
  regression signature is BroadcastExchange falling to zero while
  Exchange grows (a dim side silently outgrowing the broadcast
  threshold).

Usage: python tools/sf1_stress.py [query ...]   → markdown table rows.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__  # noqa: E402,F401 — registers all queries
from de_project_sprint_etl_spark.plans import registry  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "sf1"
)
DEFAULT = [
    "retention_compact",
    "retention_mart",
    "exact_dedup",
    "minhash_lsh_dedup",
    "ngram_jaccard_dedup",
    "semdedup_embeddings_adaptive",
    "ann_ivf_topk",
    "ann_ivf_topk_adaptive",
    "pq_adc_topk",
    "scd2_weeks_overlap",
    "triangle_count_copurchase",
    # one representative per remaining tier (round 5 widening)
    "tpch_q9_product_profit",
    "tpch_q21_suppliers_kept_waiting",
    "bm25_topk_docs",
    "events_sessionize",
    "streaming_exact_dedup",
    # round-6 additions: the saturation signal and the tier it drives
    "vocab_growth_curve",
    "dedup_strategy_select",
    "adaptive_dedup_pairs",
]


def exchange_counts(df) -> tuple[int, int]:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return (
        len(re.findall(r"\bExchange\b", plan)),
        len(re.findall(r"BroadcastExchange", plan)),
    )


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications") as r:
        app = json.load(r)[0]["id"]
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def spill_since(spark, seen_stage_ids: set[int]) -> tuple[int, int, set[int]]:
    stages = _api(spark, "stages?status=complete")
    mem = disk = 0
    ids = set(seen_stage_ids)
    for s in stages:
        sid = (s["stageId"], s["attemptId"])
        if sid in ids:
            continue
        ids.add(sid)
        mem += s.get("memoryBytesSpilled", 0)
        disk += s.get("diskBytesSpilled", 0)
    return mem, disk, ids


def main() -> None:
    from de_project_sprint_etl_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT
    if not os.path.exists(os.path.join(SF1, "lineitem.parquet")):
        raise SystemExit("run tools/gen_sf1.py first")
    # the ENGINE's shipping confs (AQE, 64 MB broadcast threshold, code
    # cache) — a first cut with a bare session showed broadcast→SMJ
    # flips that were just the default 10 MB threshold, not the plans;
    # only the UI flips on, because the status API is the spill source
    spark = get_spark(
        app_name="sf1_stress", extra_conf={"spark.ui.enabled": "true"}
    )
    seen: set[int] = set()
    print("| query | sf0.1 s | sf1 s | ratio | spill (mem/disk) | exchanges 0.1→1 |")
    print("|---|---|---|---|---|---|")
    for n in names:
        fn = registry.RAW_QUERIES[n]
        t01 = None
        fn(spark, SF01).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        t0 = time.time()
        df01 = fn(spark, SF01)
        df01.write.format("noop").mode("overwrite").save()
        t01 = time.time() - t0
        ex01 = exchange_counts(df01)
        spark.catalog.clearCache()

        fn(spark, SF1).write.format("noop").mode("overwrite").save()  # warm
        spark.catalog.clearCache()
        _, _, seen = spill_since(spark, seen)  # flush pre-timed stages
        t0 = time.time()
        df1 = fn(spark, SF1)
        df1.write.format("noop").mode("overwrite").save()
        t1 = time.time() - t0
        ex1 = exchange_counts(df1)
        mem, disk, seen = spill_since(spark, seen)
        spark.catalog.clearCache()
        flag = "" if ex01 == ex1 else "  **PLAN DIFF (read explains)**"
        print(
            f"| {n} | {t01:.2f} | {t1:.2f} | {t1 / t01:.1f}x "
            f"| {mem}/{disk} | {ex01[0]}/{ex01[1]} → {ex1[0]}/{ex1[1]}{flag} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
