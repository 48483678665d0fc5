"""Round-4 reliability / allocation / normalization ops: invariants +
plan shapes (plans/analytics.py)."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__  # noqa: E402,F401 — populates the registry

from de_project_sprint_etl_spark.plans.governance import ATTR_WINDOW_US  # noqa: E402
from de_project_sprint_etl_spark.plans.registry import RAW_QUERIES  # noqa: E402
from de_project_sprint_etl_spark.plans.testdata import events_df, t  # noqa: E402
from de_project_sprint_etl_spark.plans.warehouse import (  # noqa: E402
    q_scd2_customer_priority,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_range_checksums_fold_to_global_checksum(spark):
    """XOR of the 64 per-range checksums == the whole-table checksum
    (the Merkle property: the parent node is the fold of its children),
    and the bucket row counts sum to the table count."""
    buckets = RAW_QUERIES["orders_checksum_by_range"](spark, SF)
    folded = buckets.agg(
        F.sum("n_rows").alias("n_rows"), F.bit_xor("checksum").alias("checksum")
    ).collect()[0]
    total = RAW_QUERIES["orders_table_checksum"](spark, SF).collect()[0]
    assert folded["n_rows"] == total["n_rows"]
    assert folded["checksum"] == total["checksum"]


def test_linear_attribution_conserves_pennies(spark):
    """SUM(credit cents) across all touches == SUM(rev_cents) of the
    purchases that have >=1 candidate click — allocation is exact, no
    credit is created or destroyed by the split."""
    out = RAW_QUERIES["attribution_linear_touch"](spark, SF)
    credited_cents = out.agg(
        F.round(F.sum("attributed_revenue") * 100).cast("bigint").alias("c")
    ).collect()[0]["c"]

    ev = events_df(spark, SF)
    us = F.unix_micros(F.col("ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", us.alias("c_us")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        us.alias("p_us"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("rev_cents"),
    )
    attributed = (
        purch.join(clicks, "user_id")
        .filter(
            (F.col("c_us") <= F.col("p_us"))
            & (F.col("p_us") - F.col("c_us") <= ATTR_WINDOW_US)
        )
        .groupBy("p_id")
        .agg(F.min("rev_cents").alias("rev_cents"))
    )
    expected = attributed.agg(F.sum("rev_cents").alias("c")).collect()[0]["c"]
    assert credited_cents == expected


def test_scd2_weeks_overlap_matches_naive_overlap_join(spark):
    """The week-Monday bucketing decomposition emits exactly the pairs
    a naive overlap-predicate join emits (Spark-side cross-check; the
    oracle cross-checks the same decomposition on DuckDB)."""
    fast = RAW_QUERIES["scd2_weeks_overlap"](spark, SF)

    dim = q_scd2_customer_priority(spark, SF).select(
        "o_custkey",
        "priority",
        F.col("valid_from").cast("date").alias("vf"),
        F.col("valid_to").cast("date").alias("vt_raw"),
    )
    from de_project_sprint_etl_spark.plans.testdata import weeks_dim

    weeks = weeks_dim(spark, SF)
    cap = weeks.agg(F.max("end_date").alias("max_end"))
    capped = dim.crossJoin(F.broadcast(cap)).select(
        "o_custkey", "priority", "vf", F.coalesce("vt_raw", "max_end").alias("vt")
    )
    naive = (
        capped.join(
            F.broadcast(weeks),
            (F.col("vf") <= F.col("end_date"))
            & (F.col("start_date") <= F.col("vt")),
        )
        .groupBy("period", "priority")
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )
    assert fast.exceptAll(naive).count() == 0
    assert naive.exceptAll(fast).count() == 0


def test_hll_cascade_merge_equals_direct_sketch(spark):
    """The merge of per-type sketches estimates the same as one sketch
    built directly over all users — the reaggregability invariant —
    and the gate query's hashed verdict column is TRUE on every scope
    (the estimate sits within the stated bound of the exact count)."""
    ev = events_df(spark, SF).select("event_type", "user_id")
    merged = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0]["e"]
    assert merged == direct
    rows = RAW_QUERIES["hll_distinct_cascade"](spark, SF).collect()
    assert {r["scope"] for r in rows} >= {"ALL"}
    for r in rows:
        assert r["within_bound"], r


def test_null_safe_join_keeps_null_keys_and_hash_joins(spark):
    """<=> keeps the NULL-key group (row total preserved); a plain
    equality join silently drops it. The null-safe form still plans as
    a broadcast HASH join — no nested-loop fallback."""
    out = RAW_QUERIES["null_safe_join_props"](spark, SF)
    n_joined = out.agg(F.sum("n")).collect()[0][0]
    ev = events_df(spark, SF)
    keyed = ev.select(
        F.nullif(
            F.get_json_object("props", "$.k").cast("int") % 7, F.lit(3)
        ).alias("k7")
    )
    assert n_joined == keyed.count()
    labels = {r["key_label"] for r in out.collect()}
    assert "<NULL>" in labels

    dim = keyed.distinct().withColumnRenamed("k7", "d_k7")
    unsafe = keyed.join(F.broadcast(dim), F.col("k7") == F.col("d_k7"))
    assert unsafe.count() == keyed.filter(F.col("k7").isNotNull()).count()

    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quantile_normalization_bounds_and_extremes(spark):
    """q_norm stays inside the global [min, max] n_chars range, and the
    longest doc of every source maps to the global max (pr=1 hits the
    top grid point exactly)."""
    d = t(spark, SF, "documents")
    lo, hi = d.agg(F.min("n_chars"), F.max("n_chars")).collect()[0]
    out = RAW_QUERIES["quantile_normalize_doclen"](spark, SF)
    bad = out.filter(
        (F.col("q_norm") < float(lo) - 1e-9) | (F.col("q_norm") > float(hi) + 1e-9)
    ).count()
    assert bad == 0
    tops = (
        out.withColumn(
            "rk",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("source")
                .orderBy(F.desc("n_chars"), F.desc("doc_id"))
            ),
        )
        .filter(F.col("rk") == 1)
        .collect()
    )
    for r in tops:
        assert abs(r["q_norm"] - float(hi)) < 1e-6, r


def test_daily_correlation_matches_builtin_corr(spark):
    """The exact-moment Pearson r agrees with F.corr to float precision
    (the difference is reproducibility, not the statistic)."""
    o = t(spark, SF, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_totalprice").alias("rev"),
    )
    builtin = daily.agg(F.corr("n", "rev")).collect()[0][0]
    ours = RAW_QUERIES["daily_metric_correlation"](spark, SF).collect()[0][
        "pearson_r"
    ]
    assert abs(ours - builtin) < 1e-6


def test_scd2_weeks_overlap_is_sweepline_not_explode(spark):
    """The round-4 rewrite must stay explode-free over the INTERVAL
    table: the old plan's Generate node (interval -> covered weeks) was
    the 22M-row blowup. The r11 week-lookup grid introduces one bounded
    Generate — explode(sequence(w_first, w_last)) over a ONE-ROW week
    aggregate (O(calendar span), the same bound as the week dim) — so
    the pin is: every Generate in the plan is that sequence explode,
    never a generator over interval rows."""
    import re

    plan = plan_of(RAW_QUERIES["scd2_weeks_overlap"](spark, SF))
    lines = plan.splitlines()
    gen_idx = [
        i for i, ln in enumerate(lines) if re.match(r"^\(\d+\) Generate", ln)
    ]
    assert gen_idx, plan  # the grid build is expected in the plan
    for i in gen_idx:
        detail = "\n".join(lines[i : i + 4])
        assert "explode(sequence(" in detail, detail


def test_zorder_effectiveness_favors_zorder_on_2d_box(spark):
    """The hashed metric itself must show the layout argument: for the
    2-D box predicate, z-order scans strictly fewer rows than either
    single-column sort at the same match count."""
    rows = {
        r["layout"]: r
        for r in RAW_QUERIES["zorder_skipping_effectiveness"](spark, SF).collect()
    }
    assert rows["zorder"]["rows_matched"] == rows["sort_a"]["rows_matched"]
    assert rows["zorder"]["rows_matched"] == rows["sort_b"]["rows_matched"]
    assert rows["zorder"]["rows_scanned"] < rows["sort_a"]["rows_scanned"]
    assert rows["zorder"]["rows_scanned"] < rows["sort_b"]["rows_scanned"]
    # skipping never misses: every matched row lives in a scanned bucket
    for r in rows.values():
        assert r["rows_scanned"] >= r["rows_matched"]


def test_zorder_scaled_sql_integer_stable_at_boundaries(spark):
    """The r6 gate red cell class: a value whose TRUE grid coordinate is
    exactly an integer boundary must land in the same cell on every
    engine AND match the exact rational floor. Constructed adversarially:
    span = 255 * k so (x - mn) * 255 / span hits integer boundaries for
    every k-th value, with 2-decimal inputs (int_scale=100) — the exact
    shape of o_totalprice. The old double-FLOOR form could drift one
    cell at these points under FMA contraction; the integer-stable form
    is pure int math so all three answers (Spark, DuckDB, Python
    rational) must be identical."""
    import duckdb

    from de_project_sprint_etl_spark.functions.layout import scaled_sql

    k = 7
    # 2-decimal doubles: mn = 3.21, values step 0.01, span = 2.55 * k
    cents = [321 + i for i in range(255 * k + 1)]
    vals = [c / 100.0 for c in cents]
    expr = scaled_sql("v", "mn", "mx", int_scale=100)
    sql = (
        "SELECT CAST(FLOOR(v * 100 + 0.5) AS BIGINT) AS c, {e} AS cell FROM "
        "(SELECT v, MIN(v) OVER () AS mn, MAX(v) OVER () AS mx FROM rel)"
    ).format(e=expr)

    sdf = spark.createDataFrame([(v,) for v in vals], "v double")
    sdf.createOrReplaceTempView("rel")
    got_spark = dict(
        spark.sql(sql).rdd.map(lambda r: (r["c"], r["cell"])).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE rel AS SELECT * FROM (VALUES {}) t(v)".format(
        ", ".join(f"({v!r})" for v in vals)
    ))
    got_duck = dict(con.execute(sql).fetchall())

    mn_c, mx_c = cents[0], cents[-1]
    for c in cents:
        want = min(255, (c - mn_c) * 255 // (mx_c - mn_c))
        assert got_spark[c] == want, (c, got_spark[c], want)
        assert got_duck[c] == want, (c, got_duck[c], want)


def test_match_recognize_funnel_semantics(spark, tmp_path):
    """Pattern semantics on a constructed sequence, pinned exactly:
    non-overlapping s..c..p matches, error resets the run, a purchase
    closes its run (SKIP PAST LAST ROW), click must FOLLOW a signup."""
    import datetime as dt

    rows = []
    # user 1: s c p | s c p        -> 2 purchases, 2 matches
    # user 2: s e c p              -> error resets: purchase, no match
    # user 3: c s p                -> click before signup: no match
    # user 4: s c e p              -> error between click and purchase
    # user 5: s c p c p            -> 2nd p has click but no NEW signup
    seqs = {1: "scpscp", 2: "secp", 3: "csp", 4: "scep", 5: "scpcp"}
    kinds = {"s": "signup", "c": "click", "p": "purchase", "e": "error"}
    eid = 0
    for u, seq in seqs.items():
        for i, ch in enumerate(seq):
            eid += 1
            rows.append(
                (eid, u, kinds[ch], dt.datetime(2024, 1, 1, 0, i), 1.0)
            )
    src = str(tmp_path / "mr_events")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    ).write.parquet(src)

    from unittest.mock import patch

    from de_project_sprint_etl_spark.plans import analytics

    with patch.object(
        analytics, "events_df", lambda s, d: s.read.parquet(src)
    ):
        got = {
            r.user_id: (r.n_purchases, r.n_matches)
            for r in analytics.q_match_recognize_funnel(spark, src).collect()
        }
    assert got[1] == (2, 2)
    assert got[2] == (1, 0)
    assert got[3] == (1, 0)
    assert got[4] == (1, 0)
    assert got[5] == (2, 1)


def test_pandas_trimmed_mean_matches_python_reference(spark):
    """The grouped-agg pandas UDF equals a driver-side sort→trim→mean
    over exact cents, per group — and trimming actually trims (the
    trimmed mean differs from the plain mean on this data)."""
    rows = RAW_QUERIES["pandas_trimmed_mean_price"](spark, SF).collect()
    from de_project_sprint_etl_spark.plans.testdata import t

    vals = {}
    for r in t(spark, SF, "orders").select(
        "o_orderstatus", "o_totalprice"
    ).collect():
        vals.setdefault(r.o_orderstatus, []).append(
            int(r.o_totalprice * 100 + 0.5)
        )
    assert rows
    for r in rows:
        v = sorted(vals[r.o_orderstatus])
        k = int(len(v) * 0.1)
        mid = v[k : len(v) - k] if len(v) - 2 * k > 0 else v
        assert r.n_orders == len(v)
        assert r.trimmed_mean_price == (sum(mid) / len(mid)) / 100.0
        plain = sum(v) / len(v) / 100.0
        assert r.trimmed_mean_price != plain


def test_clamped_balance_reflection_identity(spark):
    """The relational form b_t = c_t − min(0, running_min(c)) must equal
    the imperative fold b_t = max(0, b_{t-1} + d_t) on the real fixture
    stream — peak, final, and floor-hit counts per user."""
    from de_project_sprint_etl_spark.plans.testdata import events_df

    got = {
        r.user_id: (r.n_events, r.peak_balance_cents, r.n_floored,
                    r.final_balance_cents)
        for r in RAW_QUERIES["running_balance_clamped"](spark, SF).collect()
    }
    ev = sorted(
        events_df(spark, SF).select(
            "user_id", "event_id", "event_type", "value", "ts"
        ).collect(),
        key=lambda r: (r.ts, r.event_id),
    )
    want = {}
    for r in ev:
        n, b, peak, floored = want.get(r.user_id, (0, 0, 0, 0))
        cents = int(r.value * 100 + 0.5) if r.value is not None else 0
        d = cents if r.event_type == "purchase" else (
            -cents if r.event_type == "click" else 0
        )
        nb = max(0, b + d)
        if nb == 0 and d < 0:
            floored += 1
        want[r.user_id] = (n + 1, nb, max(peak, nb), floored)
    want = {u: (n, peak, fl, b) for u, (n, b, peak, fl) in want.items()}
    assert got == want


def test_analytics_ops_stay_jvm_side(spark):
    """No Python evaluation nodes, no cartesian products in any of the
    new plans (all small sides broadcast)."""
    for name in (
        "orders_checksum_by_range",
        "attribution_linear_touch",
        "scd2_weeks_overlap",
        "quantile_normalize_doclen",
        "daily_metric_correlation",
        "null_safe_join_props",
        "hll_distinct_cascade",
        "zorder_skipping_index",
        "zorder_skipping_effectiveness",
    ):
        plan = plan_of(RAW_QUERIES[name](spark, SF))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
