"""Round-3 curation ops: semantics + plan shapes.

Covers functions/dedup.positional_shingle_profile,
functions/embeddings.random_projection, and the plans/curation.py
bindings (recall eval, temperature mixture sampling).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import numpy as np
import pytest
from pyspark.sql import functions as F

from de_project_sprint_etl_spark.functions import dedup, embeddings, similarity

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# --- exact-substring duplication profile ------------------------------------


def test_positional_shingle_profile_flags_shared_runs(spark):
    a = " ".join(f"w{i}" for i in range(12))  # 12 tokens -> 5 windows of 8
    # b embeds tokens w2..w9 of a verbatim (one shared 8-token window),
    # padded to 12 tokens with its own vocabulary
    b = "x1 x2 " + " ".join(f"w{i}" for i in range(2, 10)) + " x3 x4"
    c = " ".join(f"z{i}" for i in range(12))  # disjoint
    short = "only three tokens here"  # < 8 tokens -> excluded
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, short)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in dedup.positional_shingle_profile(docs, n=8).collect()
    }
    assert set(out) == {1, 2, 3}  # the short doc has no window
    assert out[1]["n_shingles"] == 5 and out[2]["n_shingles"] == 5
    # exactly the one verbatim window is duplicated on each side
    assert out[1]["dup_shingles"] == 1 and out[2]["dup_shingles"] == 1
    assert out[1]["dup_frac"] == pytest.approx(0.2)
    assert out[3]["dup_shingles"] == 0 and out[3]["dup_frac"] == 0.0


def test_positional_shingle_profile_plan_shape(spark):
    """No Python evaluation and no window over the shingle stream — the
    occurrence count must be a partial-combinable hash aggregate (the
    skew-safe shape VERDICT r1 required for df-style cuts)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = plan_of(dedup.positional_shingle_profile(docs, n=8))
    assert "BatchEvalPython" not in plan
    assert ") Window" not in plan
    assert "partial_count" in plan or "HashAggregate" in plan


# --- JL random projection ---------------------------------------------------


def test_random_projection_matches_numpy(spark):
    planes = similarity.hyperplanes(dim=4, n_planes=3, seed=5)
    vecs = [[1.0, 2.0, 3.0, 4.0], [0.5, -1.0, 0.0, 2.0]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    )
    rows = {
        r["vec_id"]: r["proj"]
        for r in embeddings.random_projection(df, planes).collect()
    }
    P = np.array(planes)
    for i, v in enumerate(vecs):
        np.testing.assert_allclose(rows[i], P @ np.array(v), rtol=1e-9)


def test_random_projection_is_map_only(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    planes = similarity.hyperplanes(dim=64, n_planes=8, seed=11)
    plan = plan_of(embeddings.random_projection(emb, planes))
    assert ") Exchange" not in plan
    assert "BatchEvalPython" not in plan


# --- recall eval + mixture sampling (plan-level, via the registry) ----------


def test_ann_recall_eval_bounds(spark):
    from de_project_sprint_etl_spark.plans.curation import q_ann_recall_eval

    rows = q_ann_recall_eval(spark, SF).collect()
    assert rows, "recall eval returned no queries"
    for r in rows:
        assert r["k_true"] == 5
        assert 0 <= r["n_hits"] <= 5
        assert r["recall_at_k"] == pytest.approx(r["n_hits"] / 5.0, abs=1e-6)


def test_mixture_sample_is_deterministic_and_rate_capped(spark):
    from de_project_sprint_etl_spark.plans.curation import (
        q_mixture_sample_temperature,
    )

    a = q_mixture_sample_temperature(spark, SF)
    first = sorted(r["doc_id"] for r in a.collect())
    second = sorted(r["doc_id"] for r in a.collect())
    assert first == second  # hash gate, not RNG: stable across runs
    for r in a.select("keep_frac").distinct().collect():
        assert 0.0 < r["keep_frac"] <= 1.0


def test_mixture_sample_broadcasts_rates(spark):
    """The corpus side must meet the tiny rate table in a broadcast hash
    join — never shuffle the documents on source."""
    from de_project_sprint_etl_spark.plans.curation import (
        q_mixture_sample_temperature,
    )

    plan = plan_of(q_mixture_sample_temperature(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


# --- span removal -----------------------------------------------------------


def test_strip_duplicated_spans_removes_shared_run(spark):
    a = " ".join(f"w{i}" for i in range(12))
    b = "x1 x2 " + " ".join(f"w{i}" for i in range(2, 10)) + " x3 x4"
    c = " ".join(f"z{i}" for i in range(12))
    docs = spark.createDataFrame([(1, a), (2, b), (3, c)], ["doc_id", "text"])
    out = {
        r["doc_id"]: r for r in dedup.strip_duplicated_spans(docs, n=8).collect()
    }
    # the shared window w2..w9 is removed from BOTH docs
    assert out[1]["n_tokens"] == 12 and out[1]["n_kept"] == 4
    assert out[1]["text_clean"] == "w0 w1 w10 w11"
    assert out[2]["n_kept"] == 4
    assert out[2]["text_clean"] == "x1 x2 x3 x4"
    # untouched doc passes through whole
    assert out[3]["n_kept"] == 12 and out[3]["text_clean"].startswith("z0 z1")


def test_strip_duplicated_spans_is_jvm_only(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = plan_of(dedup.strip_duplicated_spans(docs, n=8))
    assert "BatchEvalPython" not in plan
    assert ") Window" not in plan


# --- incremental minhash ----------------------------------------------------


def test_incremental_minhash_never_selfjoins_snapshot(spark):
    """Every emitted pair must be increment x snapshot — no
    snapshot-snapshot or increment-increment pairs."""
    from de_project_sprint_etl_spark.plans.curation import (
        q_incremental_minhash_dedup,
    )
    from de_project_sprint_etl_spark.plans.llm import MUT_OFFSET

    rows = q_incremental_minhash_dedup(spark, SF).collect()
    assert rows, "no incremental near-dup pairs found"
    for r in rows:
        assert r["id_inc"] >= MUT_OFFSET and r["id_snap"] < MUT_OFFSET
        assert 0.5 <= r["est_jaccard"] <= 1.0


# --- streaming-executed registry query --------------------------------------


def test_streaming_windowed_counts_equals_batch(spark):
    import de_project_sprint_etl_spark.plans.streamq  # noqa: F401 — registers
    from de_project_sprint_etl_spark.plans.registry import RAW_QUERIES

    stream_fn = RAW_QUERIES["streaming_windowed_counts"]
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in stream_fn(spark, SF).collect()
    }
    from de_project_sprint_etl_spark.plans.testdata import events_df

    ev = events_df(spark, SF)
    want = {
        (r["ws"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("ws"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .collect()
    }
    assert got == want
    # a second invocation starts a fresh stream and drops the old sink
    again = stream_fn(spark, SF)
    assert again.count() == len(want)


def test_bucketed_join_query_is_exchange_free_when_warm(spark):
    """The registry's bucketed-join query must run the join itself with
    zero exchanges once the bucketed tables exist (write-time shuffle
    amortized — the 100 TB layout the salted/broadcast demos contrast
    with)."""
    from de_project_sprint_etl_spark.plans.warehouse import (
        _bucketed_order_tables,
        q_bucketed_join_revenue,
    )

    assert q_bucketed_join_revenue(spark, SF).count() == 3
    to, tl = _bucketed_order_tables(spark, SF)
    joined = spark.table(tl).join(spark.table(to).hint("merge"), "o_orderkey")
    plan = plan_of(joined)
    assert ") Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_sqltext_retention_broadcasts_week_dim(spark):
    """The SQL-text retention mart must compile to the same physical
    strategy as the DataFrame pipeline: week dim broadcast, no
    nested-loop join, no Python."""
    from de_project_sprint_etl_spark.plans.sqlapi import (
        q_retention_compact_sqltext,
    )

    plan = plan_of(q_retention_compact_sqltext(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_pysource_pushdown_prunes_partitions():
    """pushFilters must consume shard-equality filters and partitions()
    must emit only the matching shard — the other shards are never
    generated."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    from de_project_sprint_etl_spark.sources.pysource import GraftGenReader

    r = GraftGenReader({"shards": "8", "rowspershard": "100"})
    rest = list(r.pushFilters([EqualTo(("shard",), 5), GreaterThan(("cents",), 10)]))
    # the non-shard filter is handed back for Spark to re-apply
    assert len(rest) == 1 and isinstance(rest[0], GreaterThan)
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].shard == 5
    # a second, contradictory equality intersects to the empty set (the
    # filter list is a conjunction)
    list(r.pushFilters([EqualTo(("shard",), 6)]))
    assert r.partitions() == []
    # unpruned reader generates every shard
    r2 = GraftGenReader({"shards": "8", "rowspershard": "100"})
    assert len(r2.partitions()) == 8


def test_pysource_rows_are_deterministic(spark):
    from de_project_sprint_etl_spark.sources import pysource

    pysource.register(spark)
    df = (
        spark.read.format("graftgen")
        .option("shards", "2").option("rowspershard", "50").load()
    )
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in df.collect())
    assert a == b and len(a) == 100
    k = 73  # shard 1, row 23
    assert (1, 73, (73 * 2654435761) % 1000, (73 * 1315423911) % 100000) in a


def test_pysource_sink_two_phase_commit(spark, tmp_path):
    """Custom Python sink: per-task temp files promoted by the driver on
    commit, _MANIFEST records the total, JSONL round-trips."""
    import json
    import os

    from de_project_sprint_etl_spark.sources import pysource

    pysource.register(spark)
    d = str(tmp_path / "sink")
    spark.range(100).selectExpr("id", "id * 2 AS v").write.format(
        "graftsink"
    ).option("path", d).mode("append").save()
    manifest = json.load(open(os.path.join(d, "_MANIFEST")))
    assert manifest["rows"] == 100
    assert not [f for f in os.listdir(d) if f.startswith("_tmp-")]
    back = spark.read.json(os.path.join(d, "part-*.jsonl"))
    assert back.count() == 100
    assert back.selectExpr("sum(v)").collect()[0][0] == sum(2 * i for i in range(100))
    # overwrite with a SMALLER job must leave no stale parts behind
    spark.range(10).selectExpr("id", "id AS v").coalesce(1).write.format(
        "graftsink"
    ).option("path", d).mode("overwrite").save()
    assert spark.read.json(os.path.join(d, "part-*.jsonl")).count() == 10
    assert json.load(open(os.path.join(d, "_MANIFEST")))["rows"] == 10
    # append adds uniquely-named parts and accumulates the manifest
    spark.range(5).selectExpr("id", "id AS v").coalesce(1).write.format(
        "graftsink"
    ).option("path", d).mode("append").save()
    assert spark.read.json(os.path.join(d, "part-*.jsonl")).count() == 15
    assert json.load(open(os.path.join(d, "_MANIFEST")))["rows"] == 15


def test_pysource_stream_reader_is_exact(spark):
    """Custom Python STREAMING source: micro-batches over the integer row
    model produce exactly the closed-form rows, then go quiescent."""
    import time

    from de_project_sprint_etl_spark.sources import pysource

    s = pysource.graftgen_stream(spark, batchsize=500, maxrows=1500)
    q = (
        s.writeStream.format("memory")
        .queryName("pysrc_t")
        .outputMode("append")
        .start()
    )
    try:
        for _ in range(120):
            if spark.table("pysrc_t").count() >= 1500:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = {tuple(r) for r in spark.table("pysrc_t").collect()}
    assert len(rows) == 1500
    want = {
        (0, k, (k * 2654435761) % 1000, (k * 1315423911) % 100000)
        for k in range(1500)
    }
    assert rows == want


def test_semdedup_drops_exact_copies_keeps_min_id(spark):
    """SemDeDup semantics on a constructed corpus: exact copies always
    share a cluster (identical vectors), their cosine is 1.0, and the
    min-id member is the one kept; vectors with no above-threshold
    neighbor are all kept."""
    from de_project_sprint_etl_spark.functions.clustering import semdedup

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (101, [1.0, 0.0, 0.0, 0.0]),   # copy of 1
        (102, [0.0, 1.0, 0.0, 0.0]),   # copy of 2
        (103, [0.70, 0.71, 0.0, 0.0]), # not a near-dup of anything @0.95
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.kept for r in semdedup(emb, k=3, iterations=1).collect()}
    assert out[1] and out[2] and out[3], out
    assert not out[101] and not out[102], out
    assert out[103], out


def test_semdedup_pair_comparison_is_cluster_blocked(spark):
    """The O(n²) comparison must be blocked by the cluster id: the pair
    join condition includes the cluster equality, so the physical plan
    joins on cluster — not a cross join over the corpus."""
    from de_project_sprint_etl_spark.functions.clustering import semdedup

    rows = [(i, [float(i % 7), float(i % 3), 1.0, 0.0]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plan = semdedup(emb, k=4, iterations=1)._jdf.queryExecution().executedPlan().toString()
    # the drops-side self-join must be an equi-join (hash/sort-merge on
    # cluster), never a CartesianProduct / BroadcastNestedLoopJoin scan
    # of all pairs
    assert "CartesianProduct" not in plan, plan


def test_semdedup_k_policy_fixes_cluster_size_not_k(spark):
    """The adaptive-k control (the paper's): k = ceil(n / target
    cluster size), floored. The policy math is exact, and on a 4×
    replica corpus the adaptive run (a) picks a k 4× larger, (b) keeps
    the total within-cluster pair work BOUNDED near the 1× level per
    unit of data — the invariant that makes SemDeDup linear in the
    corpus — while fixed k lets pair work grow quadratically."""
    from de_project_sprint_etl_spark.functions.clustering import (
        kmeans,
        semdedup_k_for,
    )

    assert semdedup_k_for(2200, 275) == 8
    assert semdedup_k_for(17_600, 275) == 64
    assert semdedup_k_for(100, 275) == 8  # floor
    assert semdedup_k_for(1_300_000_000, 100_000) == 13_000  # paper scale

    base = [(i, [float((i * 7) % 13), float((i * 3) % 11), float(i % 5), 1.0])
            for i in range(100)]
    rep = [(i + 1000 * r, v) for (i, v) in base for r in range(4)]
    emb = spark.createDataFrame(rep, "vec_id long, embedding array<double>")

    def pair_work(k: int) -> int:
        sizes = (
            kmeans(emb, k=k, iterations=1)
            .groupBy("cluster").count().collect()
        )
        return sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)

    k_fixed = 4
    k_adapt = semdedup_k_for(400, target_cluster_size=25, min_k=4)
    assert k_adapt == 16
    # the adaptive k cuts the pair bound by ~k_adapt/k_fixed vs fixed k
    # on the same corpus (clusters are not perfectly balanced, so pin a
    # conservative 2× improvement, not the ideal 4×)
    assert pair_work(k_adapt) * 2 < pair_work(k_fixed)


def test_semdedup_adaptive_equals_fixed_k_at_gate_scale(spark):
    """At gate fixture sizes the policy resolves to the fixed-k twin's
    k=8 (ceil(550/275)=2 → floor 8), so the two registered queries are
    row-identical — the property that lets the adaptive entry share the
    fixed-k oracle."""
    from de_project_sprint_etl_spark.plans import curation  # noqa: F401
    from de_project_sprint_etl_spark.plans.registry import RAW_QUERIES

    a = RAW_QUERIES["semdedup_embeddings_adaptive"](spark, SF)
    b = RAW_QUERIES["semdedup_embeddings"](spark, SF)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_distribution_match_sample_matches_target_shape(spark):
    """Acceptance-sampling property: the kept set's bucket histogram is
    proportional to the TARGET (English) histogram — each bucket's
    expected kept share equals its target share; allow generous
    hash-sampling noise. The max-ratio bucket must keep everything
    (rate exactly 1e6 ppm), and no rate may exceed it."""
    from de_project_sprint_etl_spark.plans import curation
    from de_project_sprint_etl_spark.plans.registry import RAW_QUERIES

    rows = RAW_QUERIES["distribution_match_sample"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    assert max(r.rate_ppm for r in rows) == curation.DM_PPM
    n_t = sum(r.n_target for r in rows)
    n_kept = sum(r.n_kept for r in rows)
    assert n_kept > 0
    for r in rows:
        assert 0 <= r.rate_ppm <= curation.DM_PPM
        want = r.n_target / n_t
        got = r.n_kept / n_kept
        # binomial noise bound, very loose: ±(0.5/sqrt(expected)+2%)
        exp = max(want * n_kept, 1.0)
        assert abs(got - want) <= 0.5 / exp**0.5 + 0.02, (r, got, want)


def test_dsir_weights_favor_target_like_docs(spark):
    """DSIR sanity on a constructed corpus: documents whose bigrams
    match the target distribution must score strictly higher than
    documents made of bigrams absent from the target."""
    from de_project_sprint_etl_spark.functions.lm import dsir_importance

    target_like = "the quick brown fox jumps over the lazy dog"
    offbeat = "zzq qqx xxv vvw wwu uut ttr rrs ssp ppo"
    docs = spark.createDataFrame(
        [(1, target_like), (2, offbeat), (3, target_like)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, target_like), (11, "quick brown fox and lazy dog again")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.logw for r in dsir_importance(docs, target, buckets=64).collect()}
    assert out[1] > out[2] and out[3] > out[2], out
    assert out[1] == out[3], out  # identical docs, identical weight


def test_linreg_gd_matches_closed_form_descent(spark):
    """The in-engine GD must compute exactly the textbook full-batch
    update: replay the same descent in plain Python and compare
    predictions to 6 decimals."""
    from de_project_sprint_etl_spark.functions.ml import linreg_gd

    rows = [
        (1, [1.0, 0.2], 1.0),
        (2, [1.0, 0.9], 0.0),
        (3, [1.0, 0.5], 1.0),
        (4, [1.0, 0.7], 0.0),
    ]
    feats = spark.createDataFrame(rows, "doc_id long, xs array<double>, y double")
    got = {r.doc_id: r.pred for r in linreg_gd(feats, 2, iterations=3, lr=0.5).collect()}

    w = [0.0, 0.0]
    n = len(rows)
    for _ in range(3):
        resid = [sum(x * wj for x, wj in zip(xs, w)) - y for _, xs, y in rows]
        grad = [sum(r * xs[j] for r, (_, xs, _y) in zip(resid, rows)) for j in range(2)]
        w = [wj - 0.5 * g / n for wj, g in zip(w, grad)]
    want = {i: round(sum(x * wj for x, wj in zip(xs, w)), 6) for i, xs, _ in rows}
    assert got == pytest.approx(want), (got, want)


def test_kmeans_grouped_is_independent_per_group(spark):
    """Group-wise k-means must equal running plain k-means per group:
    train two groups jointly and verify each group's assignment matches
    the single-group run on that group alone."""
    from de_project_sprint_etl_spark.functions.clustering import (
        kmeans,
        kmeans_grouped,
    )

    rows = []
    for g in (0, 1):
        for i in range(12):
            rows.append((g, i, [float((i * (g + 2)) % 5), float(i % 3)]))
    vec = spark.createDataFrame(rows, "grp int, vec_id long, ev array<double>")
    joint = {
        (r.grp, r.vec_id): (r.cluster, r.d2)
        for r in kmeans_grouped(vec, k=3, iterations=2, vec_col="ev").collect()
    }
    for g in (0, 1):
        solo = kmeans(
            vec.filter(F.col("grp") == g).select("vec_id", "ev"),
            k=3,
            iterations=2,
            vec_col="ev",
        )
        for r in solo.collect():
            assert joint[(g, r.vec_id)] == (r.cluster, r.d2), (g, r)


def test_pq_adc_is_exact_when_codebook_covers_corpus(spark):
    """With k >= n distinct subvectors, every vector is its own centroid
    (quantization error 0), so the asymmetric distance must equal the
    exact squared distance — pinning the ADC table lookup + fold
    against a closed form."""
    from de_project_sprint_etl_spark.functions.clustering import pq_adc_topk

    vecs = {i: [float(i), float(i % 3), float(7 - i), 1.0] for i in range(6)}
    rows = []
    for i, v in vecs.items():
        for g in (0, 1):
            rows.append((g, i, v[g * 2 : g * 2 + 2]))
    sub = spark.createDataFrame(rows, "grp int, vec_id long, ev array<double>")
    out = pq_adc_topk(sub, n_queries=2, k_codebook=16, iterations=1, topk=6).collect()
    got = {(r.query_id, r.neighbor_id): r.adc_dist for r in out}
    for q in (0, 1):
        for n, v in vecs.items():
            exact = round(sum((a - b) ** 2 for a, b in zip(vecs[q], v)), 6)
            assert got[(q, n)] == pytest.approx(exact), (q, n)


def test_ivfpq_candidates_are_confined_to_probed_cells(spark):
    """IVF pruning semantics: every returned neighbor must belong to
    one of the nprobe coarse cells probed for that query — verified by
    recomputing the coarse assignment and probe set independently."""
    from de_project_sprint_etl_spark.functions.clustering import (
        _sqdist,
        ivfpq_topk,
        kmeans,
    )

    rows = [(i, [float((i * 7) % 11), float((i * 3) % 5), float(i % 4), 1.0])
            for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sub = emb.select(
        "vec_id",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("grp"),
        F.col("embedding").alias("__e"),
    ).select("grp", "vec_id", F.expr("slice(__e, grp * 2 + 1, 2)").alias("ev"))
    out = ivfpq_topk(emb, sub, n_queries=3, coarse_k=4, nprobe=2,
                     k_codebook=4, iterations=1, topk=10).collect()

    assign, cent = kmeans(emb, k=4, iterations=1, with_centroids=True)
    cells = {r.vec_id: r.cluster for r in assign.collect()}
    cents = {r.cid: r.cv for r in cent.collect()}
    vecs = dict(rows)
    for q in range(3):
        dists = sorted(
            (sum((a - b) ** 2 for a, b in zip(vecs[q], cv)), cid)
            for cid, cv in cents.items()
        )
        probed = {cid for _, cid in dists[:2]}
        for r in out:
            if r.query_id == q:
                assert cells[r.neighbor_id] in probed, (q, r.neighbor_id)


def test_bpe_encode_greedy_leftmost_overlaps(spark):
    """Greedy leftmost semantics on overlapping pairs: with merge
    ('a','a'), 'aaa' must become ['aa','a'] (leftmost pair first), and
    a later-rank merge ('aa','a') must then produce ['aaa'] — matching
    the reference BPE encoder's scan order."""
    from de_project_sprint_etl_spark.functions.lm import bpe_encode_vocab

    docs = spark.createDataFrame([(1, "aaa aaaa")], "doc_id long, text string")
    out = {
        r.word: (r.pieces, r.n_pieces)
        for r in bpe_encode_vocab(docs, merges=(("a", "a"),)).collect()
    }
    assert out["aaa"] == ("aa a", 2), out
    assert out["aaaa"] == ("aa aa", 2), out

    out2 = {
        r.word: (r.pieces, r.n_pieces)
        for r in bpe_encode_vocab(docs, merges=(("a", "a"), ("aa", "a"), ("aa", "aa"))).collect()
    }
    assert out2["aaa"] == ("aaa", 1), out2
    assert out2["aaaa"] == ("aaaa", 1), out2


def test_dedup_strategy_selects_minhash_when_saturated(spark):
    """VERDICT r5 #3: the strategy selector must choose minhash_lsh in
    the df-SATURATED regime (new postings revisit existing shingles —
    the quadratic-candidate hazard for exact shingle-keyed dedup) and
    exact_ngram while the vocabulary still grows Heaps-style."""
    from de_project_sprint_etl_spark.plans.curation import dedup_strategy_from

    # saturated: 60 docs, all the same text — after decile 0 every
    # shingle already exists, so new_per_posting collapses to 0
    sat = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(60)],
        "doc_id long, text string",
    )
    tiers = {
        r.decile: r.chosen_tier for r in dedup_strategy_from(spark, sat).collect()
    }
    assert all(t == "minhash_lsh" for d, t in tiers.items() if d >= 1), tiers

    # growing: every doc contributes entirely fresh vocabulary, so the
    # rate stays near 1 and the exact tier is the right choice throughout
    grow = spark.createDataFrame(
        [
            (i, " ".join(f"tok{i}x{j}" for j in range(8)))
            for i in range(60)
        ],
        "doc_id long, text string",
    )
    tiers = {
        r.decile: r.chosen_tier
        for r in dedup_strategy_from(spark, grow).collect()
    }
    assert all(t == "exact_ngram" for t in tiers.values()), tiers


def test_dedup_strategy_costs_nothing_beyond_the_curve(spark):
    """The selector is 10-row post-processing: its plan must contain
    exactly the curve's aggregates — no extra exchange, no join back to
    the corpus."""
    from de_project_sprint_etl_spark.plans.curation import (
        dedup_strategy_from,
        vocab_growth_from,
    )

    docs = spark.createDataFrame(
        [(i, f"a b c d{i}") for i in range(20)], "doc_id long, text string"
    )
    base = vocab_growth_from(spark, docs)._jdf.queryExecution().executedPlan()
    sel = dedup_strategy_from(spark, docs)._jdf.queryExecution().executedPlan()
    n_ex = lambda p: p.toString().count("Exchange")  # noqa: E731
    assert n_ex(sel) == n_ex(base)


def test_adaptive_dedup_executes_the_chosen_tier(spark, tmp_path):
    """adaptive_dedup_pairs EXECUTES the tier the saturation signal
    picks, and the SQL oracle replays the same decision: on a
    df-saturated corpus (heavy repetition) the minhash branch runs and
    hash-matches DuckDB's guarded-union oracle; on the growing fixture
    corpus the exact-ngram branch runs. Also pins that the unchosen
    tier contributes zero rows to the oracle."""
    import duckdb

    from de_project_sprint_etl_spark.plans.curation import (
        _saturation_rate,
        _sql_adaptive_dedup,
        adaptive_dedup_pairs,
    )
    from tools.oracle_check import compare_frames

    # saturated synthetic corpus: two repeated contents + one unique —
    # every doc past decile 0 re-mints existing shingles
    rows = []
    for i in range(40):
        rows.append((i, "alpha beta gamma delta epsilon zeta eta theta"))
    for i in range(40, 80):
        rows.append((i, "one two three four five six seven eight nine"))
    rows.append((80, " ".join(f"uniq{j}" for j in range(9))))
    sat_dir = str(tmp_path / "satcorpus")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        f"{sat_dir}/documents.parquet"
    )

    assert _saturation_rate(spark, sat_dir) < 0.2
    out = adaptive_dedup_pairs(spark, sat_dir).toPandas()
    assert set(out["tier"]) == {"minhash_lsh"}
    assert len(out) > 0  # the repeated contents must pair up

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sat_dir}/documents.parquet/*.parquet')"
    )
    odf = con.execute(_sql_adaptive_dedup()).df()
    verdict = compare_frames(out, odf)
    assert verdict["err"] is None, verdict

    # growing corpus (the sf0.001 fixture): exact tier chosen
    assert _saturation_rate(spark, "/root/testdata/sf0.001") >= 0.2
    out2 = adaptive_dedup_pairs(spark, "/root/testdata/sf0.001")
    assert out2.select("tier").distinct().collect()[0][0] == "exact_ngram"


def test_adaptive_dedup_no_decile9_falls_back_to_exact(spark, tmp_path):
    """A corpus whose id space never reaches decile 9 (max doc_id < 9)
    yields no decile-9 curve row: the engine falls back to rate=1.0 →
    exact tier, and the oracle must replay that via COALESCE — without
    it the NULL signal silently empties BOTH guarded branches."""
    import duckdb

    from de_project_sprint_etl_spark.plans.curation import (
        _saturation_rate,
        _sql_adaptive_dedup,
        adaptive_dedup_pairs,
    )
    from tools.oracle_check import compare_frames

    tiny = str(tmp_path / "tinycorpus")
    spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(6)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(f"{tiny}/documents.parquet")

    assert _saturation_rate(spark, tiny) == 1.0  # fallback, not NULL
    out = adaptive_dedup_pairs(spark, tiny).toPandas()
    assert len(out) > 0 and set(out["tier"]) == {"exact_ngram"}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tiny}/documents.parquet/*.parquet')"
    )
    verdict = compare_frames(out, con.execute(_sql_adaptive_dedup()).df())
    assert verdict["err"] is None, verdict


def test_near_dedup_keep_best_survives_quality_not_min_id(spark, tmp_path):
    """The canonical survivor of a near-dup cluster is the
    HIGHEST-QUALITY member, not the min-id one: a digit-spammed
    variant with the LOWER doc_id must lose to its cleaner twin."""
    from de_project_sprint_etl_spark.functions.text import with_text_stats
    from de_project_sprint_etl_spark.plans.llm import q_near_dedup_keep_best

    prose = (
        "the data pipeline processes the data and the results are good "
        "because they are the best of all the runs we have seen"
    )
    rows = [
        (1, prose + " 000 111 222 333 444 555"),  # near-dup, low quality
        (2, prose),                                # near-dup, high quality
        (3, "completely different unique content about gardens and rivers"),
        (4, "another unrelated unique document mentioning mountains"),
    ]
    d = str(tmp_path / "kbcorpus")
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.coalesce(1).write.parquet(f"{d}/documents.parquet")

    # sanity: the quality model does rank 2 above 1 (digit penalty)
    qs = {
        r.doc_id: r.quality_score
        for r in with_text_stats(docs, "text").select("doc_id", "quality_score").collect()
    }
    assert qs[2] > qs[1], qs

    out = q_near_dedup_keep_best(spark, d).toPandas()
    survivors = set(out["doc_id"])
    assert 2 in survivors and 1 not in survivors, out  # argmax, not min-id
    assert {3, 4} <= survivors  # singletons untouched
    (cluster_row,) = out[out["doc_id"] == 2].itertuples()
    assert cluster_row.group_id == 1  # the cluster label stays min-id


def test_doc_continuation_pairs_find_every_planted_split(spark):
    """Every planted continuation (doc d -> synthetic doc d+CONT_OFFSET
    whose text starts with d's last CONT_K tokens) must be recovered,
    and every reported pair must genuinely share its boundary window."""
    from de_project_sprint_etl_spark.functions.text import tokens
    from de_project_sprint_etl_spark.plans.curation import CONT_K, CONT_OFFSET
    from de_project_sprint_etl_spark.plans.registry import RAW_QUERIES
    from de_project_sprint_etl_spark.plans.testdata import t

    pairs = {
        (r.src_id, r.dst_id)
        for r in RAW_QUERIES["doc_continuation_pairs"](spark, SF).collect()
    }
    docs = t(spark, SF, "documents").select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n")
    )
    planted = {
        (r.doc_id, r.doc_id + CONT_OFFSET)
        for r in docs.filter(
            (F.col("doc_id") % 7 == 0) & (F.col("n") >= 14)
        ).collect()
    }
    assert planted, "fixture should plant at least one continuation"
    assert planted <= pairs
    # soundness spot-check: reported pairs share the boundary window
    from de_project_sprint_etl_spark.plans.curation import _cont_corpus

    toks = {
        r.doc_id: r.tks for r in _cont_corpus(spark, SF).collect()
    }
    for src, dst in list(pairs)[:50]:
        assert toks[src][-CONT_K:] == toks[dst][:CONT_K], (src, dst)


def test_cdc_chunks_resynchronize_after_prefix_edit(spark):
    """The CDC property fixed-width windows lack: dropping a PREFIX of a
    doc leaves every chunk after the first boundary identical, so each
    mutant shares (almost) all chunks with its original — every reported
    fingerprint must appear in 2+ docs, and mutated docs must dominate
    the duplicated-chunk population."""
    from de_project_sprint_etl_spark.plans.registry import RAW_QUERIES

    rows = RAW_QUERIES["cdc_chunk_dedup"](spark, SF).collect()
    assert rows, "mutant corpus must produce duplicated chunks"
    for r in rows:
        assert r.n_docs >= 2
        assert r.n_occurrences >= r.n_docs
        assert r.n_tokens >= 1


def test_dedup_threshold_sensitivity_is_monotone(spark):
    """Raising the threshold can only shrink the pair set and its doc
    coverage — the curve must be non-increasing in both measures."""
    from de_project_sprint_etl_spark.plans.registry import RAW_QUERIES

    rows = sorted(
        RAW_QUERIES["dedup_threshold_sensitivity"](spark, SF).collect(),
        key=lambda r: r.threshold,
    )
    assert rows and rows[0].threshold == 0.3
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        assert a.n_docs >= b.n_docs


def test_decontaminate_train_removes_exactly_the_leaked_docs(spark):
    """Survivors ∪ contaminated == train corpus, disjointly: every doc
    flagged by the registered contamination_check is gone, every other
    train doc survives, and no bench doc was in scope at all."""
    import de_project_sprint_etl_spark.plans.curation  # noqa: F401 — registers
    from de_project_sprint_etl_spark.plans.llm import BENCH_MOD, MUT_OFFSET
    from de_project_sprint_etl_spark.plans.registry import RAW_QUERIES

    survivors = {
        r.doc_id
        for r in RAW_QUERIES["decontaminate_train"](spark, SF).collect()
    }
    contaminated = {
        r.id for r in RAW_QUERIES["contamination_check"](spark, SF).collect()
    }
    from de_project_sprint_etl_spark.plans.llm import docs_with_mutants

    train = {
        r.doc_id
        for r in docs_with_mutants(spark, SF).collect()
        if not (r.doc_id < MUT_OFFSET and r.doc_id % BENCH_MOD == 0)
    }
    assert contaminated, "the planted mutant leaks must be detected"
    assert survivors == train - contaminated
    assert not (survivors & contaminated)


def test_source_dup_rate_concentrates_on_planted_sources(spark):
    """Counts reconcile: n_docs sums to the mutant-corpus size, every
    dup doc is counted once, and dup_rate = n_dup/n_docs exactly; the
    overall dup rate is nonzero (the corpus plants mutants)."""
    import de_project_sprint_etl_spark.plans.curation  # noqa: F401 — registers
    from de_project_sprint_etl_spark.plans.llm import docs_with_mutants
    from de_project_sprint_etl_spark.plans.registry import RAW_QUERIES

    rows = RAW_QUERIES["source_dup_rate"](spark, SF).collect()
    assert rows
    n_corpus = docs_with_mutants(spark, SF).count()
    assert sum(r.n_docs for r in rows) == n_corpus
    assert sum(r.n_dup_docs for r in rows) > 0
    for r in rows:
        assert 0 <= r.n_dup_docs <= r.n_docs
        assert abs(r.dup_rate - round(r.n_dup_docs / r.n_docs, 6)) < 1e-9


def test_embedding_outliers_is_exact_integer_centroid_math(spark):
    """The top-k outlier distances must equal a NumPy reference computed
    with the same 1e6 quantization — the integer-stable centroid math is
    exact, so the only tolerance is the final ROUND."""
    import numpy as np

    import de_project_sprint_etl_spark.plans.curation as cur
    from de_project_sprint_etl_spark.plans.registry import RAW_QUERIES
    from de_project_sprint_etl_spark.plans.testdata import t

    rows = RAW_QUERIES["embedding_outliers"](spark, SF).collect()
    assert len(rows) == cur.OUTLIER_TOPK
    dists = [r.center_dist for r in rows]
    assert dists == sorted(dists, reverse=True)

    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in t(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    }
    xi = {
        k: np.floor(v * cur.OUTLIER_SCALE + 0.5).astype(np.int64)
        for k, v in emb.items()
    }
    n = len(xi)
    s = np.sum(np.stack(list(xi.values())), axis=0, dtype=np.int64)
    want = {
        k: round(
            float(np.sqrt(np.sum(((v * n - s).astype(np.float64)) ** 2)))
            / (n * cur.OUTLIER_SCALE),
            6,
        )
        for k, v in xi.items()
    }
    for r in rows:
        assert abs(r.center_dist - want[r.vec_id]) < 2e-6, (
            r.vec_id, r.center_dist, want[r.vec_id],
        )
    # the reported set IS the top-k under (dist desc, vec_id asc)
    ref_order = sorted(want, key=lambda k: (-want[k], k))[: cur.OUTLIER_TOPK]
    assert {r.vec_id for r in rows} == set(ref_order)


# --- round-8 tuning-curve ops -------------------------------------------------


def test_lsh_band_tuning_matches_numpy_scurve(spark):
    """The in-engine S-curve must equal an independent numpy evaluation
    of 1-(1-j^r)^b over the same pair jaccards (fixed-point summed),
    and behave like the textbook curve: more bands -> more expected
    candidates AND more expected recall (monotone in b at fixed b*r)."""
    from de_project_sprint_etl_spark.plans import curation as cur
    from de_project_sprint_etl_spark.plans import llm
    from de_project_sprint_etl_spark.plans.registry import RAW_QUERIES

    rows = {
        (r.bands, r.rows_per_band): r
        for r in RAW_QUERIES["lsh_band_tuning"](spark, SF).collect()
    }
    assert set(rows) == set(cur.LSH_TUNE_CONFIGS)

    j = np.array(
        [x.jaccard for x in llm.q_ngram_jaccard(spark, SF).select("jaccard").collect()],
        dtype=np.float64,
    )
    n_true = int((j >= 0.5).sum())
    for (b, r), row in rows.items():
        p = 1.0 - (1.0 - j**r) ** b
        sp = np.floor(p * cur.SCURVE_SCALE + 0.5).astype(np.int64)
        assert row.n_true == n_true
        assert abs(row.exp_candidates - round(sp.sum() / cur.SCURVE_SCALE, 6)) < 2e-6
        want_rec = round(
            float(sp[j >= 0.5].sum()) / (cur.SCURVE_SCALE * max(n_true, 1)), 6
        )
        assert abs(row.exp_recall_at_05 - want_rec) < 2e-6
        assert abs(row.est_threshold - round((1 / b) ** (1 / r), 6)) < 1e-9
    # textbook monotonicity along the fixed 16-hash budget
    by_bands = sorted(rows.values(), key=lambda r: r.bands)
    for a, b_ in zip(by_bands, by_bands[1:]):
        assert a.exp_candidates <= b_.exp_candidates + 1e-9
        assert a.exp_recall_at_05 <= b_.exp_recall_at_05 + 1e-9


def test_ivf_nprobe_curve_monotone_and_matches_direct_probe(spark):
    """recall@k must be non-decreasing in n_probes, and the curve's
    claim 'neighbor recovered iff its cell is probed' must agree with
    ACTUALLY running the registered IVF query at nprobe=2."""
    from de_project_sprint_etl_spark.functions import similarity
    from de_project_sprint_etl_spark.plans import curation as cur
    from de_project_sprint_etl_spark.plans import llm
    from de_project_sprint_etl_spark.plans.registry import RAW_QUERIES
    from de_project_sprint_etl_spark.plans.testdata import t

    rows = sorted(
        RAW_QUERIES["ivf_nprobe_recall_curve"](spark, SF).collect(),
        key=lambda r: r.n_probes,
    )
    assert [r.n_probes for r in rows] == list(cur.NPROBE_CURVE)
    for a, b in zip(rows, rows[1:]):
        assert a.n_hits <= b.n_hits
        assert a.n_true == b.n_true
    # cross-check the p=2 point against a real nprobe=2 probe run
    emb = t(spark, SF, "embeddings").select("vec_id", "embedding")
    truth = similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < llm.N_QUERIES), k=5
    ).select("query_id", "neighbor_id")
    approx = llm.q_ann_ivf(spark, SF).select("query_id", "neighbor_id")
    direct_hits = truth.join(
        approx, ["query_id", "neighbor_id"], "left_semi"
    ).count()
    p2 = next(r for r in rows if r.n_probes == 2)
    assert p2.n_hits == direct_hits


def test_join_cardinality_estimate_is_exact_key_sample_math(spark):
    """The estimator must equal 16x the sampled sum of squares computed
    independently in Python over the same per-key counts, and
    actual_rows must equal the REAL self-join output size."""
    from de_project_sprint_etl_spark.plans import governance as gov
    from de_project_sprint_etl_spark.plans.registry import RAW_QUERIES
    from de_project_sprint_etl_spark.plans.testdata import t

    row = RAW_QUERIES["join_cardinality_estimate"](spark, SF).collect()[0]
    li = t(spark, SF, "lineitem").select("l_partkey")
    counts = {
        r.l_partkey: r.cnt
        for r in li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    actual = sum(c * c for c in counts.values())
    assert row.actual_rows == actual
    assert row.n_keys == len(counts)
    # real join size equals the sum-of-squares identity
    real = li.alias("a").join(li.alias("b"), "l_partkey").count()
    assert real == actual
    # sampled-key set from the shared hash gate, recomputed in-engine
    from de_project_sprint_etl_spark.functions import text

    sampled = {
        r.l_partkey
        for r in li.select("l_partkey")
        .distinct()
        .filter(text.h64(F.col("l_partkey").cast("string")) % gov.JCE_MOD == 0)
        .collect()
    }
    assert row.n_sampled_keys == len(sampled)
    est = gov.JCE_MOD * sum(counts[k] ** 2 for k in sampled)
    assert row.est_rows == est
    assert abs(row.rel_err - round(abs(est - actual) / max(actual, 1), 6)) < 2e-6


def test_source_cross_dup_matrix_is_symmetric_canonical_and_complete(spark):
    """Every LSH pair lands in exactly one canonically-ordered cell:
    the matrix total equals the pair count, source_a <= source_b on
    every row, and the diagonal dominates for the planted mutants
    (a mutant shares its base doc's source, so planted near-dups are
    same-source by construction)."""
    from de_project_sprint_etl_spark.functions import dedup
    from de_project_sprint_etl_spark.plans import curation  # noqa: F401 — registers
    from de_project_sprint_etl_spark.plans.llm import mutant_shingles
    from de_project_sprint_etl_spark.plans.registry import RAW_QUERIES

    rows = RAW_QUERIES["source_cross_dup_matrix"](spark, SF).collect()
    assert rows and all(r.source_a <= r.source_b for r in rows)
    sigs = dedup.minhash_signatures(
        shingles=mutant_shingles(spark, SF, n=3), num_hashes=16
    )
    n_pairs = dedup.minhash_lsh_pairs(
        sigs, num_hashes=16, bands=4, min_est_jaccard=0.5
    ).count()
    assert sum(r.n_pairs for r in rows) == n_pairs
    diag = sum(r.n_pairs for r in rows if r.source_a == r.source_b)
    assert diag * 2 >= n_pairs  # planted dups concentrate on the diagonal
