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
