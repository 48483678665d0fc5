"""Round-11 extensions: tie-group sub-sharding + NULL shard in the
sharded exact global rank (VERDICT r10 #6 / ADVICE r10), the
incremental exact-Jaccard (PPJoin) pair refresh with a df-cut crossing
(VERDICT r10 #1), the manifest-gated in-place append refresh
(VERDICT r10 #2), and the k-step refresh soak (VERDICT r10 #3)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__  # noqa: E402 — populates the registry

from de_project_sprint_etl_spark.plans.registry import (  # noqa: E402
    RAW_QUERIES,
)

SF = "/root/testdata/sf0.001"


# --- sharded rank: tie groups + NULLs (VERDICT r10 #6) ---------------------


def test_sharded_rank_two_value_corpus_balanced_and_exact(spark):
    """A 2-distinct-value corpus used to degenerate to two monster
    tie-group shards; tiebreak sub-sharding must now split them while
    keeping the rank bit-identical to the global window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from de_project_sprint_etl_spark.functions.ranking import (
        sharded_global_rank,
    )

    rows = [(i, 7 if i % 2 else 3) for i in range(1, 2001)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = sharded_global_rank(
        df, "n_tokens", "doc_id", n_shards=16, max_shard_rows=100
    )
    got = {r["doc_id"]: r["rn"] for r in out.collect()}
    w = Window.orderBy(F.col("n_tokens").desc(), F.col("doc_id").asc())
    want = {
        r["doc_id"]: r["rn"]
        for r in df.select(
            "doc_id", F.row_number().over(w).cast("long").alias("rn")
        ).collect()
    }
    assert got == want
    # balance: with the bound at 100 neither 1000-row tie group may
    # survive as a single shard; sketch resolution allows ~2x slack
    sizes = [
        r["n"]
        for r in sharded_global_rank(
            df, "n_tokens", "doc_id", n_shards=16, max_shard_rows=100,
            keep_shard_col=True,
        )
        .groupBy("_sgr_shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(sizes) > 2
    assert max(sizes) <= 250, sizes


def test_sharded_rank_null_values_rank_last(spark):
    """ADVICE r10: NULL value rows must land in a dedicated LAST shard
    and rank after every non-NULL row, in tiebreak order — matching the
    global window's desc() NULL placement."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from de_project_sprint_etl_spark.functions.ranking import (
        sharded_global_rank,
    )

    rows = [(i, i % 13 if i % 5 else None) for i in range(1, 301)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: r["rn"]
        for r in sharded_global_rank(
            df, "n_tokens", "doc_id", n_shards=8
        ).collect()
    }
    w = Window.orderBy(F.col("n_tokens").desc(), F.col("doc_id").asc())
    want = {
        r["doc_id"]: r["rn"]
        for r in df.select(
            "doc_id", F.row_number().over(w).cast("long").alias("rn")
        ).collect()
    }
    assert got == want
    null_ranks = [got[i] for i in range(1, 301) if i % 5 == 0]
    nn = len(null_ranks)
    assert sorted(null_ranks) == list(range(301 - nn, 301))


def test_sharded_rank_heavy_null_group_subshards(spark):
    """A NULL tie group past max_shard_rows sub-shards by tiebreak like
    any other tie group (the NULL shard is single-'value' by
    construction)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from de_project_sprint_etl_spark.functions.ranking import (
        sharded_global_rank,
    )

    rows = [(i, None if i <= 900 else i) for i in range(1, 1001)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: r["rn"]
        for r in sharded_global_rank(
            df, "n_tokens", "doc_id", n_shards=8, max_shard_rows=64
        ).collect()
    }
    w = Window.orderBy(F.col("n_tokens").desc(), F.col("doc_id").asc())
    want = {
        r["doc_id"]: r["rn"]
        for r in df.select(
            "doc_id", F.row_number().over(w).cast("long").alias("rn")
        ).collect()
    }
    assert got == want


def test_sharded_rank_property_with_ties_and_nulls(spark):
    """Property check: heavy ties, NULLs, and tiny sub-shard bounds —
    the sharded rank equals the sorted enumeration for every row."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from de_project_sprint_etl_spark.functions.ranking import (
        sharded_global_rank,
    )

    @settings(max_examples=8, deadline=None)
    @given(
        vals=st.lists(
            st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
            min_size=1,
            max_size=40,
        ),
        n_shards=st.integers(min_value=1, max_value=9),
        bound=st.integers(min_value=1, max_value=12),
    )
    def check(vals, n_shards, bound):
        rows = [(i + 1, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        got = {
            r["doc_id"]: r["rn"]
            for r in sharded_global_rank(
                df,
                "n_tokens",
                "doc_id",
                n_shards=n_shards,
                max_shard_rows=bound,
            ).collect()
        }
        order = sorted(
            rows,
            key=lambda r: (r[1] is None, -(r[1] or 0), r[0]),
        )
        want = {doc: i + 1 for i, (doc, _v) in enumerate(order)}
        assert got == want

    check()
