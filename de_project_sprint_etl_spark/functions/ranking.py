"""Sharded exact global ranking — the scale path for dense global
row numbers (VERDICT r9 #3).

``row_number()`` over an unpartitioned window funnels the whole input
through ONE task (Spark plans ``Exchange SinglePartition`` + a single
sort); ``guards.bounded_global_window`` makes that honest by raising
past a bound, but the named alternative — rank within range shards —
was previously documentation only. This module implements it, exactly:

1. ONE pass computes approximate quantile cut points of the order
   value (``percentile_approx`` — any cut set is CORRECT, quantiles
   only buy balance, so the sketch's approximation is irrelevant to
   the result).
2. Each row maps to a shard by comparing its value against the literal
   cut array — a pure, deterministic expression, so every downstream
   scan agrees on the sharding (no reliance on ``repartitionByRange``'s
   sampler or ``spark_partition_id`` being stable across recomputes).
3. ONE tiny pass counts rows per shard; the driver folds the counts
   into per-shard base offsets (a model-sized collect — at most
   ``n_shards`` rows, the PCA-model precedent).
4. The rank is ``base[shard] + row_number() over (PARTITION BY shard
   ORDER BY ...)`` — every shard sorts independently in parallel, and
   because equal values never split across shards (a row lands on one
   side of a cut by strict comparison), shard order refines the global
   order: the reconstructed rank IS the global rank, bit-for-bit, on
   every input — not an approximation.

Skew note: a massive tie group (many rows sharing one value) lands
wholly in one shard — balance degrades to the tie-group size, never
worse than the single-partition sort this replaces. The mitigation if
a corpus ever needs it is tiebreak sub-sharding inside exactly-at-cut
groups (cut the tiebreak within each tied run), which preserves the
refinement property; not implemented until a real corpus demands it.

Eagerness note (like ``plans/curation._pca_model``): building a plan
through ``sharded_global_rank`` runs the two small jobs above at
DataFrame-CONSTRUCTION time. Callers that construct many plans without
executing them pay two narrow passes per call — pair with
``caching.cached_generation`` on the input projection so those passes
scan a persisted frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sharded_global_rank"]


def sharded_global_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    rank_col: str = "rn",
    n_shards: int | None = None,
) -> DataFrame:
    """Add ``rank_col`` = the exact dense global row number of each row
    under ``(value_col DESC, tiebreak_col ASC)`` — computed without any
    single-partition sort. ``(value_col, tiebreak_col)`` must be unique
    per row (it is the total order). Descending-value order is the FFD
    / top-k convention this serves; generalize when a caller needs the
    ascending form."""
    spark = df.sparkSession
    if n_shards is None:
        n_shards = max(8, spark.sparkContext.defaultParallelism * 4)
    probs = [i / n_shards for i in range(1, n_shards)]
    cuts_raw = (
        df.agg(
            F.percentile_approx(
                F.col(value_col), F.lit(probs), F.lit(10_000)
            ).alias("c")
        ).collect()[0]["c"]
        or []
    )
    # dedupe; descending so shard 0 holds the LARGEST values (global
    # order position grows with shard id)
    cuts = sorted({int(c) for c in cuts_raw if c is not None}, reverse=True)
    if cuts:
        carr = F.array(*[F.lit(int(c)).cast("long") for c in cuts])
        # strict comparison: a row equal to a cut value goes to the
        # LATER shard with all its ties — equal values never split, so
        # shard order refines (value DESC, tiebreak ASC)
        shard = F.size(
            F.filter(carr, lambda c: c > F.col(value_col).cast("long"))
        )
    else:
        shard = F.lit(0)
    sharded = df.withColumn("_sgr_shard", shard.cast("int"))
    counts = {
        int(r["_sgr_shard"]): int(r["n"])
        for r in sharded.groupBy("_sgr_shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    bases, running = [], 0
    for s in range(len(cuts) + 1):
        bases.append(running)
        running += counts.get(s, 0)
    base_arr = F.array(*[F.lit(b).cast("long") for b in bases])
    w = Window.partitionBy("_sgr_shard").orderBy(
        F.col(value_col).desc(), F.col(tiebreak_col).asc()
    )
    rn = (
        F.element_at(base_arr, F.col("_sgr_shard") + 1)
        + F.row_number().over(w).cast("long")
    ).alias(rank_col)
    return sharded.select(*df.columns, rn)
