"""Sharded exact global ranking — the scale path for dense global
row numbers (VERDICT r9 #3; tie/NULL hardening VERDICT r10 #6).

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
   Rows with a NULL value get a dedicated LAST shard (ADVICE r10):
   Spark's ``desc()`` sorts NULLs last, so the NULL shard sitting after
   every value shard reproduces the global window's placement exactly —
   previously the NULL predicate silently dropped them into shard 0.
3. ONE tiny pass counts rows per shard (and each shard's value span);
   the driver folds the counts into per-shard base offsets (a
   model-sized collect — at most ``n_shards`` rows, the PCA-model
   precedent).
4. A single-VALUE shard larger than ``max_shard_rows`` (a massive tie
   group — the one skew shape value cuts cannot split, because equal
   values must never straddle a cut) is SUB-SHARDED by tiebreak
   quantile cuts: within a tie group the global order is tiebreak
   ascending, so strict tiebreak cuts refine it the same way value
   cuts refine the value order. One extra aggregation computes every
   heavy shard's tiebreak cuts together; the composite
   ``(shard, sub_shard)`` then gets the offset-count pass. Shards
   holding >1 distinct value are never sub-sharded (tiebreak
   interleaves values there — imbalance, not a correctness risk,
   never worse than the quantile sketch's resolution).
5. The rank is ``base[shard] + row_number() over (PARTITION BY shard
   ORDER BY ...)`` — every shard sorts independently in parallel, and
   because equal (value, tiebreak) keys never split across shards,
   shard order refines the global order: the reconstructed rank IS the
   global rank, bit-for-bit, on every input — not an approximation.

Eagerness note (like ``plans/curation._pca_model``): building a plan
through ``sharded_global_rank`` runs the two-to-four small jobs above
at DataFrame-CONSTRUCTION time. Callers that construct many plans
without executing them pay those narrow passes per call — pair with
``caching.cached_generation`` on the input projection so the passes
scan a persisted frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["sharded_global_rank"]

#: Default tie-group sub-shard trigger: a single-value shard under this
#: many rows sorts comfortably in one task, and the extra cut pass
#: would cost more than it saves.
DEFAULT_MAX_SHARD_ROWS = 4096


def sharded_global_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    rank_col: str = "rn",
    n_shards: int | None = None,
    max_shard_rows: int | None = None,
    keep_shard_col: bool = False,
) -> DataFrame:
    """Add ``rank_col`` = the exact dense global row number of each row
    under ``(value_col DESC, tiebreak_col ASC)`` — computed without any
    single-partition sort. ``(value_col, tiebreak_col)`` must be unique
    per row (it is the total order). NULL ``value_col`` rows rank after
    every non-NULL row (Spark ``desc()`` NULL placement), in tiebreak
    order. Descending-value order is the FFD / top-k convention this
    serves; generalize when a caller needs the ascending form.

    ``max_shard_rows`` bounds the size of a single-value (tie-group)
    shard before tiebreak sub-sharding kicks in; tests pass a small
    value to exercise the path, production leaves the default.
    ``keep_shard_col`` keeps the internal ``_sgr_shard`` column in the
    output — a balance diagnostic for tests, not part of the contract.
    """
    spark = df.sparkSession
    if n_shards is None:
        n_shards = max(8, spark.sparkContext.defaultParallelism * 4)
    if max_shard_rows is None:
        max_shard_rows = DEFAULT_MAX_SHARD_ROWS
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
    null_shard = len(cuts) + 1  # strictly after every value shard
    if cuts:
        carr = F.array(*[F.lit(int(c)).cast("long") for c in cuts])
        # strict comparison: a row equal to a cut value goes to the
        # LATER shard with all its ties — equal values never split, so
        # shard order refines (value DESC, tiebreak ASC)
        val_shard = F.size(
            F.filter(carr, lambda c: c > F.col(value_col).cast("long"))
        )
    else:
        val_shard = F.lit(0)
    shard = F.when(
        F.col(value_col).isNull(), F.lit(null_shard)
    ).otherwise(val_shard)
    sharded = df.withColumn("_sgr_shard", shard.cast("int"))
    stats = {
        int(r["_sgr_shard"]): (int(r["n"]), r["vmin"], r["vmax"])
        for r in sharded.groupBy("_sgr_shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
        )
        .collect()
    }
    # tie-group sub-sharding: heavy SINGLE-VALUE shards only (vmin ==
    # vmax ⇒ one tie group, where tiebreak order IS the global order).
    # The NULL shard is all-one-"value" by construction, so it
    # sub-shards the same way when heavy. Requires a numeric tiebreak
    # (percentile_approx input); a non-numeric tiebreak keeps the
    # single-shard sort, documented.
    heavy = [
        s
        for s, (n, vmin, vmax) in stats.items()
        # a value shard holds only non-NULL values, so vmin == vmax ⇔
        # one tie group; the NULL shard has vmin is vmax is None and
        # matches too (all its rows share the one NULL "value")
        if n > max_shard_rows and vmin == vmax
    ]
    tb_numeric = isinstance(
        df.schema[tiebreak_col].dataType, T.NumericType
    )
    sub_cuts: dict[int, list] = {}
    if heavy and tb_numeric:
        # enough sub-shards to bring the heaviest tie group back under
        # max_shard_rows, capped at the overall shard budget
        max_heavy_n = max(stats[s][0] for s in heavy)
        per_heavy = min(
            n_shards, max(2, -(-max_heavy_n // max(1, max_shard_rows)))
        )
        tprobs = [i / per_heavy for i in range(1, per_heavy)]
        rows = (
            sharded.filter(F.col("_sgr_shard").isin(heavy))
            .groupBy("_sgr_shard")
            .agg(
                F.percentile_approx(
                    F.col(tiebreak_col), F.lit(tprobs), F.lit(10_000)
                ).alias("tc")
            )
            .collect()
        )
        for r in rows:
            # cuts stay in the tiebreak's OWN domain (ADVICE r10: a
            # long-cast here collapsed DOUBLE tiebreaks whose ties
            # concentrate inside one integer unit into a single
            # sub-shard — balance-only, but exactly the degenerate case
            # this pass exists to split)
            tcs = sorted({c for c in (r["tc"] or []) if c is not None})
            if tcs:
                sub_cuts[int(r["_sgr_shard"])] = tcs
    if sub_cuts:
        # composite shard = base * stride + sub; sub = count of tiebreak
        # cuts < tiebreak (strict: equal tiebreaks — impossible under
        # the unique-total-order contract within one value, but safe
        # anyway — stay together). Ascending tiebreak cuts, so sub
        # order IS tiebreak order: refinement preserved.
        stride = max(len(v) for v in sub_cuts.values()) + 1
        sub = F.lit(0)
        for s, tcs in sub_cuts.items():
            tarr = F.array(*[F.lit(c) for c in tcs])
            sub = F.when(
                F.col("_sgr_shard") == s,
                F.size(
                    F.filter(tarr, lambda c: c < F.col(tiebreak_col))
                ),
            ).otherwise(sub)
        sharded = sharded.withColumn(
            "_sgr_shard",
            (F.col("_sgr_shard") * stride + sub).cast("int"),
        )
        counts = {
            int(r["_sgr_shard"]): int(r["n"])
            for r in sharded.groupBy("_sgr_shard")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    else:
        counts = {s: n for s, (n, _v0, _v1) in stats.items()}
    # base offsets over the OCCUPIED shard ids only, looked up through a
    # literal map — never an array densely indexed by the composite id
    # space: (null_shard+1)*stride grows with n_shards², and a
    # million-entry CreateArray literal would melt the driver and
    # codegen at exactly the cluster scale this module exists for.
    # Every row's id is a key of `counts` (they were computed FROM the
    # rows), so the map lookup is total.
    bases, running = {}, 0
    for s in sorted(counts):
        bases[s] = running
        running += counts[s]
    base_entries = [
        x for s, b in sorted(bases.items())
        for x in (F.lit(int(s)), F.lit(int(b)).cast("long"))
    ]
    base_map = F.create_map(*base_entries) if base_entries else None
    w = Window.partitionBy("_sgr_shard").orderBy(
        F.col(value_col).desc(), F.col(tiebreak_col).asc()
    )
    base = (
        F.element_at(base_map, F.col("_sgr_shard"))
        if base_map is not None
        else F.lit(0).cast("long")
    )
    rn = (base + F.row_number().over(w).cast("long")).alias(rank_col)
    extra = ["_sgr_shard"] if keep_shard_col else []
    return sharded.select(*df.columns, rn, *extra)
