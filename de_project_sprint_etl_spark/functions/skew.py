"""Skew-mitigation join: salt the hot keys so one reducer never owns a
whole hot key's row set.

When a join key is heavily skewed (one customer with 10% of all rows),
a shuffled hash/sort-merge join lands the hot key's entire probe side
on ONE task. The standard fixes, in preference order:

1. ``broadcast(small)`` — no shuffle at all; only if the build side
   fits in memory.
2. AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``) — runtime
   split of oversized partitions; needs AQE on and only kicks in past
   its size thresholds.
3. **Salting (this module)** — deterministic, planner-independent:
   works on any Spark, any join the optimizer can't fix, and for
   pipelines that pin ``spark.sql.adaptive.enabled=false``.

Shape: the probe (big, skewed) side appends ``salt = pmod(hash(probe
row id cols), S)``; the build side is exploded ×S with every salt
value; the join key becomes ``(key, salt)`` so the hot key spreads
over S tasks. Row-for-row identical to the unsalted join (each probe
row still meets each matching build row exactly once — on exactly one
salt). Cost: build side is duplicated S×, so pick S ~ (hot-key rows /
target-partition rows), not "big": the build blow-up is the price and
it is paid on the SMALLER side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    hot_threshold: int | None = None,
) -> DataFrame:
    """Equi-join ``probe`` ⋈ ``build`` on ``on`` with ``n_salts``-way
    key salting. Supports ``inner`` and ``left`` (probe-preserving)
    joins — result is row-identical to ``probe.join(build, on, how)``.

    Two modes:

    - ``hot_threshold=None`` — salt every key: the build side explodes
      ×``n_salts`` unconditionally. Simple, but the build blow-up is
      paid on ALL keys; only right when the key set is small or skew is
      everywhere.
    - ``hot_threshold=k`` (the scale mode) — keys with more than ``k``
      probe rows are detected first (one partial-aggregated count of
      the probe keys) and ONLY those get salted; cold keys carry salt 0
      on both sides, i.e. a single build copy. The hot-key set is
      skew-small by definition, so it broadcasts, and each side needs
      one pass: no probe/build split-and-union, no second scan. This is
      what salting looks like in production — the blow-up is
      proportional to the skew, not the table.

    The salt on the probe side hashes the WHOLE probe row (all
    columns), so even rows identical on the join key scatter uniformly.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    row_salt = F.pmod(F.hash(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
    all_salts = F.sequence(F.lit(0), F.lit(n_salts - 1))
    if hot_threshold is None:
        p = probe.withColumn("__salt", row_salt)
        b = build.withColumn("__salt", F.explode(all_salts))
    else:
        hot = (
            probe.groupBy(*on)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > hot_threshold)
            .select(*on, F.lit(1).alias("__hot"))
        )
        p = probe.join(F.broadcast(hot), on, "left").withColumn(
            "__salt", F.when(F.col("__hot") == 1, row_salt).otherwise(F.lit(0))
        ).drop("__hot")
        b = build.join(F.broadcast(hot), on, "left").withColumn(
            "__salt",
            F.explode(
                F.when(F.col("__hot") == 1, all_salts).otherwise(F.array(F.lit(0)))
            ),
        ).drop("__hot")
    return p.join(b, on=[*on, "__salt"], how=how).drop("__salt")
