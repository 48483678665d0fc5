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
) -> DataFrame:
    """Equi-join ``probe`` ⋈ ``build`` on ``on`` with ``n_salts``-way
    key salting. Supports ``inner`` and ``left`` (probe-preserving)
    joins — result is row-identical to ``probe.join(build, on, how)``.

    The salt on the probe side hashes the WHOLE probe row (all
    columns), so even rows identical on the join key scatter uniformly;
    the build side explodes ×``n_salts`` to meet every salt bucket.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    p = probe.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
    )
    b = build.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    return p.join(b, on=[*on, "__salt"], how=how).drop("__salt")
