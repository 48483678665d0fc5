"""As-of (point-in-time) join — match each probe row to the most recent
build row with ``build.ts <= probe.ts`` for the same key.

The reference has no such operator (its SQL surface is equi/range joins
only — see SURVEY §2.12); this is the time-series staple Spark also
lacks as a primitive, so it is built here as a composition that keeps
the scale properties a naive implementation loses:

Naive shapes and why they fail at 100 TB:
- correlated ``max(ts) WHERE ts <= probe.ts`` subquery → re-scan of the
  build side per probe row;
- equi-join on key + filter + window-max → the join explodes to
  |probe per key| × |build per key| intermediate rows before the
  window cuts them back.

Shape used here (the merge-join formulation, one shuffle, zero row
explosion):

1. tag probe rows (``__side = 1``) and build rows (``__side = 0``),
   packing the build payload into ONE struct column (null on probe
   rows) so a single window expression carries any payload width;
2. union by name — a narrow map-side concat, no shuffle;
3. ``last(payload_struct, ignorenulls=True)`` over a window partitioned
   by key, ordered by ``(ts, __side)`` with an unbounded-preceding row
   frame. Build rows sort BEFORE probe rows at equal ts, which yields
   the ASOF ``>=`` tie semantics (a build row stamped exactly at the
   probe instant is visible to it);
4. keep probe rows, unpack the struct.

Cost: exactly one hash-partition + per-partition sort on ``(key, ts)``
— the same shuffle a groupBy over the key would pay — and the running
``last`` is evaluated streamingly within each partition (no frame
re-scan: Spark keeps one row of state for an unbounded-preceding
``last``). Keys partition independently, so the plan scales with
#keys × per-key density, never with |probe| × |build|.

Determinism contract: the build side must be unique per ``(key, ts)``
— otherwise "the" most recent row is ill-defined (DuckDB's ASOF JOIN
has the same contract). ``asof_join`` does NOT deduplicate for the
caller; pre-aggregate the build side (cheap: partial-aggregatable
groupBy on the same key the join shuffles on anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    probe_ts: str,
    build_ts: str,
    build_cols: list[str],
) -> DataFrame:
    """Left as-of join: every ``probe`` row, plus ``build_cols`` (and
    ``build_ts``) from the latest ``build`` row of the same ``on`` key
    with ``build[build_ts] <= probe[probe_ts]`` (nulls when no build
    row precedes the probe row).

    ``probe_ts`` / ``build_ts`` may be timestamps or numeric instants;
    they only need a total order. Output keeps every probe column and
    appends ``build_ts`` + ``build_cols`` (caller renames via select).
    """
    payload = F.struct(
        F.col(build_ts).alias("__bts"), *[F.col(c) for c in build_cols]
    )
    b = build.select(
        *[F.col(c) for c in on],
        F.col(build_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe.columns if c not in on],
    )
    p = probe.select(
        *probe.columns,
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(b.schema["__payload"].dataType).alias("__payload"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = p.unionByName(b.select(*p.columns)).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("__side") == 1).select(
        *probe.columns,
        F.col("__match.__bts").alias(build_ts),
        *[F.col(f"__match.{c}").alias(c) for c in build_cols],
    )
