"""Dimension builders (SURVEY.md §2 U1, A10, A11, X1–X4, K9/W3).

Reference semantics being reproduced:

- ``d_calendar``: UNION ALL of every date column across staging tables,
  DISTINCT, then per-date attributes + a sequence id
  (reference ``src/dags/sql/update_mart_d_tables.sql:4-15``).
- ``d_customer`` / ``d_item``: Postgres ``DISTINCT ON (key)`` — one
  arbitrary row per key (reference ``update_mart_d_tables.sql:22-29``).
  The reference gives no ORDER BY, so its pick is nondeterministic; we
  strengthen to a deterministic tiebreak (documented in SURVEY.md §7) via
  ``row_number`` over an explicit ordering.

Scale notes: the calendar is tiny by construction (one row per distinct
date), so the global ``row_number`` window is fine. ``distinct_on`` over a
big fact partitions by the key — a single hash shuffle, no global window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def all_dates(date_columns: Sequence[tuple[DataFrame, str]]) -> DataFrame:
    """UNION ALL every (df, date_col) into one ``fact_date`` column and
    dedup (reference U1+A10, ``update_mart_d_tables.sql:5-13``).

    Dates are normalized to DateType: the reference casts to timestamp
    because Postgres date columns arrive as text; calendar semantics are
    day-grained (the fact join key is the casted date,
    ``update_mart_f_table.sql:6``).
    """
    parts = [
        df.select(F.col(c).cast("date").alias("fact_date"))
        for df, c in date_columns
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # Partial (map-side) distinct then shuffle on fact_date — Catalyst
    # plans this as HashAggregate(partial) -> exchange -> HashAggregate.
    return out.distinct()


def build_calendar(date_columns: Sequence[tuple[DataFrame, str]]) -> DataFrame:
    """``d_calendar`` (reference ``update_mart_d_tables.sql:4-15``).

    date_id reproduces ``nextval('date_id_seq')`` as a deterministic dense
    id ordered by date (SURVEY.md §7 sequence decision). Output schema =
    schemas.D_CALENDAR.
    """
    dates = all_dates(date_columns)
    # One row per distinct date -> tiny; the unpartitioned window is safe.
    w = Window.orderBy("fact_date")
    return dates.select(
        F.row_number().over(w).cast("long").alias("date_id"),
        F.col("fact_date"),
        F.dayofmonth("fact_date").alias("day_num"),
        F.month("fact_date").alias("month_num"),
        # Postgres TO_CHAR(ts,'mon') is lowercase ("jan"); date_format
        # yields "Jan" -> wrap in lower() for byte-identical output
        # (reference update_mart_d_tables.sql:15, SURVEY.md §2.10 X4).
        F.lower(F.date_format("fact_date", "MMM")).alias("month_name"),
        F.year("fact_date").alias("year_num"),
    )


def distinct_on(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Postgres ``DISTINCT ON (keys)`` with a deterministic ORDER BY.

    One row per key combination: the first row under ``order_by`` within
    each key partition (reference A11, ``update_mart_d_tables.sql:23,29``;
    nondeterminism strengthened per SURVEY.md §7 — callers pass a total
    order, e.g. latest-timestamp-first with a unique-id tiebreak).

    Physical plan: one hash shuffle on ``keys``, per-partition sort,
    rank-1 filter — no global ordering, scales with key cardinality.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def with_sequence_id(
    df: DataFrame, id_col: str, order_by: Sequence[str]
) -> DataFrame:
    """Reproduce ``nextval(seq)`` ids (reference K9/X6) deterministically.

    Dense contiguous ids require a global order — fine for dims (small).
    For big facts prefer ``with_unique_id`` (no single-partition sort).
    Guard-enforced (not just documented): past ``guards.SEQUENCE_BOUND``
    rows the unpartitioned window raises with that pointer instead of
    silently funnelling a fact table through one sort partition.
    """
    from de_project_sprint_etl_spark.functions import guards

    w = Window.orderBy(*[F.col(c) for c in order_by])
    seq = guards.bounded_global_window(
        F.row_number().over(w).cast("long"),
        w,
        guards.SEQUENCE_BOUND,
        "with_sequence_id dense id numbering",
        "with_unique_id (partition-local unique ids, no global sort)",
    )
    return df.select(seq.alias(id_col), "*")


def with_unique_id(df: DataFrame, id_col: str) -> DataFrame:
    """Scale path for surrogate keys: unique, not dense/contiguous.

    ``monotonically_increasing_id`` embeds the partition id — no shuffle,
    no coordination; ids are opaque (SURVEY.md §7: correctness tests never
    compare id values, only uniqueness).
    """
    return df.select(F.monotonically_increasing_id().alias(id_col), "*")
