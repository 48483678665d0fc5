"""Fact-table builders (SURVEY.md §2 J1, K6, K7, C5).

Reference semantics being reproduced:

- ``f_sales``: orders joined to the calendar dim on casted-date equality
  (reference ``src/dags/sql/update_mart_f_table.sql:4-6``).
- schema widening + constant backfill: ``ALTER TABLE ADD COLUMN status`` +
  ``UPDATE SET status='shipped'`` fuse into one projection (K6+K7,
  reference ``update_mart_f_table.sql:12`` + ``load_inc_f_table.sql:7``).
- the core "no duplicates" semantics (reference README.md:8-9,21-22):
  snapshot rows are stamped ``status='shipped'`` and the increment —
  which carries its own status, including ``'refunded'`` — is appended
  (C5, reference ``date_periods.sql:17-26``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stamp_status(df: DataFrame, status: str = "shipped") -> DataFrame:
    """K6+K7 fused: add/overwrite a ``status`` column with a constant.

    The reference needs two DDL/DML statements because Postgres tables are
    mutable in place; a DataFrame projection does both in zero passes over
    the data (column is materialized only when consumed downstream).
    """
    return df.withColumn("status", F.lit(status).cast("string"))


def merge_snapshot_increment(
    snapshot: DataFrame, increment: DataFrame, status_default: str = "shipped"
) -> DataFrame:
    """C5: ``user_order_log_v2`` = snapshot (stamped) ∪ increment.

    Reference ``date_periods.sql:17-26``: CTAS from the snapshot, ALTER to
    add ``status``, UPDATE all rows to 'shipped', then INSERT the
    increment rows carrying their own status. Here: one projection + one
    union — no shuffle at all (union is a narrow op; downstream consumers
    decide partitioning).
    """
    stamped = stamp_status(snapshot, status_default)
    return stamped.unionByName(increment.select(*stamped.columns))


def build_fact_sales(
    orders: DataFrame,
    calendar: DataFrame,
    order_date_col: str = "date_time",
    select_cols: list[str] | None = None,
) -> DataFrame:
    """J1: fact rows × calendar dim on casted-date equality
    (reference ``update_mart_f_table.sql:5-6``).

    The calendar has one row per distinct date — always tiny relative to
    the fact — so we broadcast it explicitly: the join becomes a
    map-side BroadcastHashJoin with zero shuffle of the fact table, which
    is the plan that survives a 100 TB fact.
    """
    keyed = calendar.select(
        F.col("fact_date").cast("date").alias("__join_date"), "date_id"
    )
    out = orders.join(
        F.broadcast(keyed),
        orders[order_date_col].cast("date") == keyed["__join_date"],
        "inner",
    ).drop("__join_date")
    if select_cols:
        out = out.select(*select_cols)
    return out
