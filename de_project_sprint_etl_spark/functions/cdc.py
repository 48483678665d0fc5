"""Change-data-capture apply: MERGE INTO semantics on plain parquet.

The reference's C5 merge (snapshot ∪ increment, operators/facts.py)
handles append-only increments. A real change stream also carries
updates and deletes with an ordering (LSN / commit seq). Lakehouse
formats expose this as ``MERGE INTO``; this operator is the
engine-level equivalent for path-based tables:

    state' = latest-wins(snapshot ∪ changelog) minus deletes

Shape: tag snapshot rows with seq = -1 (older than every change),
union the changelog, ONE row_number window per key ordered by seq
descending, keep rank-1 rows whose final op is not 'D'. One shuffle
on the key — no join, so a 100 TB snapshot + a small daily changelog
costs one co-partitioned window pass, and skew mitigation (AQE) sees
a single exchange. The union requires the changelog to carry the
snapshot's columns for I/U rows (D rows only need the key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Latest-wins CDC apply. ``changes`` columns = snapshot columns +
    ``seq_col`` (bigint, unique per key — ties are a data error) +
    ``op_col`` ('I' | 'U' | 'D'). Returns the new state with the
    snapshot's schema."""
    data_cols = snapshot.columns
    tagged_snap = snapshot.select(
        *data_cols,
        F.lit(-1).cast("long").alias(seq_col),
        F.lit("I").alias(op_col),
    )
    allrows = tagged_snap.unionByName(
        changes.select(*data_cols, seq_col, op_col)
    )
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        allrows.withColumn("__rk", F.row_number().over(w))
        .filter((F.col("__rk") == 1) & (F.col(op_col) != "D"))
        .select(*data_cols)
    )
