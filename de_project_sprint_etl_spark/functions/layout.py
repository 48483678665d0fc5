"""Multi-dimensional storage clustering (Z-order / Morton curve).

``overwrite_layout`` (sources/writers.py) clusters on ONE sort axis —
row-group min/max stats then skip range predicates on that axis only.
When queries filter on TWO OR MORE columns (time × tenant, lat × lon,
source × quality-bucket), a lexicographic sort leaves every non-leading
axis scattered across all files. The Z-order key interleaves the bits
of the participating columns, so any contiguous key range maps to a
small hyper-rectangle in value space: sorting/partitioning by the key
gives EVERY participating column tight per-file and per-row-group
min/max bounds, and predicates on any of them skip data at both the
file-listing and row-group level.

All pure JVM bit expressions (shift/and/or) — the key costs one narrow
projection; the clustering write is one range exchange, paid once at
materialization and amortized over every later scan, exactly like
bucketing. This is the same mechanism Delta/Iceberg expose as
``OPTIMIZE ZORDER BY`` — here as a plain-parquet writer.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_order_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of each column.

    Columns must be non-negative integers that fit in ``bits`` bits
    (pre-scale floats/ranks upstream; values beyond the range still
    produce a valid ordering but adjacent cells lose locality). With
    ``n`` columns the key uses ``n * bits`` bits — keep ≤ 63."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit key")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    terms = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
        for j, c in enumerate(cs)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def overwrite_zorder(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 16,
    n_files: int | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Materialize ``df`` Z-order-clustered on ``zorder_by``: one range
    exchange on the Morton key (contiguous key blocks per output
    partition), rows sorted by the key inside each task (tight
    row-group stats), key dropped before write — the layout is an
    ordering property, not a stored column."""
    keyed = df.withColumn("__zkey", z_order_key(zorder_by, bits=bits))
    parts = (
        keyed.repartitionByRange(n_files, "__zkey")
        if n_files
        else keyed.repartitionByRange("__zkey")
    )
    out = parts.sortWithinPartitions("__zkey").drop("__zkey")
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)
