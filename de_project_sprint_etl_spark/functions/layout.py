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

Two layers here:

1. The WRITE path (``z_order_key``, ``overwrite_zorder``): pure JVM bit
   expressions; one narrow projection + one range exchange, paid once
   at materialization and amortized over every later scan — the same
   mechanism Delta/Iceberg expose as ``OPTIMIZE ZORDER BY``, as a
   plain-parquet writer.
2. The MEASURE path (``*_sql`` builders): the per-bucket min/max
   skipping index and a three-layout effectiveness comparison, emitted
   as SQL text evaluated verbatim by BOTH engines (Catalyst ``F.expr``
   and DuckDB) so the layout keys and skipping metrics are value-hash
   checkable in the gate. Normalization stats are one aggregated row
   broadcast back; keying is map-only; the index is one
   partial-combined groupBy on the bucket id.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 8  # bits per interleaved dimension in the MEASURE path


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


# --- measure path: cross-engine SQL builders ----------------------------------


def scaled_sql(
    col: str, mn: str, mx: str, bits: int = ZBITS, int_scale: int = 1
) -> str:
    """SQL for affine-scaling ``col`` into the [0, 2^bits - 1] integer
    grid given min/max expressions — INTEGER-STABLE cross-engine.

    The naive ``FLOOR((x - mn) * top / span)`` in doubles is fragile: a
    value whose true grid coordinate is exactly an integer boundary can
    floor to adjacent cells on engines that contract the multiply +
    divide differently (FMA), shifting one row per boundary — invisible
    at most fixture seeds, red at others. Instead: values are first
    mapped to exact integers with ``FLOOR(x * int_scale + 0.5)`` (exact
    for inputs with <= log10(int_scale) fractional digits; one IEEE
    multiply + add + floor, no reordering freedom, bit-identical on any
    engine), then the cell is pure integer arithmetic. The dividend is
    made exactly divisible by subtracting its integer remainder, so the
    single double division is exact (quotient, dividend and divisor all
    < 2^53) and a FLOOR boundary cannot shift by an ulp. Clamped;
    degenerate span (min==max) -> 0."""
    top = (1 << bits) - 1

    def to_int(e: str) -> str:
        mul = "" if int_scale == 1 else f" * {int_scale}.0"
        return f"CAST(FLOOR(CAST({e} AS DOUBLE){mul} + 0.5) AS BIGINT)"

    num = f"({to_int(col)} - {to_int(mn)})"
    span = f"NULLIF({to_int(mx)} - {to_int(mn)}, 0)"
    prod = f"({num} * {top})"
    raw = f"CAST(({prod} - ({prod} % {span})) / {span} AS BIGINT)"
    return (
        f"COALESCE(LEAST(CAST({top} AS BIGINT), "
        f"GREATEST(CAST(0 AS BIGINT), {raw})), CAST(0 AS BIGINT))"
    )


def interleave_sql(a: str, b: str, bits: int = ZBITS) -> str:
    """SQL for the Morton interleave of two ``bits``-wide integers:
    bit i of ``a`` lands at position 2i, of ``b`` at 2i+1. Written as a
    sum of disjoint-bit terms using only >> & << (+), which Spark 4 and
    DuckDB parse identically."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_index_sql(
    rel: str,
    col_a: str,
    col_b: str,
    bucket_shift: int = 6,
    bits: int = ZBITS,
    scale_a: int = 1,
    scale_b: int = 1,
) -> str:
    """Full SQL (oracle + Catalyst share it): per-Z-bucket file-skipping
    index — row count and min/max of both interleaved columns. Bucket =
    z >> bucket_shift, i.e. 2^(2*bits - bucket_shift) buckets ≈ files.
    ``scale_a``/``scale_b``: the integer-stability scale of each column
    (10^max_fractional_digits — see ``scaled_sql``)."""
    sa = scaled_sql(col_a, "mn_a", "mx_a", bits, int_scale=scale_a)
    sb = scaled_sql(col_b, "mn_b", "mx_b", bits, int_scale=scale_b)
    z = interleave_sql("za", "zb", bits)
    return f"""
WITH stats AS (
  SELECT MIN({col_a}) AS mn_a, MAX({col_a}) AS mx_a,
         MIN({col_b}) AS mn_b, MAX({col_b}) AS mx_b
  FROM {rel}),
scaled AS (
  SELECT {col_a} AS va, {col_b} AS vb, {sa} AS za, {sb} AS zb
  FROM {rel} CROSS JOIN stats),
keyed AS (
  SELECT va, vb, {z} >> {bucket_shift} AS bucket FROM scaled)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(va) AS mn_a, MAX(va) AS mx_a,
       MIN(vb) AS mn_b, MAX(vb) AS mx_b
FROM keyed
GROUP BY bucket
"""


def skipping_effectiveness_sql(
    rel: str,
    col_a: str,
    col_b: str,
    lo_a: str,
    hi_a: str,
    lo_b: str,
    hi_b: str,
    bucket_shift: int = 6,
    bits: int = ZBITS,
    scale_a: int = 1,
    scale_b: int = 1,
) -> str:
    """SQL comparing file-skipping for a 2-D box predicate under three
    layouts of the SAME table into the SAME number of buckets:
    Z-order on (a, b), lexicographic sort on (a, b), lexicographic
    sort on (b, a). A bucket must be scanned iff its [min, max] box
    intersects the predicate box — the exact rule engines apply to file
    stats. Output: one row per layout with buckets_scanned /
    buckets_total / rows_scanned (rows inside scanned buckets) /
    rows_matched.

    Fairness: all three layouts cut the SAME 2·bits-bit key space into
    the same 2^(2·bits − bucket_shift) buckets — the sort layouts use
    the lexicographic key (hi<<bits)|lo, so their bucket granularity is
    identical to z-order's and the comparison measures the LAYOUT, not
    a bucket-count handicap."""
    sa = scaled_sql(col_a, "mn_a", "mx_a", bits, int_scale=scale_a)
    sb = scaled_sql(col_b, "mn_b", "mx_b", bits, int_scale=scale_b)
    z = interleave_sql("za", "zb", bits)
    n_buckets = 1 << (2 * bits - bucket_shift)
    # bucket-level stats are b_* and the predicate-box bounds box_* —
    # distinct names so the global stats never shadow the bucket index
    pred_overlap = (
        "b_mn_a <= box_hi_a AND box_lo_a <= b_mx_a "
        "AND b_mn_b <= box_hi_b AND box_lo_b <= b_mx_b"
    )
    row_match = (
        "va >= box_lo_a AND va <= box_hi_a "
        "AND vb >= box_lo_b AND vb <= box_hi_b"
    )

    def layout(name: str, bucket_expr: str) -> str:
        return f"""
SELECT '{name}' AS layout,
       CAST(COUNT(*) FILTER (WHERE {pred_overlap}) AS BIGINT) AS buckets_scanned,
       CAST(COUNT(*) AS BIGINT) AS buckets_total,
       CAST(SUM(CASE WHEN {pred_overlap} THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_scanned,
       CAST(SUM(n_matched) AS BIGINT) AS rows_matched
FROM (
  SELECT {bucket_expr} AS bucket,
         COUNT(*) AS n_rows,
         SUM(CASE WHEN {row_match} THEN 1 ELSE 0 END) AS n_matched,
         MIN(box_lo_a) AS box_lo_a, MIN(box_hi_a) AS box_hi_a,
         MIN(box_lo_b) AS box_lo_b, MIN(box_hi_b) AS box_hi_b,
         MIN(va) AS b_mn_a, MAX(va) AS b_mx_a,
         MIN(vb) AS b_mn_b, MAX(vb) AS b_mx_b
  FROM scaled
  GROUP BY {bucket_expr}) idx"""

    return f"""
WITH stats AS (
  SELECT MIN({col_a}) AS mn_a, MAX({col_a}) AS mx_a,
         MIN({col_b}) AS mn_b, MAX({col_b}) AS mx_b
  FROM {rel}),
scaled AS (
  SELECT {col_a} AS va, {col_b} AS vb, {sa} AS za, {sb} AS zb,
         {lo_a} AS box_lo_a, {hi_a} AS box_hi_a,
         {lo_b} AS box_lo_b, {hi_b} AS box_hi_b
  FROM {rel} CROSS JOIN stats),
z_l AS ({layout("zorder", f"({z} >> {bucket_shift})")}),
a_l AS ({layout("sort_a", f"(((za << {bits}) + zb) >> {bucket_shift})")}),
b_l AS ({layout("sort_b", f"(((zb << {bits}) + za) >> {bucket_shift})")})
SELECT * FROM z_l UNION ALL SELECT * FROM a_l UNION ALL SELECT * FROM b_l
"""
