"""Embedding-column preprocessing: L2 normalization, symmetric int8
quantization, per-label mean pooling (centroids).

These are the vector-side staples of a training/retrieval pipeline —
normalize before cosine work, quantize to cut storage/bandwidth 4×,
pool to build class centroids for IVF seeding or probing.

Scale shapes:
- normalize / quantize are **map-only** array expressions (one
  codegen'd scan, no shuffle, no Python) — a 100 TB embedding table
  pays exactly its read cost;
- centroids posexplode to ``(label, pos, value)`` and hash-aggregate —
  the shuffle carries G×D aggregated rows after map-side partial
  combine (G = #labels, D = dim), never N×D raw rows.

All arithmetic is on DOUBLE (the parquet column is float32; both
engines widen before folding, so the DuckDB oracle mirrors
bit-for-bit at 6-decimal rounding — same contract as
functions/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["l2_normalize", "quantize_int8", "label_centroids", "random_projection"]


def _vecd(vec_col: str) -> Column:
    return F.col(vec_col).cast("array<double>")


def l2_normalize(df: DataFrame, vec_col: str = "embedding",
                 out_col: str = "unit_vec") -> DataFrame:
    """Append ``out_col`` = vec / ||vec||2 (zero vectors pass through
    unscaled instead of dividing by zero)."""
    v = _vecd(vec_col)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    safe = F.when(norm == 0.0, F.lit(1.0)).otherwise(norm)
    return df.withColumn("__norm", safe).withColumn(
        out_col, F.transform(v, lambda x: x / F.col("__norm"))
    ).drop("__norm")


def quantize_int8(df: DataFrame, vec_col: str = "embedding",
                  out_col: str = "q_vec") -> DataFrame:
    """Append symmetric per-vector int8 quantization: ``scale`` =
    max(|x|)/127 and ``out_col[i] = round(x[i]/scale)`` ∈ [-127, 127]
    (an all-zero vector quantizes to zeros with scale 0)."""
    v = _vecd(vec_col)
    mx = F.array_max(F.transform(v, F.abs))
    scale = (mx / F.lit(127.0)).alias("scale")
    return (
        df.withColumn("scale", scale)
        .withColumn(
            out_col,
            F.when(F.col("scale") == 0.0,
                   F.transform(v, lambda x: F.lit(0).cast("int")))
            .otherwise(
                F.transform(v, lambda x: F.round(x / F.col("scale"), 0).cast("int"))
            ),
        )
    )


def label_centroids(emb: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-label mean vector, exploded as ``(label, pos, centroid,
    n_vectors)`` — the shape downstream joins want (assembling back to
    an array is one ``sort_array(collect_list(...))`` away, but the
    exploded form is what stays partial-aggregatable at scale)."""
    return (
        emb.select(F.col(label_col).alias("label"),
                   F.posexplode(_vecd(vec_col)).alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg("val").alias("centroid"),
             F.count(F.lit(1)).alias("n_vectors"))
    )


def random_projection(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: ``out_col[j] =
    <vec, planes[j]>`` for a fixed (seeded, unit-norm Gaussian) plane
    set — the standard dimensionality cut before LSH bucketing or
    coarse clustering (d → len(planes) floats per row).

    Map-only: the plane matrix ships as one nested-array literal (a
    single Catalyst Literal node, same trick as
    similarity.lsh_signature) and every output component is a
    ``zip_with``/``aggregate`` left fold — no shuffle, no Python; a
    100 TB embedding table pays exactly its scan cost.
    """
    from de_project_sprint_etl_spark.functions.similarity import _cached_lit

    v = _vecd(vec_col)
    proj = F.transform(
        _cached_lit(tuple(tuple(p) for p in planes)),
        lambda plane: F.aggregate(
            F.zip_with(v, plane, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return df.withColumn(out_col, proj)


def mrl_truncate(df: DataFrame, dim: int, vec_col: str = "embedding",
                 out_col: str = "mrl_vec") -> DataFrame:
    """Matryoshka-style truncation (Kusupati et al. 2022,
    arXiv:2205.13147): keep the FIRST ``dim`` coordinates and
    re-normalize — MRL-trained embeddings concentrate information in
    the prefix, so the truncated unit vector is a drop-in cheaper
    representation (the d/4 retrieval index, the re-rank ladder's
    first rung). Map-only: a slice, one strict-order norm fold, one
    transform; zero vectors pass through unscaled."""
    v = F.slice(_vecd(vec_col), 1, dim)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    safe = F.when(norm == 0.0, F.lit(1.0)).otherwise(norm)
    return (
        df.withColumn("__sv", v)
        .withColumn("__norm", safe)
        .withColumn(out_col, F.transform("__sv", lambda x: x / F.col("__norm")))
        .drop("__sv", "__norm")
    )
