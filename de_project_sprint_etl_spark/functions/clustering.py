"""K-means clustering over embedding tables (Lloyd's algorithm with a
fixed iteration count) — the training step behind an IVF index
(``functions/similarity.build_ivf_index`` consumes centroids like the
ones produced here).

Reference parity: no analog in MatthewS-M/de-project-sprint-ETL — an
extension op from the build brief's similarity-search surface.

Cross-engine determinism (so a DuckDB oracle can replay the whole
training run):
- init = the k lowest-id vectors (no RNG);
- distances are strict-order left folds over the dimension axis
  (``zip_with`` + ``aggregate`` ↔ ``list_transform(range(..))`` +
  ``list_aggregate('sum')`` — the same fold-parity contract the bigram
  LM op pins);
- assignment argmin breaks distance ties by cluster id;
- centroid means fold a (vec_id)-sorted value list in-row, so double
  addition order is engine-identical (not a parallel SUM).

Scale notes: assignment is a broadcast cross join against k centroid
rows — the corpus never shuffles. The update shuffles (cluster, dim)
cells (k × dim groups); per-cell value lists are O(cluster size), the
one deliberate trade for bit-reproducibility (a production run that
does not need an external replay oracle would use a plain SUM, which
partial-aggregates map-side). Centroids are localCheckpointed per
round: k rows, and it keeps round t from replanning rounds 1..t-1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _sqdist(ev: Column, cv: Column) -> Column:
    """Strict-order squared-distance fold along the dimension axis."""
    return F.aggregate(
        F.zip_with(ev, cv, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign each vector (``vec_id, ev``) to its nearest centroid
    (``cid, cv``): broadcast cross join + per-vector argmin with a
    (distance, cid) tie-break. Output: ``vec_id, cid, d2``."""
    w = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cid").asc())
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .select("vec_id", "cid", _sqdist(F.col("ev"), F.col("cv")).alias("d2"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def kmeans(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iterations`` Lloyd updates from the deterministic init and
    return the final assignment ``vec_id, cluster, d2`` (d2 rounded to 6
    decimals). Empty clusters simply drop out (no re-seeding), mirrored
    by the oracle's join semantics."""
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("ev"),
    )
    cw = Window.orderBy("vec_id")
    centroids = (
        e.orderBy("vec_id")
        .limit(k)
        .select((F.row_number().over(cw) - 1).alias("cid"), F.col("ev").alias("cv"))
    )
    for _ in range(iterations):
        assigned = kmeans_assign(e, centroids)
        cells = (
            assigned.join(e, "vec_id")
            .select("cid", "vec_id", F.posexplode("ev").alias("pos", "v"))
        )
        means = cells.groupBy("cid", "pos").agg(
            (
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("vec_id").alias("i"), F.col("v")))
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["v"],
                )
                / F.count(F.lit(1))
            ).alias("m")
        )
        centroids = (
            means.groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("pos").alias("p"), F.col("m")))),
                    lambda x: x["m"],
                ).alias("cv")
            )
            # k rows; flattens the per-round lineage (same contract as
            # graph.pagerank's rank checkpointing)
            .localCheckpoint(eager=True)
        )
    return kmeans_assign(e, centroids).select(
        "vec_id", F.col("cid").alias("cluster"), F.round("d2", 6).alias("d2")
    )


def sql_kmeans(rel: str, k: int = 8, iterations: int = 2) -> str:
    """DuckDB mirror of :func:`kmeans`: iterations unrolled as CTEs,
    identical init / fold order / tie-breaks."""
    d2 = (
        "list_aggregate(list_transform(range(1, len(e.ev) + 1),"
        " i -> (e.ev[i] - c.cv[i]) * (e.ev[i] - c.cv[i])), 'sum')"
    )

    def assign_cte(name: str, cent: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, cid, d2 FROM (
    SELECT s.*, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM (SELECT e.vec_id, c.cid, {d2} AS d2
          FROM e CROSS JOIN {cent} c) s
  ) r WHERE rn = 1
)"""

    ctes = [
        f"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM {rel})""",
        f"""c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, ev AS cv
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT {k}) i
)""",
    ]
    prev_c = "c0"
    for t in range(iterations):
        ctes.append(assign_cte(f"a{t}", prev_c))
        ctes.append(
            f"""m{t + 1} AS (
  SELECT cid, pos,
         list_aggregate(list_transform(
           list_sort(list({{'i': vec_id, 'v': v}})), x -> x.v), 'sum')
           / COUNT(*) AS m
  FROM (SELECT a.cid, e.vec_id, u.i AS pos, e.ev[u.i] AS v
        FROM a{t} a JOIN e USING (vec_id),
             UNNEST(range(1, len(e.ev) + 1)) u(i)) cell
  GROUP BY cid, pos
)"""
        )
        ctes.append(
            f"""c{t + 1} AS (
  SELECT cid, list_transform(list_sort(list({{'p': pos, 'm': m}})), x -> x.m) AS cv
  FROM m{t + 1} GROUP BY cid
)"""
        )
        prev_c = f"c{t + 1}"
    ctes.append(assign_cte("afinal", prev_c))
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT vec_id, cid AS cluster, ROUND(d2, 6) AS d2 FROM afinal"
    )
