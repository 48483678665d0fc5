"""In-engine supervised model training: full-batch gradient-descent
linear regression over a feature-vector column, with the whole training
run replayable by an external SQL engine (the same determinism contract
as ``functions/clustering.kmeans`` and ``functions/graph.pagerank``).

Reference parity: no analog in MatthewS-M/de-project-sprint-ETL — an
extension op from the build brief's training-data-pipeline surface (the
"learned quality classifier" step of a curation pipeline, e.g. a
fastText/LR quality gate, reduced to a linear model trainable inside
the engine).

Cross-engine determinism:
- features arrive PRE-ROUNDED (ratios of exact integers rounded to 6
  decimals), so both engines start from bit-identical doubles;
- the per-doc margin is a strict-order fold over the feature axis
  (``zip_with`` + ``aggregate`` ↔ ``list_transform(range(..))`` +
  ``list_aggregate('sum')``);
- each gradient component folds a doc_id-sorted in-row list, fixing
  double addition order (not a parallel SUM);
- weights update with plain arithmetic (no transcendentals — linear,
  not logistic, precisely so no ``exp`` implementation can diverge).

Scale notes: one gradient step = one broadcast of the k-row weight
vector, one (feature j)-keyed aggregation of k × n terms. The sorted
in-row gradient lists are O(n) per feature — the deliberate trade for
external replayability (production training without a replay oracle
would use a plain SUM, which partial-aggregates map-side; the
``exact-decimal moments`` op shows that shape). Weights are
localCheckpointed per round so round t doesn't replan rounds 1..t-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _margin(xs, w):
    """Strict-order dot-product fold along the feature axis."""
    return F.aggregate(
        F.zip_with(xs, w, lambda x, wj: x * wj),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def linreg_gd(
    feats: DataFrame,
    n_features: int,
    iterations: int = 3,
    lr: float = 0.5,
) -> DataFrame:
    """Train ``w`` by full-batch GD on ``feats`` (``doc_id, xs, y`` with
    ``xs`` an ``array<double>`` of length ``n_features``, bias included
    as a constant 1.0 feature) and return per-doc predictions under the
    final weights: ``doc_id, y, pred`` (pred rounded to 6).

    Update: ``w_j -= lr/n * Σ_i (x_i·w - y_i) x_ij`` — the least-squares
    gradient, summed in doc_id order.
    """
    f = feats.select("doc_id", "xs", "y").persist()
    n = f.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    w = f.sparkSession.range(1).select(
        F.array(*[F.lit(0.0) for _ in range(n_features)]).alias("w")
    )
    for _ in range(iterations):
        resid = f.crossJoin(F.broadcast(w)).select(
            "doc_id", "xs", (_margin(F.col("xs"), F.col("w")) - F.col("y")).alias("r")
        )
        terms = resid.select(
            "doc_id", "r", F.posexplode("xs").alias("j", "xj")
        ).select("doc_id", "j", (F.col("r") * F.col("xj")).alias("g"))
        grad = terms.groupBy("j").agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("doc_id").alias("i"), F.col("g")))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["g"],
            ).alias("gs")
        )
        gvec = grad.groupBy().agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("j").alias("p"), F.col("gs")))),
                lambda x: x["gs"],
            ).alias("gv")
        )
        w = (
            w.crossJoin(gvec)
            .crossJoin(F.broadcast(n))
            .select(
                F.zip_with(
                    "w", "gv", lambda wj, gj: wj - F.lit(lr) * gj / F.col("__n")
                ).alias("w")
            )
            # n_features values; flattens the per-round lineage
            .localCheckpoint(eager=True)
        )
    return f.crossJoin(F.broadcast(w)).select(
        "doc_id",
        "y",
        F.round(_margin(F.col("xs"), F.col("w")), 6).alias("pred"),
    )


def sql_linreg_gd(
    feats_rel: str,
    n_features: int,
    iterations: int = 3,
    lr: float = 0.5,
) -> str:
    """DuckDB mirror of :func:`linreg_gd`. ``feats_rel`` must yield
    ``doc_id, xs (DOUBLE[]), y`` with the SAME pre-rounded features."""
    rng = f"range(1, {n_features + 1})"

    def margin(w_rel: str) -> str:
        return (
            f"list_aggregate(list_transform({rng},"
            f" i -> f.xs[i] * {w_rel}.w[i]), 'sum')"
        )

    ctes = [
        f"f AS (SELECT doc_id, xs, y FROM {feats_rel})",
        "n AS (SELECT COUNT(*) AS c FROM f)",
        f"w0 AS (SELECT list_transform({rng}, i -> 0.0) AS w)",
    ]
    prev = "w0"
    for t in range(iterations):
        ctes.append(
            f"""r{t} AS (
  SELECT f.doc_id, f.xs, {margin(prev)} - f.y AS r
  FROM f CROSS JOIN {prev})"""
        )
        ctes.append(
            f"""g{t} AS (
  SELECT u.i AS j,
         list_aggregate(list_transform(
           list_sort(list({{'i': doc_id, 'g': r * xs[u.i]}})), x -> x.g),
           'sum') AS gs
  FROM r{t}, UNNEST({rng}) u(i)
  GROUP BY u.i)"""
        )
        ctes.append(
            f"""w{t + 1} AS (
  SELECT list_transform(
           list_sort(list({{'p': g.j, 'v': {prev}.w[g.j] - {lr} * g.gs / n.c}})),
           x -> x.v) AS w
  FROM g{t} g CROSS JOIN {prev} CROSS JOIN n)"""
        )
        prev = f"w{t + 1}"
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        f"SELECT f.doc_id, f.y, ROUND({margin(prev)}, 6) AS pred\n"
        f"FROM f CROSS JOIN {prev}"
    )
