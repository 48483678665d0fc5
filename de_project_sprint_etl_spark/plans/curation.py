"""Round-3 curation/retrieval extension ops.

Four op families on top of the round-1/2 surface, each Spark-first with
an exact DuckDB oracle:

- **exact-substring duplication profile** — the detection primitive of
  suffix-array substring dedup (Lee et al. 2021), re-expressed as
  fixed-width token-window hashing: windows that occur 2+ times
  anywhere in the corpus mark duplicated spans. One map-only window
  explode, one hash shuffle on a 60-bit key, one join-back that carries
  only the (rare at web scale) duplicated keys.
- **Johnson–Lindenstrauss random projection** — d→8 Gaussian projection
  of the embedding column; map-only nested-literal fold, the
  dimensionality cut before LSH/coarse quantization.
- **ANN recall evaluation** — recall@5 of the 3-table LSH index against
  the exact brute-force ranking, computed in-engine (the quality gate a
  retrieval pipeline runs after every index build). Composes the two
  existing index ops; the oracle composes their SQL mirrors.
- **temperature-based mixture sampling** — per-source keep rates
  ∝ n_s^0.5 (the multilingual-LM "temperature" rebalance), applied with
  the deterministic 60-bit hash gate so the sample is reproducible
  across runs, partitionings, and engines. Integer-scaled sqrt weights
  make the tiny per-source rate table bit-identical on both engines.

Reference parity note: none of these exist in the reference (SURVEY.md
§2.12 — its surface stops at equi/range joins and grouped aggregation);
they are extension ops for the 100 TB training-data use case, same tier
as plans/llm.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_sprint_etl_spark.functions import clustering, dedup, embeddings, lm, similarity
from de_project_sprint_etl_spark.functions.text import SQL_NORM, h64, sql_h64
from de_project_sprint_etl_spark.plans.llm import (
    LSH_TABLES,
    N_QUERIES,
    SQL_ANN_BRUTE,
    SQL_ANN_LSH,
    SQL_DOCS_MUT,
    SQL_EMB_COPIES,
    docs_with_mutants,
    emb_with_copies,
    fan_out,
)
from de_project_sprint_etl_spark.plans.registry import register
from de_project_sprint_etl_spark.plans.testdata import t

# --- exact-substring duplication profile ------------------------------------

SPAN_W = 8  # token-window width (the paper uses 50 BPE tokens; 8 word
# tokens is the same detection primitive scaled to the fixture docs)

_SQL_SPAN_SHINGLE = sql_h64(
    f"array_to_string(list_slice(tks, CAST(g.i AS INT),"
    f" CAST(g.i AS INT) + {SPAN_W - 1}), ' ')"
)


@register(
    "substring_span_dedup",
    f"""
WITH d AS ({SQL_DOCS_MUT}),
tk AS (SELECT doc_id, STRING_SPLIT({SQL_NORM.format(c='text')}, ' ') AS tks FROM d),
sh AS (SELECT doc_id, {_SQL_SPAN_SHINGLE} AS h
       FROM tk, UNNEST(generate_series(1, len(tks) - {SPAN_W - 1})) AS g(i)),
tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
c AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) > 1),
dup AS (SELECT doc_id, COUNT(*) AS dup_shingles FROM sh JOIN c USING (h)
        GROUP BY doc_id)
SELECT t.doc_id, t.n_shingles,
       CAST(COALESCE(dup.dup_shingles, 0) AS BIGINT) AS dup_shingles,
       ROUND(CAST(COALESCE(dup.dup_shingles, 0) AS DOUBLE) / t.n_shingles, 6)
         AS dup_frac
FROM tot t LEFT JOIN dup USING (doc_id)
""",
)
def q_substring_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication profile over the mutant corpus
    (extension op; functions/dedup.positional_shingle_profile). Every
    mutant shares all its 8-token windows with its original, so the
    profile flags exactly the duplicated spans the suffix-array method
    would."""
    return dedup.positional_shingle_profile(
        docs_with_mutants(spark, sf_dir), n=SPAN_W
    )


# --- JL random projection ---------------------------------------------------

PROJ_PLANES = similarity.hyperplanes(dim=64, n_planes=8, seed=11)

_PROJ_BRANCHES = "\nUNION ALL ".join(
    f"SELECT vec_id, {j} AS out_pos,"
    f" ROUND(list_dot_product(CAST(embedding AS DOUBLE[]),"
    # + 0.0: IEEE negative zero from rounding a tiny negative dot is
    # engine-divergent (DuckDB keeps -0.0, Spark's ROUND drops the
    # sign); adding +0.0 maps -0.0 -> +0.0 on both without changing
    # any nonzero value (found by the sf1 full differential)
    f" CAST([{', '.join(repr(v) for v in plane)}] AS DOUBLE[])), 6) + 0.0 AS proj_val"
    f" FROM embeddings"
    for j, plane in enumerate(PROJ_PLANES)
)


@register("embedding_random_projection", _PROJ_BRANCHES)
def q_embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection 64→8 of the embedding column (extension op;
    functions/embeddings.random_projection — map-only nested-literal
    fold). Output exploded to scalars for the cross-engine hash check."""
    emb = fan_out(spark, t(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    return (
        embeddings.random_projection(emb, PROJ_PLANES)
        .select("vec_id", F.posexplode("proj").alias("out_pos", "__p"))
        .select("vec_id", "out_pos", (F.round("__p", 6) + 0.0).alias("proj_val"))
    )


# --- ANN recall evaluation --------------------------------------------------


@register(
    "ann_recall_eval",
    f"""
WITH bf AS (SELECT query_id, neighbor_id FROM ({SQL_ANN_BRUTE}) b),
ap AS (SELECT query_id, neighbor_id FROM ({SQL_ANN_LSH}) a),
tot AS (SELECT query_id, COUNT(*) AS k_true FROM bf GROUP BY query_id),
hits AS (SELECT bf.query_id, COUNT(*) AS n_hits
         FROM bf JOIN ap ON bf.query_id = ap.query_id
                        AND bf.neighbor_id = ap.neighbor_id
         GROUP BY bf.query_id)
SELECT t.query_id, t.k_true,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / t.k_true, 6) AS recall_at_k
FROM tot t LEFT JOIN hits h ON t.query_id = h.query_id
""",
)
def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the multi-table LSH index vs the exact brute-force
    ranking, per query, computed in-engine (extension op). The truth
    and approx sides reuse the registered index ops; the intersection
    is a tiny (≤ k·|Q| rows) semi-join — index evaluation costs two
    index probes, never a new corpus pass."""
    emb = fan_out(spark, t(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    qs = emb.filter(F.col("vec_id") < N_QUERIES)
    truth = similarity.brute_force_topk(emb, qs, k=5).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.lsh_topk_tables(emb, qs, LSH_TABLES, k=5).select(
        "query_id", "neighbor_id"
    )
    tot = truth.groupBy("query_id").agg(F.count(F.lit(1)).alias("k_true"))
    hits = (
        truth.join(approx, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return tot.join(hits, "query_id", "left").select(
        "query_id",
        "k_true",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / F.col("k_true"), 6
        ).alias("recall_at_k"),
    )


# --- IVF nprobe-recall tuning curve (round 8) --------------------------------

#: probe counts swept by the curve; the registered IVF ops run nprobe=2
NPROBE_CURVE = (1, 2, 4, 8)


def _sql_ivf_nprobe_curve() -> str:
    from de_project_sprint_etl_spark.plans.llm import IVF_STRIDE, _sql_cos

    maxp = max(NPROBE_CURVE)
    hits = ", ".join(
        f"CAST(COUNT(*) FILTER (WHERE proberank <= {p}) AS BIGINT) AS nh_{i}"
        for i, p in enumerate(NPROBE_CURVE)
    )
    branches = " UNION ALL ".join(
        f"SELECT CAST({p} AS BIGINT) AS n_probes, n_true,"
        f" nh_{i} AS n_hits,"
        f" ROUND(CAST(nh_{i} AS DOUBLE) / GREATEST(n_true, 1), 6)"
        f" AS recall_at_k FROM s"
        for i, p in enumerate(NPROBE_CURVE)
    )
    # bf is referenced twice and s by every branch — MATERIALIZED so
    # DuckDB's per-reference CTE inlining cannot re-run the brute-force
    # pass; the neighbor-side assignment is restricted to the <=250
    # distinct true neighbors, so the curve costs one brute-force pass
    # plus two tiny cross joins
    return f"""
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT id AS cent_id, v AS cv FROM e WHERE id % {IVF_STRIDE} = 0),
bf AS MATERIALIZED (SELECT query_id, neighbor_id FROM ({SQL_ANN_BRUTE}) b),
nv AS (SELECT DISTINCT neighbor_id AS id FROM bf),
ns AS (SELECT e.id, cent_id, ROUND({_sql_cos('e.v', 'cent.cv')}, 6) AS cos_c
       FROM e JOIN nv USING (id) CROSS JOIN cent),
ncell AS (SELECT id AS neighbor_id, cent_id AS cell FROM (
    SELECT id, cent_id, ROW_NUMBER() OVER (
        PARTITION BY id ORDER BY cos_c DESC, cent_id DESC) AS rn
    FROM ns) r WHERE rn = 1),
qsc AS (SELECT e.id, cent_id, ROUND({_sql_cos('e.v', 'cent.cv')}, 6) AS cos_c
        FROM e CROSS JOIN cent WHERE e.id < {N_QUERIES}),
qrank AS (SELECT id AS query_id, cent_id AS cell, CAST(rn AS BIGINT) AS proberank
          FROM (SELECT id, cent_id, ROW_NUMBER() OVER (
                    PARTITION BY id ORDER BY cos_c DESC, cent_id DESC) AS rn
                FROM qsc) r WHERE rn <= {maxp}),
j AS (SELECT bf.query_id, qr.proberank
      FROM bf JOIN ncell USING (neighbor_id)
      LEFT JOIN qrank qr ON qr.query_id = bf.query_id
                        AND qr.cell = ncell.cell),
s AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_true, {hits} FROM j)
{branches}
"""


@register("ivf_nprobe_recall_curve", _sql_ivf_nprobe_curve())
def q_ivf_nprobe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nprobe-recall tuning curve (extension op; the index-tuning
    sibling of lsh_band_tuning and dedup_threshold_sensitivity):
    recall@5 of the IVF index at n_probes in {1,2,4,8} against the
    exact brute-force truth, WITHOUT running four probe passes. A true
    neighbor is recovered at probe depth p iff its home cell ranks
    within the query's p nearest cells — and it then survives the
    candidate re-rank automatically, because a global top-k member
    outranks any candidate subset under the same (cos_sim, id) order.
    So the whole curve is: truth top-k (one brute-force pass the recall
    eval already pays), home cells for the <=250 true neighbors, the
    query-to-cell ranking, one join, and conditional counts. At 100 TB
    the same plan prices the probe-depth/recall tradeoff from a sampled
    query set before committing the index configuration."""
    from de_project_sprint_etl_spark.functions.similarity import _dvec
    from de_project_sprint_etl_spark.plans import llm

    emb = fan_out(spark, t(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    cent = emb.filter(F.col("vec_id") % llm.IVF_STRIDE == 0).select(
        F.col("vec_id").alias("cent_id"), _dvec("embedding").alias("cv")
    )
    truth = similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < N_QUERIES), k=5
    ).select("query_id", "neighbor_id")
    nv = truth.select(F.col("neighbor_id").alias("vec_id")).distinct()
    ncell = similarity.ivf_cells(
        emb.join(nv, "vec_id").select(
            F.col("vec_id").alias("id"), _dvec("embedding").alias("v")
        ),
        cent,
        nprobe=1,
    ).select(F.col("id").alias("neighbor_id"), "cell")
    qrank = similarity.ivf_cell_ranks(
        emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("id"), _dvec("embedding").alias("v")
        ),
        cent,
        max_rank=max(NPROBE_CURVE),
    ).select(F.col("id").alias("query_id"), "cell", "proberank")
    j = truth.join(ncell, "neighbor_id").join(
        qrank, ["query_id", "cell"], "left"
    )
    row = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        *[
            F.sum((F.col("proberank") <= p).cast("long")).alias(f"nh_{i}")
            for i, p in enumerate(NPROBE_CURVE)
        ],
    ).select(
        "n_true",
        *[
            F.coalesce(F.col(f"nh_{i}"), F.lit(0)).cast("long").alias(f"nh_{i}")
            for i in range(len(NPROBE_CURVE))
        ],
    )
    structs = [
        F.struct(
            F.lit(p).cast("long").alias("n_probes"),
            F.col("n_true"),
            F.col(f"nh_{i}").alias("n_hits"),
            F.round(
                F.col(f"nh_{i}").cast("double")
                / F.greatest(F.col("n_true"), F.lit(1)),
                6,
            ).alias("recall_at_k"),
        )
        for i, p in enumerate(NPROBE_CURVE)
    ]
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


# --- temperature-based mixture sampling -------------------------------------

MIX_TARGET = 300  # target sample size driving the per-source rates
MIX_SEED = 1234

_SQL_MIX_GATE = sql_h64("CAST(doc_id AS VARCHAR)", MIX_SEED)


@register(
    "mixture_sample_temperature",
    f"""
WITH per AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source),
w AS (SELECT source, n_s,
             CAST(ROUND(SQRT(CAST(n_s AS DOUBLE)) * 1000) AS BIGINT) AS w_milli
      FROM per),
tot AS (SELECT SUM(w_milli) AS sum_w FROM w),
rates AS (SELECT source, n_s,
                 LEAST(CAST(1.0 AS DOUBLE),
                       ({MIX_TARGET}.0 * CAST(w_milli AS DOUBLE))
                       / (CAST(sum_w AS DOUBLE) * CAST(n_s AS DOUBLE)))
                   AS keep_frac
          FROM w CROSS JOIN tot)
SELECT d.doc_id, d.source, ROUND(r.keep_frac, 6) AS keep_frac
FROM documents d JOIN rates r USING (source)
WHERE {_SQL_MIX_GATE} % 1000000
      < CAST(FLOOR(keep_frac * 1000000.0) AS BIGINT)
""",
)
def q_mixture_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-reweighted (α = 0.5) source-mixture sample
    (extension op): per-source keep rates ∝ sqrt(n_s), capped at 1,
    applied via the deterministic hash gate — the multilingual-LM
    rebalance that upsamples rare sources relative to their share.

    Scale shape: the rate table is one tiny partial-combined groupBy
    (|sources| rows) broadcast back onto the corpus; the corpus itself
    never shuffles and the gate is a narrow filter. Integer milli-unit
    sqrt weights keep the rate doubles bit-identical across engines
    (double summation order over sources would not be).
    """
    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    w = per.withColumn(
        "w_milli",
        F.round(F.sqrt(F.col("n_s").cast("double")) * 1000, 0).cast("bigint"),
    )
    tot = w.agg(F.sum("w_milli").alias("sum_w"))
    rates = w.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0),
            (F.lit(float(MIX_TARGET)) * F.col("w_milli").cast("double"))
            / (F.col("sum_w").cast("double") * F.col("n_s").cast("double")),
        ).alias("keep_frac"),
    )
    gate = F.pmod(h64(F.col("doc_id").cast("string"), MIX_SEED), F.lit(1000000))
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(
            gate < F.floor(F.col("keep_frac") * F.lit(1000000.0)).cast("bigint")
        )
        .select("doc_id", "source", F.round("keep_frac", 6).alias("keep_frac"))
    )


# --- exact-substring span removal -------------------------------------------


@register(
    "strip_duplicated_spans",
    f"""
WITH d AS ({SQL_DOCS_MUT}),
tk AS (SELECT doc_id, STRING_SPLIT({SQL_NORM.format(c='text')}, ' ') AS tks FROM d),
sh AS (SELECT doc_id, CAST(g.i AS INT) AS pos, {_SQL_SPAN_SHINGLE} AS h
       FROM tk, UNNEST(generate_series(1, len(tks) - {SPAN_W - 1})) AS g(i)),
c AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) > 1),
st AS (SELECT doc_id, LIST(pos) AS starts FROM sh JOIN c USING (h) GROUP BY doc_id),
k AS (SELECT t.doc_id, t.tks,
             list_filter(t.tks,
                 (x, p) -> len(list_filter(COALESCE(st.starts, CAST([] AS INT[])),
                                           s -> s <= p AND p <= s + {SPAN_W - 1})) = 0)
               AS kept
      FROM tk t LEFT JOIN st ON t.doc_id = st.doc_id)
SELECT doc_id, CAST(len(tks) AS BIGINT) AS n_tokens,
       CAST(len(kept) AS BIGINT) AS n_kept,
       -- DuckDB's array_to_string returns NULL for an empty list where
       -- Spark's concat_ws returns '' — align on ''
       COALESCE(array_to_string(kept, ' '), '') AS text_clean
FROM k
""",
)
def q_strip_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span removal over the mutant corpus (extension
    op; functions/dedup.strip_duplicated_spans — the transform half of
    Lee et al. 2021 next to substring_span_dedup's detection half).
    Every mutant's token range reappears verbatim in its original, so
    both lose exactly the shared span."""
    return dedup.strip_duplicated_spans(docs_with_mutants(spark, sf_dir), n=SPAN_W)


# --- incremental near-dedup (increment vs snapshot) -------------------------


def _sql_incremental_minhash(num_hashes: int = 16, bands: int = 4,
                             thresh: float = 0.5) -> str:
    from de_project_sprint_etl_spark.plans.llm import MUT_OFFSET, _sql_minhash

    r = num_hashes // bands
    hcols = [f"h{i}" for i in range(num_hashes)]
    band_defs = ", ".join(
        "CONCAT_WS('_', " + ", ".join(hcols[b * r : (b + 1) * r]) + f") AS band{b}"
        for b in range(bands)
    )
    cand_union = "\nUNION\n".join(
        f"SELECT a.id AS id_inc, b.id AS id_snap FROM bi a "
        f"JOIN bs b ON a.band{b} = b.band{b}"
        for b in range(bands)
    )
    matches = " + ".join(
        f"CASE WHEN sa.{h} = sb.{h} THEN 1 ELSE 0 END" for h in hcols
    )
    return f"""
WITH sig AS ({_sql_minhash(num_hashes)}),
bi AS (SELECT *, {band_defs} FROM sig WHERE id >= {MUT_OFFSET}),
bs AS (SELECT *, {band_defs} FROM sig WHERE id < {MUT_OFFSET}),
cand AS ({cand_union})
SELECT id_inc, id_snap, ROUND(({matches}) / {num_hashes}.0, 6) AS est_jaccard
FROM cand JOIN sig sa ON sa.id = id_inc JOIN sig sb ON sb.id = id_snap
WHERE ROUND(({matches}) / {num_hashes}.0, 6) >= {thresh}
"""


@register("incremental_minhash_dedup", _sql_incremental_minhash())
def q_incremental_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dedup: the increment's (mutants') MinHash bands
    join only against the snapshot's (originals') — the snapshot is
    never self-joined, so a daily increment costs O(|increment| +
    matched posting lists), not a full-corpus re-dedup (extension op;
    functions/dedup.minhash_lsh_pairs_against, the near-dup analog of
    incremental_exact_dedup)."""
    from de_project_sprint_etl_spark.plans.llm import MUT_OFFSET, mutant_shingles

    sigs = dedup.minhash_signatures(
        shingles=mutant_shingles(spark, sf_dir, n=3), num_hashes=16
    ).persist()
    inc = sigs.filter(F.col("id") >= MUT_OFFSET)
    snap = sigs.filter(F.col("id") < MUT_OFFSET)
    return dedup.minhash_lsh_pairs_against(
        inc, snap, num_hashes=16, bands=4, min_est_jaccard=0.5
    )


# --- SemDeDup (semantic dedup: k-means + within-cluster cosine) -------------


@register(
    "semdedup_embeddings",
    clustering.sql_semdedup(f"({SQL_EMB_COPIES}) ec", k=8, iterations=1, min_cos=0.95),
)
def q_semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means over the embedding corpus
    (with injected exact copies), cosine comparison confined to each
    cluster, min-id canonical keeps one vector per semantic clique —
    the clustering bounds the O(n²) comparison to cluster-sized blocks,
    which is the property that survives web scale (extension op;
    functions/clustering.semdedup)."""
    return clustering.semdedup(
        emb_with_copies(spark, sf_dir), k=8, iterations=1, min_cos=0.95
    )


@register(
    "semdedup_embeddings_adaptive",
    # The oracle computes the SAME adaptive k the Spark side does
    # (GREATEST(8, CEIL(n/400)) over the corpus, in SQL) instead of
    # pinning k=8 — the pinned form held at every gate scale (n ≤ 3200
    # ⇒ k=8) but silently diverged past that boundary, which the sf1
    # stress run caught (n=22000 ⇒ k=55). Now the mirror is hash-equal
    # at ANY corpus size; tests/test_curation.py pins the policy math.
    clustering.sql_semdedup(
        f"({SQL_EMB_COPIES}) ec",
        k=clustering.sql_semdedup_k_expr(target_cluster_size=400),
        iterations=1,
        min_cos=0.95,
    ),
)
def q_semdedup_embeddings_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the paper's scale control: k grows with the corpus
    so the cluster size — and the within-cluster O(size²) pair bound —
    stays constant. This is the form a 100 TB pipeline calls; the
    fixed-k twin above pins the paper's small-corpus parameters
    (extension op; functions/clustering.semdedup_adaptive)."""
    return clustering.semdedup_adaptive(
        emb_with_copies(spark, sf_dir),
        target_cluster_size=400,
        iterations=1,
        min_cos=0.95,
    )


# --- DSIR importance weights (targeted data selection) ----------------------


@register(
    "dsir_importance_weights",
    lm.sql_dsir_importance(
        "documents", "(SELECT * FROM documents WHERE lang = 'en') tg", buckets=512
    ),
)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023): hashed-bigram importance weights of every
    document against an English-target bag-of-ngrams model — the data
    selection step that reweights a raw crawl toward a target domain.
    Models are ≤512-bucket partial-combined aggs broadcast back; the
    corpus shuffles only on (doc, bucket) types (extension op;
    functions/lm.dsir_importance)."""
    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    return lm.dsir_importance(
        docs, docs.filter(F.col("lang") == "en"), buckets=512
    )


# --- product quantization (per-subspace codebooks) --------------------------

PQ_SUBSPACES = 4
PQ_SUBDIM = 16  # 64-dim embeddings -> 4 x 16
PQ_K = 16

_SQL_PQ_SUBVECTORS = f"""(
  SELECT u.s AS grp, vec_id,
         list_slice(CAST(embedding AS DOUBLE[]),
                    u.s * {PQ_SUBDIM} + 1, u.s * {PQ_SUBDIM} + {PQ_SUBDIM}) AS ev
  FROM embeddings, UNNEST([0, 1, 2, 3]) u(s)) sv"""



_PQ_MODEL_READ_CACHE: dict = {}


def _pq_model(spark: SparkSession, sf_dir: str):
    """The trained vector-index artifact — PQ codes + codebooks and the
    coarse IVF assignment + centroids — materialized ONCE per corpus
    generation (same keying discipline as plans/llm._materialized and
    the cached co-purchase graph): an index at scale is built by one
    job and queried by many, so the search queries scanning these
    parquet tables is the production shape, not a shortcut. The DuckDB
    oracles still REPLAY the full deterministic training from raw
    embeddings, so the artifact sits inside the correctness gate.
    Returns ``(pq_codes, pq_cent, coarse_assign, coarse_cent)``."""
    import os
    from pathlib import Path

    from de_project_sprint_etl_spark.plans.llm import _CACHE_ROOT

    src = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    key = sf_dir.strip("/").replace("/", "_")
    base = Path(_CACHE_ROOT) / f"{key}-emb-{src.st_mtime_ns}-{src.st_size}" / "pq_model"
    parts = ("pq_codes", "pq_cent", "coarse_assign", "coarse_cent")
    if not all((base / t / "_SUCCESS").exists() for t in parts):
        sub = _pq_subvectors(spark, sf_dir)
        assign, cent = clustering.kmeans_grouped(
            sub, k=PQ_K, iterations=1, vec_col="ev", with_centroids=True
        )
        assign.select(
            "grp", "vec_id", F.col("cluster").alias("cid"), "d2"
        ).write.mode("overwrite").parquet(str(base / "pq_codes"))
        cent.write.mode("overwrite").parquet(str(base / "pq_cent"))
        emb = fan_out(
            spark, t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        )
        cassign, ccent = clustering.kmeans(
            emb, k=8, iterations=1, with_centroids=True
        )
        cassign.write.mode("overwrite").parquet(str(base / "coarse_assign"))
        ccent.write.mode("overwrite").parquet(str(base / "coarse_cent"))
        for t_ in parts:
            _PQ_MODEL_READ_CACHE.pop((id(spark), str(base / t_)), None)
    out = []
    for t_ in parts:
        rkey = (id(spark), str(base / t_))
        if rkey not in _PQ_MODEL_READ_CACHE:
            _PQ_MODEL_READ_CACHE[rkey] = spark.read.parquet(str(base / t_))
        out.append(_PQ_MODEL_READ_CACHE[rkey])
    return tuple(out)


@register(
    "pq_encode_embeddings",
    f"""SELECT grp AS subspace, vec_id, cluster AS code, d2
FROM ({clustering.sql_kmeans_grouped(_SQL_PQ_SUBVECTORS, k=PQ_K, iterations=1)}) q""",
)
def q_pq_encode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (Jégou et al. 2011): split each
    64-dim embedding into 4 x 16-dim subvectors, train an independent
    16-centroid codebook per subspace with ONE set of group-wise k-means
    passes (no per-subspace driver loop), and emit each vector's 4-byte
    PQ code — the compression step of an IVF-PQ index, ~64x smaller than
    the float vectors it stands in for at search time (extension op;
    functions/clustering.kmeans_grouped). d2 is the per-subspace
    quantization error the codebook training minimizes."""
    codes, _, _, _ = _pq_model(spark, sf_dir)
    return codes.select(
        F.col("grp").alias("subspace"),
        "vec_id",
        F.col("cid").alias("code"),
        "d2",
    )


def _pq_subvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(spark, t(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    return emb.select(
        "vec_id",
        F.explode(F.array(*[F.lit(s) for s in range(PQ_SUBSPACES)])).alias("grp"),
        F.col("embedding").cast("array<double>").alias("__e"),
    ).select(
        "grp",
        "vec_id",
        F.expr(f"slice(__e, grp * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("ev"),
    )


@register(
    "pq_adc_topk",
    clustering.sql_pq_adc_topk(
        _SQL_PQ_SUBVECTORS, n_queries=N_QUERIES, k_codebook=PQ_K, iterations=1, topk=5
    ),
)
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ's search half: asymmetric-distance top-k over the PQ
    codes — per-query distance tables against the 4x16 codebooks are
    broadcast and the scan side touches only the integer code table
    (the ~64x-compressed stand-in for the vectors), which is the PQ
    inversion that matters at 100 TB (extension op;
    functions/clustering.pq_adc_topk)."""
    codes, cent, _, _ = _pq_model(spark, sf_dir)
    return clustering.pq_adc_topk(
        _pq_subvectors(spark, sf_dir),
        n_queries=N_QUERIES,
        k_codebook=PQ_K,
        iterations=1,
        topk=5,
        model=(codes, cent),
    )


_SQL_PQ_EXACT_D2 = (
    "list_aggregate(list_transform(range(1, len(q.ev) + 1),"
    " i -> (q.ev[i] - c.ev[i]) * (q.ev[i] - c.ev[i])), 'sum')"
)


@register(
    "pq_recall_eval",
    f"""
WITH ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
ex AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ROUND({_SQL_PQ_EXACT_D2}, 6), c.vec_id) AS rn
    FROM ev q CROSS JOIN ev c
    WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id) r WHERE rn <= 5),
ap AS (SELECT query_id, neighbor_id
       FROM ({clustering.sql_pq_adc_topk(_SQL_PQ_SUBVECTORS, n_queries=N_QUERIES,
                                         k_codebook=PQ_K, iterations=1, topk=5,
                                         exclude_self=True)}) a),
hits AS (SELECT ex.query_id, COUNT(*) AS n_hits
         FROM ex JOIN ap ON ex.query_id = ap.query_id
                        AND ex.neighbor_id = ap.neighbor_id
         GROUP BY ex.query_id)
SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS k_true,
       CAST(COALESCE(MIN(h.n_hits), 0) AS BIGINT) AS n_hits,
       ROUND(CAST(COALESCE(MIN(h.n_hits), 0) AS DOUBLE) / COUNT(*), 6)
         AS recall_at_k
FROM ex e LEFT JOIN hits h ON e.query_id = h.query_id
GROUP BY e.query_id
""",
)
def q_pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of PQ/ADC search against the exact L2 ranking — the
    quality gate an IVF-PQ deployment runs after (re)training codebooks,
    computed in-engine by composing the registered ADC op with a
    broadcast exact ranking over the same query set (extension op; the
    PQ analog of ann_recall_eval)."""
    from pyspark.sql import Window
    from de_project_sprint_etl_spark.functions.clustering import _sqdist

    emb = fan_out(spark, t(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    ev = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("ev"))
    qs = ev.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("ev").alias("qv")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("neighbor_id").asc())
    truth = (
        ev.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))  # true neighbors only
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_sqdist(F.col("qv"), F.col("ev")), 6).alias("d2"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
    )
    codes, cent, _, _ = _pq_model(spark, sf_dir)
    approx = clustering.pq_adc_topk(
        _pq_subvectors(spark, sf_dir), n_queries=N_QUERIES,
        k_codebook=PQ_K, iterations=1, topk=5, exclude_self=True,
        model=(codes, cent),
    ).select("query_id", "neighbor_id")
    tot = truth.groupBy("query_id").agg(F.count(F.lit(1)).alias("k_true"))
    hits = (
        truth.join(approx, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return tot.join(hits, "query_id", "left").select(
        "query_id",
        "k_true",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / F.col("k_true"), 6
        ).alias("recall_at_k"),
    )


@register(
    "ivfpq_topk",
    clustering.sql_ivfpq_topk(
        "embeddings",
        _SQL_PQ_SUBVECTORS,
        n_queries=N_QUERIES,
        coarse_k=8,
        nprobe=2,
        k_codebook=PQ_K,
        iterations=1,
        topk=5,
    ),
)
def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IVF-PQ search: the coarse quantizer prunes to the 2
    cells nearest each query, ADC over the PQ codes ranks only those
    candidates — exhaustive search becomes O(probed fraction) of the
    corpus, the structure a web-scale vector index runs on (extension
    op; functions/clustering.ivfpq_topk composes the registered coarse
    k-means + grouped-PQ pieces, and the oracle's two training chains
    coexist under cr_/pq_ prefixes)."""
    emb = fan_out(spark, t(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    codes, cent, cassign, ccent = _pq_model(spark, sf_dir)
    return clustering.ivfpq_topk(
        emb,
        _pq_subvectors(spark, sf_dir),
        n_queries=N_QUERIES,
        coarse_k=8,
        nprobe=2,
        k_codebook=PQ_K,
        iterations=1,
        topk=5,
        coarse_model=(cassign, ccent),
        pq_model=(codes, cent),
    )


@register("bpe_encode_vocab", lm.sql_bpe_encode_vocab("documents"))
def q_bpe_encode_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLY (Sennrich et al. 2016): encode the corpus
    vocabulary with the pinned ranked merge table — each merge a greedy
    leftmost fold, all Catalyst expressions. Work is vocab-sized, not
    corpus-sized (the explode+count collapses the Zipf head map-side),
    which is what makes in-engine tokenization viable at web scale
    (extension op; functions/lm.bpe_encode_vocab — the encode
    counterpart of bpe_merge_candidates' training statistics)."""
    return lm.bpe_encode_vocab(fan_out(spark, t(spark, sf_dir, "documents")))


@register(
    "bpe_token_accounting",
    f"""
WITH enc AS ({lm.sql_bpe_encode_vocab('documents')}),
tok AS (SELECT d.doc_id, d.source, w AS word
        FROM (SELECT doc_id, source,
                     STRING_SPLIT({SQL_NORM.format(c='text')}, ' ') AS t
              FROM documents) d, UNNEST(d.t) AS u(w)
        WHERE LENGTH(w) > 0)
SELECT t.source,
       CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(e.n_pieces) AS BIGINT) AS n_bpe_tokens
FROM tok t JOIN enc e ON t.word = e.word
GROUP BY t.source
""",
)
def q_bpe_token_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix accounting in REAL tokenizer units: per-source doc,
    word, and BPE-piece totals, computed by broadcast-joining the
    vocab-sized encode table back onto the token stream — two corpus
    scans (vocab build + token stream), text shuffled only at VOCAB
    granularity (the word-frequency groupBy); the doc-level stream
    moves nothing but (source)-keyed partial aggregates (extension op;
    what mixture/packing budgets should be denominated in at training
    time)."""
    from de_project_sprint_etl_spark.functions.text import tokens as _tokens

    docs = fan_out(
        spark, t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    enc = lm.bpe_encode_vocab(docs).select("word", "n_pieces")
    tok = (
        docs.select("doc_id", "source", F.explode(_tokens(F.col("text"))).alias("word"))
        .filter(F.length("word") > 0)
    )
    return (
        tok.join(F.broadcast(enc), "word")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_bpe_tokens"),
        )
    )


# --- classifier / dedup quality evaluation ----------------------------------

from de_project_sprint_etl_spark.plans.llm import _sql_lang_id  # noqa: E402
from de_project_sprint_etl_spark.functions import text as _text_fns  # noqa: E402


@register(
    "lang_id_eval",
    f"""
WITH pred AS (SELECT doc_id, lang_pred FROM ({_sql_lang_id('documents')}) p)
SELECT d.lang AS lang_true, pred.lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d JOIN pred USING (doc_id)
GROUP BY d.lang, pred.lang_pred
""",
)
def q_lang_id_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier quality gate for the stopword-vote language ID:
    confusion-matrix counts against the corpus's ground-truth ``lang``
    labels, computed in-engine (the check a curation pipeline runs
    before trusting a language filter). One narrow projection + one
    (true, pred)-keyed partial-combined agg; no extra corpus pass
    beyond the lang-ID scoring itself (extension op)."""
    docs = fan_out(
        spark, t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    )
    pred = _text_fns.with_lang_id(docs, "text")
    return (
        pred.groupBy(F.col("lang").alias("lang_true"), "lang_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


from de_project_sprint_etl_spark.plans.registry import ORACLES as _ORACLES  # noqa: E402

_NG_PAIRS = _ORACLES["ngram_jaccard_dedup"]
_MH_PAIRS = _ORACLES["minhash_lsh_dedup"]


@register(
    "minhash_dedup_eval",
    # each heavy pair pipeline appears EXACTLY ONCE: the original form
    # referenced tru/pr three times each (count + intersection +
    # denominator), and DuckDB's CTE materialization/re-evaluation of
    # the all-pairs truth side tripled its spill footprint — at sf1 it
    # exhausted the sandbox's temp disk. The union-flag aggregate below
    # computes all three counts from one pass over each side's
    # (distinct-by-construction) pair set; values are identical.
    f"""
WITH tru AS (SELECT id_a, id_b FROM ({_NG_PAIRS}) g WHERE jaccard >= 0.5),
pr AS (SELECT id_a, id_b FROM ({_MH_PAIRS}) m),
u AS (SELECT id_a, id_b, 1 AS t, 0 AS p FROM tru
      UNION ALL SELECT id_a, id_b, 0 AS t, 1 AS p FROM pr),
g AS (SELECT id_a, id_b, MAX(t) AS t, MAX(p) AS p FROM u GROUP BY id_a, id_b),
s AS (SELECT CAST(COALESCE(SUM(t), 0) AS BIGINT) AS n_true_pairs,
             CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_pred_pairs,
             CAST(COALESCE(SUM(t * p), 0) AS BIGINT) AS n_hits
      FROM g)
SELECT n_true_pairs, n_pred_pairs, n_hits,
       ROUND(CAST(n_hits AS DOUBLE) / GREATEST(n_pred_pairs, 1), 6)
         AS precision,
       ROUND(CAST(n_hits AS DOUBLE) / GREATEST(n_true_pairs, 1), 6) AS recall
FROM s
""",
)
def q_minhash_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-family quality gate (the near-dup analog of
    ann_recall_eval / pq_recall_eval): precision and recall of the
    MinHash+LSH candidate pairs against exact n-gram Jaccard >= 0.5 on
    the same mutant corpus, computed in-engine by composing the two
    REGISTERED pipelines — the check a curation run performs before
    trusting sketch-based dedup at a given band/hash configuration
    (extension op). The intersection is a pair-key join of two
    pair-sized (not corpus-sized) tables."""
    from de_project_sprint_etl_spark.plans.llm import minhash_pairs, ngram_pairs

    # union-flag single pass (the Spark twin of the r7 oracle rewrite):
    # each pair set appears EXACTLY ONCE as a union branch, the
    # per-pair MAX fold resolves membership, and one aggregate yields
    # all three counts. Both sides scan the once-per-corpus
    # MATERIALIZED pair artifacts (VERDICT r8 #2): the truth set is the
    # exact-pair table filtered to j >= 0.5 — prefix-filtered
    # generation is lossless at its 0.3 floor, so the filtered artifact
    # equals direct 0.5-threshold generation row-for-row.
    tru = (
        ngram_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", F.lit(1).alias("t"), F.lit(0).alias("p"))
    )
    pr = minhash_pairs(spark, sf_dir).select(
        "id_a", "id_b", F.lit(0).alias("t"), F.lit(1).alias("p")
    )
    g = (
        tru.unionByName(pr)
        .groupBy("id_a", "id_b")
        .agg(F.max("t").alias("t"), F.max("p").alias("p"))
    )
    # COALESCE(,0) in both twins (ADVICE r7): SUM over zero pairs is an
    # all-NULL row; a degenerate corpus must report zeros, not NULLs
    return g.agg(
        F.coalesce(F.sum("t"), F.lit(0)).cast("bigint").alias("n_true_pairs"),
        F.coalesce(F.sum("p"), F.lit(0)).cast("bigint").alias("n_pred_pairs"),
        F.coalesce(F.sum(F.col("t") * F.col("p")), F.lit(0))
        .cast("bigint")
        .alias("n_hits"),
    ).select(
        "n_true_pairs",
        "n_pred_pairs",
        "n_hits",
        F.round(
            F.col("n_hits").cast("double")
            / F.greatest(F.col("n_pred_pairs"), F.lit(1)),
            6,
        ).alias("precision"),
        F.round(
            F.col("n_hits").cast("double")
            / F.greatest(F.col("n_true_pairs"), F.lit(1)),
            6,
        ).alias("recall"),
    )


MRL_DIM = 16

_EMB_DV = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"


@register(
    "embedding_mrl_truncate",
    f"""
WITH e AS ({_EMB_DV}),
s AS (SELECT vec_id, list_slice(v, 1, {MRL_DIM}) AS sv FROM e),
n AS (SELECT vec_id, sv, SQRT(list_dot_product(sv, sv)) AS nrm FROM s)
SELECT vec_id, CAST(u.i AS INT) AS pos,
       ROUND(sv[CAST(u.i AS INT) + 1]
             / (CASE WHEN nrm = 0 THEN 1 ELSE nrm END), 6) + 0.0 AS mrl_val
FROM n, UNNEST(range(0, len(sv))) AS u(i)
""",
)
def q_embedding_mrl_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation 64→16 + re-norm (extension op;
    functions/embeddings.mrl_truncate — map-only, zero shuffle): the
    cheap-prefix representation an MRL-trained index serves before the
    full-dimension re-rank. Output exploded to scalars for the
    cross-engine hash check."""
    emb = fan_out(spark, t(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    return (
        embeddings.mrl_truncate(emb, dim=MRL_DIM)
        .select("vec_id", F.posexplode("mrl_vec").alias("pos", "__m"))
        .select("vec_id", "pos", (F.round("__m", 6) + 0.0).alias("mrl_val"))
    )


# --- weighted priority sampling (fixed-size, deterministic) ------------------

PRI_K = 20  # sample size per run
PRI_SALT = "pri"


@register(
    "weighted_priority_sample",
    f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         CAST({sql_h64('CAST(doc_id AS VARCHAR)', 4242)} AS DOUBLE)
           / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS pri
  FROM documents)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(rn AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY pri, doc_id) AS rn FROM keyed) r
WHERE rn <= {PRI_K}
""",
)
def q_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size WEIGHTED sample without RNG state (the priority /
    sequential-Poisson sampling family, Duffield et al. / Ohlsson):
    each doc gets priority key ``h64(id) / weight`` (weight = n_chars —
    longer docs proportionally likelier) and the k smallest keys win.
    The key is a ratio of exact integers, so the sample is bit-identical
    across runs, engines, and partitionings — ``sample()``/RNG
    reservoirs are none of those. Scale shape: map-only key projection
    + TakeOrdered top-k; no shuffle of the corpus (extension op)."""
    docs = fan_out(
        spark, t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    )
    from pyspark.sql import Window

    keyed = docs.withColumn(
        "pri",
        h64(F.col("doc_id").cast("string"), seed=4242).cast("double")
        / F.greatest(F.col("n_chars"), F.lit(1)).cast("double"),
    )
    w = Window.orderBy(F.col("pri").asc(), F.col("doc_id").asc())
    return (
        keyed.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= PRI_K)
        .select("doc_id", "source", F.col("n_chars").cast("bigint").alias("n_chars"), "rank")
    )


# --- distribution-matching rejection sampler ---------------------------------

DM_BUCKETS = 16
DM_SEED = 4242
DM_PPM = 1_000_000


@register(
    "distribution_match_sample",
    f"""
WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
st AS (SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM d),
bk AS (
  SELECT doc_id, lang,
         CAST((n_chars - st.mn) * {DM_BUCKETS} // (st.mx - st.mn + 1) AS BIGINT)
           AS bucket
  FROM d CROSS JOIN st),
hist AS (
  SELECT bucket, COUNT(*) AS s_b,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_b
  FROM bk GROUP BY bucket),
mbk AS (
  SELECT bucket AS m_bucket, s_b AS s_m, t_b AS t_m
  FROM hist WHERE t_b > 0
  ORDER BY CAST(t_b AS DOUBLE) / s_b DESC, bucket ASC LIMIT 1),
rates AS (
  SELECT h.bucket, h.s_b, h.t_b,
         (h.t_b * m.s_m) // (h.s_b * m.t_m) * {DM_PPM}
           + ((h.t_b * m.s_m) % (h.s_b * m.t_m)) * {DM_PPM}
             // (h.s_b * m.t_m) AS rate_ppm
  FROM hist h CROSS JOIN mbk m),
kept AS (
  SELECT b.bucket, COUNT(*) AS n_kept
  FROM bk b JOIN rates r ON b.bucket = r.bucket
  WHERE {sql_h64("CAST(doc_id AS VARCHAR)", DM_SEED)} % {DM_PPM} < r.rate_ppm
  GROUP BY b.bucket)
SELECT r.bucket, CAST(r.s_b AS BIGINT) AS n_source,
       CAST(r.t_b AS BIGINT) AS n_target,
       CAST(r.rate_ppm AS BIGINT) AS rate_ppm,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM rates r LEFT JOIN kept k ON r.bucket = k.bucket
""",
)
def q_distribution_match_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-matching rejection sampler: resample the WHOLE
    corpus so its document-length distribution matches the English
    subset's (the target-domain shape), per bucketed histogram ratio —
    the classic acceptance rule r(b) = P_target(b) / (M · P_source(b))
    with M = max ratio, so the kept set's length histogram is
    proportional to the target's. The curation move for matching a
    pre-training mix to a reference domain when DSIR-style reweighting
    must produce an actual SUBSET, not weights.

    Determinism discipline: rates are EXACT integer rationals — the
    normalizers cancel to r(b) = (t_b·s_m)/(s_b·t_m), computed as
    quotient+remainder ppm so both engines produce identical integers
    (per-bucket counts beyond ~3e9 need the DECIMAL path; the argmax M
    uses one double compare of identical IEEE divisions) — and the keep
    gate is the shared 60-bit doc-id hash, reproducible across runs,
    partitionings, and engines. Scale shape: two aggregates over a
    16-bucket space, one broadcast rate table, map-side gate; the
    corpus never shuffles."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    st = docs.agg(
        F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx")
    )
    bk = docs.crossJoin(F.broadcast(st)).select(
        "doc_id",
        "lang",
        F.expr(
            f"CAST((n_chars - mn) * {DM_BUCKETS} DIV (mx - mn + 1) AS BIGINT)"
        ).alias("bucket"),
    )
    # 16 rows feeding three consumers (argmax, rates, and through rates
    # the gate join) — without materializing, the docs scan + bucket agg
    # subtree re-executes per consumer (measured 20 scans in the plan).
    # Eager localCheckpoint: GC-managed blocks, no per-invocation
    # CacheManager entry left behind in a long-lived session.
    hist = bk.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("s_b"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t_b"),
    ).localCheckpoint(eager=True)
    mbk = (
        hist.filter(F.col("t_b") > 0)
        .orderBy(
            (F.col("t_b").cast("double") / F.col("s_b")).desc(),
            F.col("bucket").asc(),
        )
        .limit(1)
        .select(
            F.col("s_b").alias("s_m"), F.col("t_b").alias("t_m")
        )
    )
    rates = hist.crossJoin(F.broadcast(mbk)).select(
        "bucket",
        "s_b",
        "t_b",
        F.expr(
            f"(t_b * s_m) DIV (s_b * t_m) * {DM_PPM}"
            f" + ((t_b * s_m) % (s_b * t_m)) * {DM_PPM} DIV (s_b * t_m)"
        ).alias("rate_ppm"),
    )
    gate = h64(F.col("doc_id").cast("string"), seed=DM_SEED) % DM_PPM
    kept = (
        bk.join(F.broadcast(rates.select("bucket", "rate_ppm")), "bucket")
        .filter(gate < F.col("rate_ppm"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return rates.join(kept, "bucket", "left").select(
        "bucket",
        F.col("s_b").cast("bigint").alias("n_source"),
        F.col("t_b").cast("bigint").alias("n_target"),
        F.col("rate_ppm").cast("bigint").alias("rate_ppm"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
    )


# --- vocabulary growth (Heaps' law) curve ------------------------------------
#
# WHY this is a first-class curation op: the cost of every shingle-keyed
# dedup pass is driven by per-shingle document frequency, and df is set
# by how fast the vocabulary grows with the corpus. A web-scale corpus
# follows Heaps' law (V ~ n^beta, beta ~ 0.5-0.7: new-vocab-per-posting
# stays high, posting lists stay cold, exact set-similarity joins stay
# linear-ish); a SATURATED corpus (template text, synthetic data,
# boilerplate floods) stops minting vocabulary, df grows ~ corpus, and
# candidate volume goes quadratic — exactly what the round-5 sf1 stress
# measured on this fixture (29k distinct shingles at 10x postings) and
# what the prefix-join rewrite absorbs. This query IS the gate a
# pipeline runs to pick its dedup strategy: per corpus decile (by
# doc id), how many NEW trigram shingles appear vs how many postings
# arrive; a falling `new_per_posting` column is the quadratic-candidate
# early warning.

_SQL_SH3_RAW = _text_fns.sql_shingles("d.text", n=3)

_SQL_VOCAB_GROWTH = f"""
WITH sh AS (
  SELECT id, shingle FROM (
    SELECT id, UNNEST(sh_arr) AS shingle FROM (
      SELECT doc_id AS id, {_SQL_SH3_RAW} AS sh_arr FROM documents d) s0
  ) s WHERE LENGTH(shingle) > 0
),
mx AS (SELECT MAX(doc_id) AS mx FROM documents),
per_sh AS (SELECT shingle, MIN(id) AS first_doc, COUNT(*) AS df
           FROM sh GROUP BY shingle),
nv AS (SELECT LEAST(9, (10 * first_doc) // (mx + 1)) AS decile,
              COUNT(*) AS new_shingles
       FROM per_sh, mx GROUP BY 1),
pp AS (SELECT LEAST(9, (10 * id) // (mx + 1)) AS decile,
              COUNT(*) AS n_postings
       FROM sh, mx GROUP BY 1)
SELECT decile,
       COALESCE(new_shingles, 0) AS new_shingles,
       CAST(SUM(COALESCE(new_shingles, 0))
            OVER (ORDER BY decile) AS BIGINT) AS cum_vocab,
       COALESCE(n_postings, 0) AS n_postings,
       CAST(SUM(COALESCE(n_postings, 0))
            OVER (ORDER BY decile) AS BIGINT) AS cum_postings,
       ROUND(COALESCE(new_shingles, 0) / COALESCE(n_postings, 0), 6)
           AS new_per_posting
FROM nv FULL JOIN pp USING (decile)
ORDER BY decile
"""


def vocab_growth_from(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Heaps'-law vocabulary growth per corpus decile over ``docs``
    (columns ``doc_id``, ``text``): new trigram shingles vs postings
    arriving, cumulative vocabulary, and the new-vocab-per-posting rate
    whose decay signals df saturation (the quadratic-candidate hazard
    for shingle-keyed dedup — see module note). Two partial-combined
    aggregates over one persisted posting stream + a 10-row curve join;
    the only window runs over the decile curve itself (domain <= 10 by
    construction)."""
    from pyspark.sql import Window

    from de_project_sprint_etl_spark.functions.caching import cached_generation

    # generation-managed persist (one cached generation per session;
    # see functions/caching.py) — the stream feeds both decile aggs
    sh = cached_generation(
        spark, "vocab_sh", dedup._exploded_shingles(docs, "text", "doc_id", 3)
    )
    mx = docs.agg(F.max("doc_id").alias("mx"))

    def decile(col: str) -> F.Column:
        return F.least(F.lit(9), F.expr(f"(10 * {col}) DIV (mx + 1)"))

    per_sh = sh.groupBy("shingle").agg(F.min("id").alias("first_doc"))
    nv = (
        per_sh.crossJoin(F.broadcast(mx))
        .groupBy(decile("first_doc").alias("decile"))
        .agg(F.count(F.lit(1)).alias("new_shingles"))
    )
    pp = (
        sh.crossJoin(F.broadcast(mx))
        .groupBy(decile("id").alias("decile"))
        .agg(F.count(F.lit(1)).alias("n_postings"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        nv.join(pp, "decile", "full")
        .select(
            "decile",
            F.coalesce("new_shingles", F.lit(0)).alias("new_shingles"),
            F.coalesce("n_postings", F.lit(0)).alias("n_postings"),
        )
        .select(
            "decile",
            "new_shingles",
            F.sum("new_shingles").over(w).cast("long").alias("cum_vocab"),
            "n_postings",
            F.sum("n_postings").over(w).cast("long").alias("cum_postings"),
            F.round(
                F.col("new_shingles") / F.col("n_postings"), 6
            ).alias("new_per_posting"),
        )
        .orderBy("decile")
    )


def _vocab_curve_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE curve plan per (session, corpus): three registered queries
    (the curve itself, the strategy selector, the adaptive pair op's
    signal) consume it, and sharing the plan object shares the
    generation-persisted shingle stream inside it — without this, each
    build re-ran the dominant tokenize/explode job and unpersisted the
    identical stream the previous query just computed (r6 review)."""
    import os

    from de_project_sprint_etl_spark.functions.caching import session_scoped_value
    from de_project_sprint_etl_spark.plans.llm import docs_fanned
    from de_project_sprint_etl_spark.plans.registry import data_fingerprint

    fp = data_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    return session_scoped_value(
        "vocab_curve",
        spark,
        (sf_dir, fp),
        lambda: vocab_growth_from(spark, docs_fanned(spark, sf_dir)),
    )


@register("vocab_growth_curve", _SQL_VOCAB_GROWTH)
def q_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See :func:`vocab_growth_from` — bound to the documents table."""
    return _vocab_curve_cached(spark, sf_dir)


#: per-decile new-vocab-per-posting rate below which the shingle space
#: is df-SATURATED: new postings mostly revisit existing shingles, so
#: exact shingle-keyed candidate generation grows ~quadratically (sum
#: of df² — the measured sf1 ngram finding, BASELINE.md round-5 table)
#: and the right tier is MinHash-LSH (banded buckets bound candidates
#: by band collisions, not df²). Above it the vocabulary still grows
#: Heaps-style and the exact PPJoin tier stays near-linear. Measured
#: envelopes: the growing sf0.01 corpus sits at 0.387–0.955, the
#: saturated sf1 corpus at 0.000266–0.104 — 0.2 splits them with >3x
#: margin on either side.
DEDUP_SATURATION_THRESHOLD = 0.2

_SQL_DEDUP_STRATEGY = f"""
SELECT decile,
       new_per_posting,
       ROUND(CAST(cum_postings AS DOUBLE) / cum_vocab, 6) + 0.0 AS mean_df,
       CASE WHEN new_per_posting < {DEDUP_SATURATION_THRESHOLD}
            THEN 'minhash_lsh' ELSE 'exact_ngram' END AS chosen_tier
FROM ({_SQL_VOCAB_GROWTH}) v
ORDER BY decile
"""


def dedup_strategy_from(
    spark: SparkSession,
    docs: DataFrame,
    threshold: float = DEDUP_SATURATION_THRESHOLD,
) -> DataFrame:
    """Dedup-tier selection wired to the df-saturation signal (VERDICT
    r5 #3): per corpus decile, read the Heaps curve's
    ``new_per_posting`` rate and emit the tier a pipeline should run —
    ``exact_ngram`` (the PPJoin-family exact set-similarity join) while
    vocabulary still grows, ``minhash_lsh`` once the shingle space
    saturates and exact candidates go quadratic. ``mean_df`` —
    cumulative postings per distinct shingle — is emitted alongside as
    the blowup driver itself. Pure 10-row post-processing of the curve:
    costs nothing beyond the curve's two partial aggregates."""
    return _strategy_select(vocab_growth_from(spark, docs), threshold)


def _strategy_select(curve: DataFrame, threshold: float) -> DataFrame:
    return curve.select(
        "decile",
        "new_per_posting",
        (
            F.round(F.col("cum_postings").cast("double") / F.col("cum_vocab"), 6)
            + F.lit(0.0)
        ).alias("mean_df"),
        F.when(F.col("new_per_posting") < threshold, F.lit("minhash_lsh"))
        .otherwise(F.lit("exact_ngram"))
        .alias("chosen_tier"),
    ).orderBy("decile")


@register("dedup_strategy_select", _SQL_DEDUP_STRATEGY)
def q_dedup_strategy_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See :func:`dedup_strategy_from` — bound to the documents table.
    The saturated-regime-selects-MinHash contract is pinned in pytest
    on synthetic saturated/growing corpora; the sf1 corpus (mean df
    ~9.6–90.7 per decile) selects minhash_lsh for every decile past the
    first, matching the measured 12.4x exact-tier wall at 10x data."""
    return _strategy_select(
        _vocab_curve_cached(spark, sf_dir), DEDUP_SATURATION_THRESHOLD
    )


def _saturation_rate(spark: SparkSession, sf_dir: str) -> float:
    """The LAST decile's new-vocab-per-posting rate over ``documents``
    — where the Heaps curve has converged to the corpus's steady-state
    regime. Exact integer counts + ROUND(,6) on both engines, so the
    tier decision below is engine-identical. One collect per (session,
    corpus fingerprint): the signal is a property of the corpus, not
    the invocation (session_scoped_value, like llm._emb_count)."""
    import os

    from de_project_sprint_etl_spark.functions.caching import session_scoped_value
    from de_project_sprint_etl_spark.plans.registry import data_fingerprint

    def compute() -> float:
        row = (
            _vocab_curve_cached(spark, sf_dir)
            .filter(F.col("decile") == 9)
            .select("new_per_posting")
            .collect()
        )
        # no decile-9 row (max doc_id < 9, or unshingleable top decile)
        # or a NULL rate (zero postings): treat as still-growing — the
        # SQL oracle replays this via COALESCE(.., 1.0)
        return float(row[0][0]) if row and row[0][0] is not None else 1.0

    fp = data_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    return session_scoped_value("dedup_sat_rate", spark, (sf_dir, fp), compute)


def _sql_adaptive_dedup() -> str:
    from de_project_sprint_etl_spark.plans.llm import (
        _SQL_NGRAM_PAIRS,
        _sql_minhash_lsh,
    )

    t = DEDUP_SATURATION_THRESHOLD
    # COALESCE(.., 1.0) replays the Python fallback: a corpus with no
    # decile-9 curve row (max(doc_id) < 9, or a top decile whose texts
    # are too short to shingle) reads as rate=1.0 → the exact tier on
    # BOTH engines. Without it the scalar subquery is NULL and both
    # guarded branches filter to zero rows while the engine still emits
    # the exact tier's pairs.
    sig = "COALESCE((SELECT r FROM sig), 1.0)"
    return f"""
WITH sig AS (SELECT new_per_posting AS r FROM ({_SQL_VOCAB_GROWTH}) c
             WHERE decile = 9)
SELECT id_a, id_b, 'minhash_lsh' AS tier
FROM ({_sql_minhash_lsh()}) m WHERE {sig} < {t}
UNION ALL
SELECT id_a, id_b, 'exact_ngram' AS tier
FROM ({_SQL_NGRAM_PAIRS}) g WHERE {sig} >= {t}
"""


def adaptive_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The strategy EXECUTED, not just named (closes the loop VERDICT
    r5 #3 opened): measure the corpus's df-saturation rate once
    (cached per corpus), then build ONLY the chosen tier's pair
    pipeline — the exact PPJoin n-gram join while vocabulary still
    grows, MinHash-LSH banding once the shingle space saturates. The
    oracle replays the SAME decision in SQL: both tiers' full pipelines
    guarded by the signal predicate, so the unchosen side contributes
    zero rows and the result is hash-equal to whichever tier the data
    demands — at any scale. At 100 TB this is the difference between a
    near-linear banded bucket join and a df²-quadratic posting join
    chosen blind."""
    from de_project_sprint_etl_spark.plans import llm

    rate = _saturation_rate(spark, sf_dir)
    if rate < DEDUP_SATURATION_THRESHOLD:
        pairs, tier = llm.q_minhash_lsh(spark, sf_dir), "minhash_lsh"
    else:
        pairs, tier = llm.q_ngram_jaccard(spark, sf_dir), "exact_ngram"
    return pairs.select("id_a", "id_b", F.lit(tier).alias("tier"))


register("adaptive_dedup_pairs", _sql_adaptive_dedup())(adaptive_dedup_pairs)


# --- round-7 ops: continuation pairs, CDC chunk dedup, threshold curve --------

#: id offset for the synthetic continuation docs (distinct from the
#: mutant corpus' MUT_OFFSET so the two derived corpora never collide)
CONT_OFFSET = 500_000
#: boundary width (tokens) for the continuation fingerprints
CONT_K = 4

_SQL_CONT_CORPUS = f"""
base AS (SELECT doc_id, STRING_SPLIT({SQL_NORM.format(c='text')}, ' ') AS tks
         FROM documents),
cont AS (SELECT doc_id + {CONT_OFFSET} AS doc_id,
                list_slice(tks, len(tks) - {CONT_K - 1}, len(tks))
                  || list_slice(tks, 1, 10) AS tks
         FROM base WHERE doc_id % 7 = 0 AND len(tks) >= 14),
corpus AS (SELECT doc_id, tks FROM base UNION ALL SELECT doc_id, tks FROM cont)
"""

_SQL_HEAD_FP = sql_h64(f"array_to_string(list_slice(tks, 1, {CONT_K}), ' ')")
_SQL_TAIL_FP = sql_h64(
    f"array_to_string(list_slice(tks, len(tks) - {CONT_K - 1}, len(tks)), ' ')"
)


def _cont_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ synthetic continuation docs: every 7th doc gets a
    twin whose text STARTS with the original's last CONT_K tokens — the
    concatenated-crawl artifact (page split across fetches) that
    continuation detection exists to find. Built identically in the
    oracle SQL."""
    from de_project_sprint_etl_spark.functions.text import tokens

    from de_project_sprint_etl_spark.functions import guards

    docs = fan_out(spark, t(spark, sf_dir, "documents").select("doc_id", "text"))
    # loud row-level collision guard (ADVICE r7): a natural doc_id at or
    # past CONT_OFFSET would alias a synthetic continuation id, and the
    # constant-sharing oracle could never detect the corruption
    base = docs.select(
        guards.assert_below(F.col("doc_id"), CONT_OFFSET, "_cont_corpus")
        .alias("doc_id"),
        tokens(F.col("text")).alias("tks"),
    )
    cont = base.filter(
        (F.col("doc_id") % 7 == 0) & (F.size("tks") >= 14)
    ).select(
        (F.col("doc_id") + CONT_OFFSET).alias("doc_id"),
        F.concat(
            F.slice("tks", -CONT_K, CONT_K), F.slice("tks", 1, 10)
        ).alias("tks"),
    )
    return base.unionByName(cont)


@register(
    "doc_continuation_pairs",
    f"""
WITH {_SQL_CONT_CORPUS},
fps AS (SELECT doc_id, {_SQL_HEAD_FP} AS head_fp, {_SQL_TAIL_FP} AS tail_fp
        FROM corpus WHERE len(tks) >= {CONT_K})
SELECT a.doc_id AS src_id, b.doc_id AS dst_id, a.tail_fp AS boundary_fp
FROM fps a JOIN fps b ON a.tail_fp = b.head_fp AND a.doc_id <> b.doc_id
""",
)
def q_doc_continuation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-continuation detection: doc A's last CONT_K normalized
    tokens equal doc B's first CONT_K — the split-page / truncated-fetch
    artifact of web crawls, where B continues A and naive per-doc dedup
    sees two distinct documents. Each doc contributes ONE head and ONE
    tail fingerprint (shared 60-bit hash of the boundary token window),
    so detection is a map-only projection plus a single equi-join on the
    fingerprint — no pairwise comparison, no shuffle of text. At 100 TB
    the fingerprint table is 2 longs/doc and the join output is
    artifact-sized; candidate pairs feed the same connected-components
    stitcher as near-dup groups."""
    fps = _cont_corpus(spark, sf_dir).filter(F.size("tks") >= CONT_K).select(
        "doc_id",
        h64(F.concat_ws(" ", F.slice("tks", 1, CONT_K))).alias("head_fp"),
        h64(F.concat_ws(" ", F.slice("tks", -CONT_K, CONT_K))).alias("tail_fp"),
    )
    a = fps.select(
        F.col("doc_id").alias("src_id"), F.col("tail_fp").alias("boundary_fp")
    )
    b = fps.select(
        F.col("doc_id").alias("dst_id"), F.col("head_fp").alias("boundary_fp")
    )
    return (
        a.join(b, "boundary_fp")
        .filter(F.col("src_id") != F.col("dst_id"))
        .select("src_id", "dst_id", "boundary_fp")
    )


#: content-defined chunking boundary modulus: a token ends a chunk when
#: h64(token) % CDC_W == 0, so expected chunk length is CDC_W tokens and
#: boundaries move WITH the content — an insertion near a doc's head
#: shifts fixed-width windows everywhere but re-synchronizes CDC chunks
#: at the next boundary token
CDC_W = 8

_SQL_CDC_TOK = f"""
tk AS (SELECT doc_id, STRING_SPLIT({SQL_NORM.format(c='d.text')}, ' ') AS tks
       FROM ({{CORPUS}}) d),
tp AS (SELECT doc_id, CAST(g.i AS INT) AS pos, tks[CAST(g.i AS INT)] AS tok
       FROM tk, UNNEST(generate_series(1, len(tks))) AS g(i)
       WHERE LENGTH(tks[CAST(g.i AS INT)]) > 0),
ch AS (SELECT doc_id, pos, tok,
              COALESCE(SUM(CASE WHEN {sql_h64('tok')} % {CDC_W} = 0
                                THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS chunk
       FROM tp),
ct AS (SELECT doc_id, chunk, STRING_AGG(tok, ' ' ORDER BY pos) AS ctext,
              COUNT(*) AS n_toks
       FROM ch GROUP BY doc_id, chunk)
"""


def _cdc_chunk_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC chunk-fingerprint stream over the mutant corpus —
    (doc_id, chunk_fp, n_toks), one row per reassembled chunk. Shared
    by the dedup profile and the per-source dup-rate scorecard; its SQL
    twin is ``_SQL_CDC_TOK`` + the fingerprint projection."""
    from pyspark.sql import Window

    from de_project_sprint_etl_spark.functions.text import tokens
    from de_project_sprint_etl_spark.plans.llm import docs_with_mutants

    docs = docs_with_mutants(spark, sf_dir)
    tp = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    ).filter(F.length("tok") > 0)
    boundary = F.when(F.pmod(h64(F.col("tok")), F.lit(CDC_W)) == 0, 1).otherwise(0)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ch = tp.withColumn("chunk", F.coalesce(F.sum(boundary).over(w), F.lit(0)))
    ct = ch.groupBy("doc_id", "chunk").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
        ).alias("ctext"),
        F.count(F.lit(1)).alias("n_toks"),
    )
    return ct.select("doc_id", h64(F.col("ctext")).alias("chunk_fp"), "n_toks")


@register(
    "cdc_chunk_dedup",
    f"""
WITH {_SQL_CDC_TOK.format(CORPUS=SQL_DOCS_MUT)},
fp AS (SELECT doc_id, {sql_h64('ctext')} AS chunk_fp, n_toks FROM ct)
SELECT chunk_fp,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MIN(n_toks) AS BIGINT) AS n_tokens
FROM fp GROUP BY chunk_fp HAVING COUNT(DISTINCT doc_id) > 1
""",
)
def q_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (the rsync/LBFS boundary trick on
    word streams): a token ENDS a chunk when its 60-bit hash ≡ 0 mod
    CDC_W, chunks are re-assembled per (doc, running boundary count),
    and chunks whose text hash appears in 2+ docs are the duplicated
    spans. Unlike fixed-width windows (substring_span_dedup), CDC
    boundaries move with the content, so a prefix insertion — exactly
    the mutant corpus' construction — re-synchronizes at the next
    boundary instead of shifting every window. Scale shape: one
    per-doc-partitioned window (never global), one (doc, chunk) partial
    agg, one fingerprint-keyed agg; the chunk stream is corpus-sized
    but narrow, and only multi-doc fingerprints (artifact-sized) reach
    the output."""
    fp = _cdc_chunk_fps(spark, sf_dir)
    return (
        fp.groupBy("chunk_fp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("n_toks").cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_docs") > 1)
    )


#: thresholds swept by the sensitivity curve — all >= the registered
#: pair pipeline's 0.3 floor so ONE pass feeds every point
SENS_THRESHOLDS = (0.3, 0.5, 0.7, 0.9)


def _sql_threshold_sensitivity() -> str:
    from de_project_sprint_etl_spark.plans.llm import _SQL_NGRAM_PAIRS

    vals = ", ".join(f"(CAST({t} AS DOUBLE))" for t in SENS_THRESHOLDS)
    # O(pairs), not pairs x thresholds (VERDICT r7 #4): the r7 form
    # materialized the exploded (threshold, pair) frame — avoidable
    # entirely. pairs is MATERIALIZED (it is referenced twice and DuckDB
    # 1.0 inlines plain CTEs per reference — the heavy shingle pipeline
    # must run exactly once); n_pairs(t) is a conditional count straight
    # off pairs, n_docs(t) a conditional count off the per-doc
    # max-jaccard (doc participates at t iff its best pair clears t).
    # Thresholds with zero pairs are absent — exactly the old
    # GROUP-BY-over-explode semantics.
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT id_a, id_b, jaccard FROM ({_SQL_NGRAM_PAIRS}) p),
np AS (SELECT threshold,
              CAST(COUNT(*) FILTER (WHERE jaccard >= threshold) AS BIGINT)
                AS n_pairs
       FROM (VALUES {vals}) AS t(threshold) CROSS JOIN pairs
       GROUP BY threshold),
mj AS (SELECT id, MAX(jaccard) AS mj FROM (
         SELECT id_a AS id, jaccard FROM pairs
         UNION ALL SELECT id_b, jaccard FROM pairs) u GROUP BY id),
nd AS (SELECT threshold,
              CAST(COUNT(*) FILTER (WHERE mj >= threshold) AS BIGINT)
                AS n_docs
       FROM (VALUES {vals}) AS t(threshold) CROSS JOIN mj
       GROUP BY threshold)
SELECT np.threshold, np.n_pairs, nd.n_docs
FROM np JOIN nd USING (threshold)
WHERE np.n_pairs > 0
"""


def q_dedup_threshold_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dedup threshold-sensitivity curve: pair count and distinct-doc
    coverage of the n-gram Jaccard join at each candidate threshold,
    from ONE pass of the registered pair pipeline (every swept point is
    >= its 0.3 generation floor, so no extra candidate generation is
    paid). This is the tuning artifact a curation run actually reads —
    how much of the corpus each threshold would collapse — and it costs
    two tiny aggregations over the already-verified pair output."""
    from de_project_sprint_etl_spark.plans import llm

    # O(pairs), no pairs x thresholds explode (VERDICT r7 #4). The
    # tuning curve scans the once-per-corpus MATERIALIZED pair artifact
    # (VERDICT r8 #2 — at 100 TB the dedup wrote this table; a tuning
    # report re-mining candidates per query would be absurd there).
    # n_pairs(t) = conditional SUM(jaccard >= t) in one pass over
    # pairs; n_docs(t) = conditional count over the per-doc MAX jaccard
    # (a doc is covered at t iff its best pair clears t) — the curve in
    # two tiny aggs.
    pairs = llm.ngram_pairs(spark, sf_dir).select("id_a", "id_b", "jaccard")
    ts = [float(x) for x in SENS_THRESHOLDS]

    def curve(df, val: str, out: str) -> DataFrame:
        row = df.agg(
            *[
                F.sum((F.col(val) >= F.lit(t)).cast("long")).alias(f"c{i}")
                for i, t in enumerate(ts)
            ]
        )
        return row.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("threshold"),
                            F.coalesce(F.col(f"c{i}"), F.lit(0))
                            .cast("long")
                            .alias(out),
                        )
                        for i, t in enumerate(ts)
                    ]
                )
            ).alias("s")
        ).select("s.*")

    np_ = curve(pairs, "jaccard", "n_pairs")
    mj = (
        pairs.select(F.explode(F.array("id_a", "id_b")).alias("id"), "jaccard")
        .groupBy("id")
        .agg(F.max("jaccard").alias("mj"))
    )
    nd = curve(mj, "mj", "n_docs")
    # thresholds with zero pairs are absent — the old explode semantics
    return (
        np_.join(nd, "threshold")
        .filter(F.col("n_pairs") > 0)
        .select("threshold", "n_pairs", "n_docs")
    )


register("dedup_threshold_sensitivity", _sql_threshold_sensitivity())(
    q_dedup_threshold_sensitivity
)


# --- LSH band tuning (round 8) ------------------------------------------------

#: (bands, rows_per_band) factorizations of the 16-hash MinHash budget;
#: the registered minhash_lsh_dedup config is (4, 4)
LSH_TUNE_CONFIGS = ((16, 1), (8, 2), (4, 4), (2, 8), (1, 16))
#: fixed-point scale for per-pair candidate probabilities: summed as
#: exact integers so the aggregate is independent of summation order
#: (cross-engine AND cross-partitioning deterministic)
SCURVE_SCALE = 1_000_000


def _scurve_scaled_sql(b: int, r: int) -> str:
    p = dedup.lsh_scurve_sql("jaccard", b, r)
    return f"CAST(FLOOR({p} * {SCURVE_SCALE}.0 + 0.5) AS BIGINT)"


def _sql_lsh_band_tuning() -> str:
    from de_project_sprint_etl_spark.plans.llm import _SQL_NGRAM_PAIRS

    sums = []
    for i, (b, r) in enumerate(LSH_TUNE_CONFIGS):
        sp = _scurve_scaled_sql(b, r)
        sums.append(f"CAST(COALESCE(SUM({sp}), 0) AS BIGINT) AS ec_{i}")
        sums.append(
            f"CAST(COALESCE(SUM(CASE WHEN jaccard >= 0.5 THEN {sp} ELSE 0 END),"
            f" 0) AS BIGINT) AS eh_{i}"
        )
    branches = []
    for i, (b, r) in enumerate(LSH_TUNE_CONFIGS):
        est_t = round((1.0 / b) ** (1.0 / r), 6)
        branches.append(
            f"SELECT CAST({b} AS BIGINT) AS bands,"
            f" CAST({r} AS BIGINT) AS rows_per_band,"
            f" CAST({est_t!r} AS DOUBLE) AS est_threshold,"
            f" ROUND(ec_{i} / {SCURVE_SCALE}.0, 6) AS exp_candidates,"
            f" n_true,"
            f" ROUND(CAST(eh_{i} AS DOUBLE)"
            f" / ({SCURVE_SCALE}.0 * GREATEST(n_true, 1)), 6)"
            f" AS exp_recall_at_05 FROM s"
        )
    # pairs materialized: the heavy shingle pipeline must run once;
    # s materialized: the single agg row is referenced by every branch
    # and DuckDB 1.0 inlines plain CTEs per reference
    return f"""
WITH pairs AS MATERIALIZED (SELECT jaccard FROM ({_SQL_NGRAM_PAIRS}) p),
s AS MATERIALIZED (
  SELECT CAST(COUNT(*) FILTER (WHERE jaccard >= 0.5) AS BIGINT) AS n_true,
         {", ".join(sums)}
  FROM pairs)
{" UNION ALL ".join(branches)}
"""


@register("lsh_band_tuning", _sql_lsh_band_tuning())
def q_lsh_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH (bands x rows) tuning curve — the configuration artifact
    behind minhash_lsh_dedup's (4, 4) choice, computed in-engine from
    ONE pass over the exact pair output (extension op; the band-tuning
    sibling of dedup_threshold_sensitivity). For every factorization of
    the 16-hash budget: the analytic S-curve threshold (1/b)^(1/r), the
    EXPECTED candidate-pair volume SUM(P(candidate|j)) — what each
    config would make the bucket-join shuffle carry — and expected
    recall against the jaccard >= 0.5 truth set. Probabilities are
    unrolled-multiplication IEEE expressions (no engine-divergent POW)
    summed as fixed-point integers, so the curve is bit-identical
    cross-engine and independent of partitioning — the property that
    lets a 100-TB operator trust a sampled tuning run. At scale this
    costs one conditional aggregate over pairs the dedup already
    produced; picking bands too low starves recall, too high explodes
    the candidate shuffle — this query IS that tradeoff, quantified.
    Reads the once-per-corpus materialized pair artifact (VERDICT r8
    #2), exactly as the 100-TB tuning run would scan the dedup's
    written pair table."""
    from de_project_sprint_etl_spark.plans import llm

    pairs = llm.ngram_pairs(spark, sf_dir).select("jaccard")
    aggs = [
        F.sum((F.col("jaccard") >= 0.5).cast("long")).alias("n_true_raw")
    ]
    for i, (b, r) in enumerate(LSH_TUNE_CONFIGS):
        sp = F.expr(_scurve_scaled_sql(b, r))
        aggs.append(F.sum(sp).alias(f"ec_{i}"))
        aggs.append(
            F.sum(F.when(F.col("jaccard") >= 0.5, sp).otherwise(F.lit(0))).alias(
                f"eh_{i}"
            )
        )
    row = pairs.agg(*aggs).select(
        F.coalesce(F.col("n_true_raw"), F.lit(0)).cast("long").alias("n_true"),
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for i in range(len(LSH_TUNE_CONFIGS))
            for c in (f"ec_{i}", f"eh_{i}")
        ],
    )
    structs = []
    for i, (b, r) in enumerate(LSH_TUNE_CONFIGS):
        est_t = round((1.0 / b) ** (1.0 / r), 6)
        structs.append(
            F.struct(
                F.lit(b).cast("long").alias("bands"),
                F.lit(r).cast("long").alias("rows_per_band"),
                F.lit(est_t).alias("est_threshold"),
                F.round(F.col(f"ec_{i}") / F.lit(float(SCURVE_SCALE)), 6).alias(
                    "exp_candidates"
                ),
                F.col("n_true"),
                F.round(
                    F.col(f"eh_{i}").cast("double")
                    / (F.lit(float(SCURVE_SCALE)) * F.greatest(F.col("n_true"), F.lit(1))),
                    6,
                ).alias("exp_recall_at_05"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


# --- empirical LSH S-curve (round 9) -------------------------------------------


def _sql_lsh_empirical_scurve() -> str:
    return f"""
WITH tru AS (SELECT id_a, id_b,
                    (10 * shared) // (n_a + n_b - shared) AS bucket
             FROM ({_NG_PAIRS}) g),
cand AS (SELECT id_a, id_b FROM ({_MH_PAIRS}) m),
j AS (SELECT t.bucket,
             CASE WHEN c.id_a IS NULL THEN 0 ELSE 1 END AS hit
      FROM tru t
      LEFT JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(hit) AS BIGINT) AS n_candidates,
       ROUND(CAST(SUM(hit) AS DOUBLE) / COUNT(*), 6) AS recall
FROM j GROUP BY bucket
"""


@register("lsh_empirical_scurve", _sql_lsh_empirical_scurve())
def q_lsh_empirical_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED LSH S-curve: per exact-Jaccard decile, the fraction of
    true near-dup pairs the banded MinHash index actually surfaced —
    the empirical companion to ``lsh_band_tuning``'s analytic curve
    (the analytic curve says what (bands, rows) SHOULD recall; this
    query says what the shipped (4, 4) config DID recall, bucket by
    bucket). The gap between the two is the sketch's calibration error,
    the number that decides whether 16 hashes are enough before scaling
    the pipeline 1000x.

    Composes the two once-per-corpus MATERIALIZED pair artifacts
    (VERDICT r8 #2): one pair-keyed left join of two artifact-sized
    tables, one bounded groupBy — nothing rescans the corpus. The
    decile comes from the EXACT INTEGER pair stats the artifact
    carries — (10 * shared) DIV union — never from the float jaccard:
    FLOOR(0.7 * 10) is 6 in IEEE (0.7 is below 0.7 in binary), so a
    float bucket would file exact-decade pairs one decile low in both
    engines; the integer DIV puts every edge pair where a human reads
    it."""
    from de_project_sprint_etl_spark.plans.llm import minhash_pairs, ngram_pairs

    tru = ngram_pairs(spark, sf_dir).select(
        "id_a",
        "id_b",
        F.expr("CAST((10 * shared) DIV (n_a + n_b - shared) AS INT)").alias(
            "bucket"
        ),
    )
    cand = minhash_pairs(spark, sf_dir).select(
        "id_a", "id_b", F.lit(1).alias("hit")
    )
    j = tru.join(cand, ["id_a", "id_b"], "left").select(
        "bucket", F.coalesce(F.col("hit"), F.lit(0)).alias("hit")
    )
    return j.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("hit").cast("long").alias("n_candidates"),
        F.round(
            F.sum("hit").cast("double") / F.count(F.lit(1)), 6
        ).alias("recall"),
    )


# --- shingle posting-list skew audit (round 9) ----------------------------------


def _sql_shingle_df_histogram() -> str:
    from de_project_sprint_etl_spark.plans.llm import _SH3, SQL_DOCS_MUT, _MAX_SHINGLE_DF

    return f"""
WITH sh AS (
  SELECT id, shingle FROM (
    SELECT id, UNNEST(sh_arr) AS shingle FROM (
      SELECT doc_id AS id, {_SH3} AS sh_arr FROM ({SQL_DOCS_MUT}) d) s0
  ) s WHERE LENGTH(shingle) > 0
),
df AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
       FROM sh GROUP BY shingle)
SELECT CAST(LENGTH(bin(df)) - 1 AS INT) AS log2_df_bucket,
       df > {_MAX_SHINGLE_DF} AS pruned,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(df) AS BIGINT) AS n_postings,
       CAST(SUM(df * df) AS BIGINT) AS candidate_mass
FROM df GROUP BY log2_df_bucket, pruned
"""


@register("shingle_df_histogram", _sql_shingle_df_histogram())
def q_shingle_df_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list skew audit for the shingle index: shingle count,
    posting volume and CANDIDATE MASS (sum of df^2 — the pair volume a
    posting-list self-join would emit) per log2(df) bucket, split by
    whether the hot-shingle cutoff prunes the bucket. This is the
    artifact behind ``max_shingle_df``'s value: the exact-dedup join is
    quadratic in per-shingle df, so one hot stopword-shingle bucket can
    carry more join work than the rest of the index combined — at
    100 TB this histogram is the difference between a bounded
    bucket-join and an executor-OOM skew story. Reads the materialized
    shingle stage; the bucket is the INTEGER bit length of df (LENGTH
    of the binary string both engines produce), never a float log2
    whose last-ulp could flip a bucket edge cross-engine."""
    from de_project_sprint_etl_spark.plans.llm import _MAX_SHINGLE_DF, mutant_shingles

    df = (
        mutant_shingles(spark, sf_dir, n=3)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    return (
        df.select(
            (F.length(F.bin(F.col("df"))) - 1).cast("int").alias(
                "log2_df_bucket"
            ),
            (F.col("df") > _MAX_SHINGLE_DF).alias("pruned"),
            "df",
        )
        .groupBy("log2_df_bucket", "pruned")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum("df").cast("long").alias("n_postings"),
            F.sum(F.col("df") * F.col("df"))
            .cast("long")
            .alias("candidate_mass"),
        )
    )


def _sql_source_dup_rate() -> str:
    from de_project_sprint_etl_spark.plans.llm import MUT_OFFSET

    return f"""
WITH {_SQL_CDC_TOK.format(CORPUS=SQL_DOCS_MUT)},
fp AS (SELECT doc_id, {sql_h64('ctext')} AS chunk_fp FROM ct),
dupfp AS (SELECT chunk_fp FROM fp GROUP BY chunk_fp
          HAVING COUNT(DISTINCT doc_id) > 1),
mem AS (SELECT DISTINCT doc_id FROM fp JOIN dupfp USING (chunk_fp)),
corpus AS (SELECT doc_id,
                  CASE WHEN doc_id >= {MUT_OFFSET} THEN doc_id - {MUT_OFFSET}
                       ELSE doc_id END AS base_id
           FROM ({SQL_DOCS_MUT}) c),
lab AS (SELECT corpus.doc_id, d.source,
               CASE WHEN mem.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup
        FROM corpus JOIN documents d ON d.doc_id = corpus.base_id
        LEFT JOIN mem ON mem.doc_id = corpus.doc_id)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
       ROUND(CAST(SUM(is_dup) AS DOUBLE) / COUNT(*), 6) AS dup_rate
FROM lab GROUP BY source
"""


def q_source_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication scorecard: the share of each feed's docs
    that own at least one CDC chunk duplicated in another doc — the
    report that decides which ingest feeds to throttle or drop before
    paying full-corpus dedup on them. Composes the shared CDC chunk
    stream; mutant docs inherit their base doc's source (base_id = id
    mod the mutant offset), so the planted mutants concentrate the dup
    rate exactly where the corpus builder put them. Scale shape: dup
    membership is a fingerprint-keyed semi-join (artifact-sized
    output), the source map is a broadcast-sized dim join, and the
    scorecard is one |sources|-row aggregate."""
    from de_project_sprint_etl_spark.plans.llm import MUT_OFFSET, docs_with_mutants

    fps = _cdc_chunk_fps(spark, sf_dir).select("doc_id", "chunk_fp")
    dupfp = (
        fps.groupBy("chunk_fp")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("chunk_fp")
    )
    mem = (
        fps.join(dupfp, "chunk_fp", "left_semi").select("doc_id").distinct()
    )
    corpus = docs_with_mutants(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") >= MUT_OFFSET, F.col("doc_id") - MUT_OFFSET
        )
        .otherwise(F.col("doc_id"))
        .alias("base_id"),
    )
    src = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("base_id"), "source"
    )
    lab = corpus.join(F.broadcast(src), "base_id").join(
        mem.withColumn("is_dup", F.lit(1)), "doc_id", "left"
    )
    return lab.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).alias("n_dup_docs"),
        F.round(
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("dup_rate"),
    )


def _sql_decontaminate() -> str:
    from de_project_sprint_etl_spark.plans.llm import (
        BENCH_MOD,
        MUT_OFFSET,
        _SH3,
    )
    from de_project_sprint_etl_spark.functions import text as _t

    return f"""
WITH d AS ({SQL_DOCS_MUT}),
tr AS (
  SELECT id, shingle FROM (
    SELECT id, UNNEST(sh_arr) AS shingle FROM (
      SELECT doc_id AS id, {_SH3} AS sh_arr FROM d) s0
  ) s WHERE LENGTH(shingle) > 0
    AND NOT (id < {MUT_OFFSET} AND id % {BENCH_MOD} = 0)
),
b AS (
  SELECT DISTINCT shingle FROM (
    SELECT UNNEST({_t.sql_shingles('d.text', n=3)}) AS shingle
    FROM documents d WHERE doc_id % {BENCH_MOD} = 0) x
  WHERE LENGTH(shingle) > 0
),
drop_ids AS (SELECT DISTINCT id FROM tr JOIN b USING (shingle))
SELECT doc_id FROM d
WHERE NOT (doc_id < {MUT_OFFSET} AND doc_id % {BENCH_MOD} = 0)
  AND NOT EXISTS (SELECT 1 FROM drop_ids x WHERE x.id = d.doc_id)
"""


def q_decontaminate_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL twin of ``contamination_check``: the surviving
    training corpus after dropping every train doc sharing ANY trigram
    shingle with the held-out benchmark set — what a pipeline actually
    executes before training, not just the report. Bench shingles are
    broadcast (the small side — correct asymmetry at any scale); the
    contaminated-id set is size-gated before the anti join
    (``guards.gated_broadcast``) because a heavily-leaked corpus makes
    it corpus-scale. Short docs with no shingles survive by definition
    on both engines."""
    from de_project_sprint_etl_spark.functions import dedup as _dd
    from de_project_sprint_etl_spark.functions import guards
    from de_project_sprint_etl_spark.plans.llm import (
        BENCH_MOD,
        MUT_OFFSET,
        docs_with_mutants,
        mutant_shingles,
    )

    sh = mutant_shingles(spark, sf_dir)
    train_sh = sh.filter(
        ~((F.col("id") < MUT_OFFSET) & (F.col("id") % BENCH_MOD == 0))
    )
    bench_docs = t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % BENCH_MOD == 0
    )
    bench_sh = _dd._exploded_shingles(bench_docs, "text", "doc_id", 3).select(
        "shingle"
    ).distinct()
    drop = (
        train_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select(F.col("id").alias("doc_id"))
        .distinct()
    )
    train_docs = docs_with_mutants(spark, sf_dir).filter(
        ~((F.col("doc_id") < MUT_OFFSET) & (F.col("doc_id") % BENCH_MOD == 0))
    )
    return train_docs.join(
        guards.gated_broadcast(drop, "decontaminate_train drop set"),
        "doc_id",
        "left_anti",
    ).select("doc_id")


register("decontaminate_train", _sql_decontaminate())(q_decontaminate_train)


register("source_dup_rate", _sql_source_dup_rate())(q_source_dup_rate)


# --- cross-source duplication matrix (round 8) ---------------------------------


def _sql_source_cross_dup() -> str:
    from de_project_sprint_etl_spark.plans.llm import MUT_OFFSET

    base = "CASE WHEN {c} >= %d THEN {c} - %d ELSE {c} END" % (
        MUT_OFFSET,
        MUT_OFFSET,
    )
    return f"""
SELECT LEAST(s1.source, s2.source) AS source_a,
       GREATEST(s1.source, s2.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM ({_MH_PAIRS}) m
JOIN documents s1 ON s1.doc_id = {base.format(c='m.id_a')}
JOIN documents s2 ON s2.doc_id = {base.format(c='m.id_b')}
GROUP BY source_a, source_b
"""


@register("source_cross_dup_matrix", _sql_source_cross_dup())
def q_source_cross_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplication matrix: MinHash+LSH pair counts by
    (source, source), canonically ordered — the syndication report that
    tells a curation run WHICH feeds re-publish each other (the
    per-source scorecard source_dup_rate says how much each feed
    duplicates, not against whom). Composes the registered LSH pair
    pipeline; mutants inherit their base doc's source via the shared
    offset mapping (loud-guarded in the corpus builder). Scale shape:
    the pair table is artifact-sized, each label lookup is one
    doc_id-keyed join, and the matrix aggregate is bounded by
    |sources|^2 — nothing grows with the corpus beyond the dedup the
    pipeline already paid for."""
    from de_project_sprint_etl_spark.plans.llm import MUT_OFFSET, minhash_pairs

    pairs = minhash_pairs(spark, sf_dir).select("id_a", "id_b")

    def base(c: str) -> F.Column:
        return F.when(
            F.col(c) >= MUT_OFFSET, F.col(c) - MUT_OFFSET
        ).otherwise(F.col(c))

    src = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("base_id"), "source"
    )
    lab = (
        pairs.select(base("id_a").alias("ba"), base("id_b").alias("bb"))
        .join(src.select(F.col("base_id").alias("ba"), F.col("source").alias("sa")), "ba")
        .join(src.select(F.col("base_id").alias("bb"), F.col("source").alias("sb")), "bb")
    )
    return lab.groupBy(
        F.least("sa", "sb").alias("source_a"),
        F.greatest("sa", "sb").alias("source_b"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))


# --- embedding outlier detection ----------------------------------------------

OUTLIER_TOPK = 50
#: fixed-point scale for the centroid math: embeddings carry ~6
#: significant decimals, and 1e6-scaled BIGINTs keep every sum exact
#: (|x| <= ~2 => scaled |xi| <= 2e6; corpus sums and xi*n - S both stay
#: far under 2^53, so the one double cast per diff term is exact)
OUTLIER_SCALE = 1_000_000


def _sql_embedding_outliers() -> str:
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (SELECT vec_id,
             list_transform(v, a -> CAST(FLOOR(a * {OUTLIER_SCALE} + 0.5)
                                         AS BIGINT)) AS xi
      FROM e),
ex AS (SELECT vec_id, CAST(u.i AS INT) AS pos, xi[CAST(u.i AS INT)] AS val
       FROM x, UNNEST(generate_series(1, len(xi))) AS u(i)),
cent AS (SELECT pos, CAST(SUM(val) AS BIGINT) AS s FROM ex GROUP BY pos),
n AS (SELECT COUNT(*) AS n FROM x),
diff AS (SELECT ex.vec_id, ex.pos,
                CAST(ex.val * n.n - cent.s AS DOUBLE) AS d
         FROM ex JOIN cent USING (pos) CROSS JOIN n),
dl AS (SELECT vec_id, LIST(d ORDER BY pos) AS dv FROM diff GROUP BY vec_id)
SELECT vec_id,
       ROUND(SQRT(list_dot_product(dv, dv))
             / ((SELECT n FROM n) * {OUTLIER_SCALE}.0), 6) + 0.0
         AS center_dist
FROM dl
ORDER BY center_dist DESC, vec_id
LIMIT {OUTLIER_TOPK}
"""


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier detection: the OUTLIER_TOPK vectors farthest
    from the corpus centroid — the pre-clustering noise prune (mislabeled
    scrapes, encoder failures, empty-input embeddings) run before
    SemDeDup/IVF trust the geometry. INTEGER-STABLE cross-engine: values
    quantize to 1e6-scaled BIGINTs, the centroid is kept as the EXACT
    integer pair (per-dim sum S_i, count n), and each squared term folds
    from the exact integer xi*n - S_i — no double accumulation order
    anywhere until the final fixed-order 64-term fold both engines share
    (the established cosine-parity pattern). Scale shape: one narrow
    corpus pass for the (64-row) centroid aggregate broadcast back, one
    map-only distance pass, and a TakeOrdered top-k — no global sort, no
    corpus-wide window."""
    emb = fan_out(spark, t(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    xi = F.transform(
        F.col("embedding"),
        lambda a: F.floor(a.cast("double") * OUTLIER_SCALE + 0.5).cast("long"),
    )
    x = emb.select("vec_id", xi.alias("xi"))
    ex = x.select("vec_id", F.posexplode("xi").alias("pos", "val"))
    cent = (
        ex.groupBy("pos")
        .agg(F.sum("val").cast("long").alias("s"))
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda r: r["s"],
            ).alias("sv")
        )
    )
    n1 = x.groupBy().agg(F.count(F.lit(1)).alias("n"))
    scored = (
        x.crossJoin(F.broadcast(cent))
        .crossJoin(F.broadcast(n1))
        .select(
            "vec_id",
            (
                F.round(
                    F.sqrt(
                        F.aggregate(
                            F.zip_with(
                                F.col("xi"),
                                F.col("sv"),
                                lambda a, s: (
                                    (a * F.col("n") - s).cast("double")
                                    * (a * F.col("n") - s).cast("double")
                                ),
                            ),
                            F.lit(0.0),
                            lambda acc, v: acc + v,
                        )
                    )
                    / (F.col("n").cast("double") * F.lit(float(OUTLIER_SCALE))),
                    6,
                )
                + F.lit(0.0)
            ).alias("center_dist"),
        )
    )
    return scored.orderBy(
        F.col("center_dist").desc(), F.col("vec_id").asc()
    ).limit(OUTLIER_TOPK)


register("embedding_outliers", _sql_embedding_outliers())(q_embedding_outliers)


# --- quality-weighted mixture / epochs planning ----------------------------------

EPOCH_BUDGET_MULT = 3.0  # token budget = 3x the corpus, the repeat-data regime


def _sql_mixture_epochs() -> str:
    from de_project_sprint_etl_spark.plans.llm import _sql_text_quality

    return f"""
WITH q AS ({_sql_text_quality("documents")}),
j AS (SELECT d.source, q.n_bpe_tokens,
             CAST(q.quality_score AS DECIMAL(18,6)) AS qd
      FROM q JOIN documents d USING (doc_id)),
per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_bpe_tokens) AS BIGINT) AS avail_tokens,
               SUM(qd) AS qmass
        FROM j GROUP BY source),
tot AS (SELECT SUM(qmass) AS tq, CAST(SUM(avail_tokens) AS BIGINT) AS tt
        FROM per),
rates AS (SELECT source, n_docs, avail_tokens,
                 CAST(qmass AS DOUBLE) / CAST(tq AS DOUBLE) AS share,
                 CAST(FLOOR((CAST(qmass AS DOUBLE) / CAST(tq AS DOUBLE))
                            * ({EPOCH_BUDGET_MULT} * CAST(tt AS DOUBLE)))
                      AS BIGINT) AS target_tokens
          FROM per CROSS JOIN tot)
SELECT source, n_docs, avail_tokens,
       ROUND(share, 6) AS target_share,
       target_tokens,
       ROUND(CAST(target_tokens AS DOUBLE) / CAST(avail_tokens AS DOUBLE), 6)
         AS epochs
FROM rates
"""


@register("mixture_epochs_plan", _sql_mixture_epochs())
def q_mixture_epochs_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted data-mixture planner: allocate a fixed token
    budget (3x the corpus — the repeat-data regime every
    under-trained-corpus run lives in) across sources in proportion to
    each source's QUALITY MASS (sum of per-doc quality scores), and
    report the implied per-source epoch count — epochs > 1 means that
    source repeats, the number a pretraining run commits to before it
    starts. This is the planning artifact for the mixture gate the
    sampler (mixture_sample_temperature) then applies.

    Determinism: quality scores are 6-decimal, summed as
    DECIMAL(18,6) (order-free), so the share doubles are bit-identical;
    token counts are exact integers; the only floats are the share and
    epoch divisions, mirrored expression-for-expression. Scale shape:
    one map-side projection for the stats, one partial-combined groupBy
    to |sources| rows, one 1-row total broadcast — the corpus itself
    never shuffles."""
    from de_project_sprint_etl_spark.plans.llm import doc_stats

    # the attributes table (doc_stats artifact): quality mass planning
    # reads the scored table, never re-scores the corpus
    q = doc_stats(spark, sf_dir).select(
        "doc_id",
        "n_bpe_tokens",
        F.col("quality_score").cast("decimal(18,6)").alias("qd"),
    )
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    per = (
        q.join(d, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bpe_tokens").cast("bigint").alias("avail_tokens"),
            F.sum("qd").alias("qmass"),
        )
    )
    tot = per.agg(
        F.sum("qmass").alias("tq"),
        F.sum("avail_tokens").cast("bigint").alias("tt"),
    )
    # a zero total quality mass or a zero-token source would emit
    # NaN/Infinity PLAN rows — poison for the artifact a pretraining
    # launch reads. Fail loudly at execution instead (ADVICE r8); the
    # guard is plan-side and value-neutral on any real corpus.
    tq_ok = F.when(
        F.col("tq") > 0, F.col("tq").cast("double")
    ).otherwise(
        F.raise_error(
            F.lit("mixture_epochs_plan: total quality mass is zero — "
                  "degenerate corpus, no mixture is derivable")
        )
    )
    av_ok = F.when(
        F.col("avail_tokens") > 0, F.col("avail_tokens").cast("double")
    ).otherwise(
        F.raise_error(
            F.lit("mixture_epochs_plan: a source has zero available "
                  "tokens — drop empty sources before planning")
        )
    )
    share = F.col("qmass").cast("double") / tq_ok
    target = F.floor(
        share * (F.lit(EPOCH_BUDGET_MULT) * F.col("tt").cast("double"))
    ).cast("bigint")
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "avail_tokens",
        F.round(share, 6).alias("target_share"),
        target.alias("target_tokens"),
        F.round(target.cast("double") / av_ok, 6).alias("epochs"),
    )


# --- near-dup cluster quality report ----------------------------------------------


def _sql_dup_cluster_quality() -> str:
    from de_project_sprint_etl_spark.plans.llm import (
        _sql_minhash_lsh,
        _sql_text_quality,
    )

    quality = _sql_text_quality(f"({SQL_DOCS_MUT}) dm")
    return f"""
WITH RECURSIVE mh AS ({_sql_minhash_lsh()}),
edges AS (SELECT id_a AS s, id_b AS d FROM mh
          UNION SELECT id_b, id_a FROM mh),
reach(id, label) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.id
),
lab AS (SELECT id, MIN(label) AS group_id FROM reach GROUP BY id),
q AS ({quality}),
m AS (SELECT l.group_id, CAST(q.quality_score AS DECIMAL(18,6)) AS qd
      FROM lab l JOIN q ON q.doc_id = l.id),
pg AS (SELECT group_id, CAST(COUNT(*) AS BIGINT) AS n,
              MAX(qd) AS mx, MIN(qd) AS mn, SUM(qd) AS s
       FROM m GROUP BY group_id)
SELECT n AS group_size, CAST(COUNT(*) AS BIGINT) AS n_groups,
       ROUND(CAST(SUM(mx) AS DOUBLE) / COUNT(*), 6) AS avg_best_quality,
       ROUND(CAST(SUM(mx - mn) AS DOUBLE) / COUNT(*), 6) AS avg_quality_spread,
       ROUND(CAST(SUM(mx * n - s) AS DOUBLE) / CAST(SUM(n - 1) AS DOUBLE), 6)
         AS avg_dropped_loss
FROM pg GROUP BY n
"""


@register("dup_cluster_quality_report", _sql_dup_cluster_quality())
def q_dup_cluster_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What near-dup dedup actually costs, by cluster size: for every
    MinHash+LSH connected component, the quality of the member a
    keep-best pass would survive (max), the in-cluster quality spread
    (max - min), and the mean quality gap of the DROPPED members vs the
    keeper — aggregated per group size. A fat high-spread tail says
    clusters mix good and bad variants (keep-best matters); near-zero
    spread says exact-ish re-posts (any member is fine, use the cheaper
    min-id keep). Composes the verified pair -> connected-components
    pipeline and the Gopher-style quality projection.

    Determinism: quality is 6-decimal, all per-group reductions run as
    DECIMAL(18,6) (max/min/sum are order-free; the dropped-loss
    numerator mx*n - s stays exact decimal), one double division per
    output cell. Scale shape: the group table holds dup members only;
    both aggregates are partial-combined; nothing windows or sorts
    globally."""
    from de_project_sprint_etl_spark.plans.llm import minhash_pairs, mutant_stats

    pairs = minhash_pairs(spark, sf_dir)
    groups = dedup.dup_groups(pairs, simple_pairs=True).select("id", "group_id")
    q = mutant_stats(spark, sf_dir).select(
        F.col("doc_id"),
        F.col("quality_score").cast("decimal(18,6)").alias("qd"),
    )
    m = groups.join(q, groups["id"] == q["doc_id"]).select("group_id", "qd")
    pg = m.groupBy("group_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("qd").alias("mx"),
        F.min("qd").alias("mn"),
        F.sum("qd").alias("s"),
    )
    return pg.groupBy(F.col("n").alias("group_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.round(F.sum("mx").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_best_quality"
        ),
        F.round(
            F.sum(F.col("mx") - F.col("mn")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_quality_spread"),
        F.round(
            F.sum(F.col("mx") * F.col("n") - F.col("s")).cast("double")
            / F.sum(F.col("n") - 1).cast("double"),
            6,
        ).alias("avg_dropped_loss"),
    )


# --- dataset card ------------------------------------------------------------------


def _sql_dataset_card() -> str:
    from de_project_sprint_etl_spark.plans.llm import _sql_text_quality

    norm = SQL_NORM.format(c="text")
    return f"""
WITH q AS ({_sql_text_quality("documents")}),
base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                SUM(CAST(quality_score AS DECIMAL(18,6))) AS qsum
         FROM q),
fp AS (SELECT CAST(COUNT(DISTINCT md5({norm})) AS BIGINT) AS n_uniq
       FROM documents),
langs AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM documents GROUP BY lang),
nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_langs FROM langs),
top AS (SELECT lang AS top_lang, cnt AS top_cnt
        FROM langs ORDER BY cnt DESC, lang LIMIT 1)
SELECT n_docs, n_tokens,
       ROUND(CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
         AS mean_tokens_per_doc,
       ROUND(CAST(qsum AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS mean_quality,
       n_langs, top_lang,
       ROUND(CAST(top_cnt AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
         AS top_lang_share,
       ROUND(1.0 - CAST(n_uniq AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
         AS exact_dup_rate
FROM base CROSS JOIN fp CROSS JOIN nl CROSS JOIN top
"""


@register("dataset_card_stats", _sql_dataset_card())
def q_dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card, computed in-engine: the one-row corpus summary
    a training run publishes next to its data — doc and token volume,
    mean tokens/doc, mean quality score, language census (count, top
    language and its share, deterministic lowest-lang tiebreak), and
    the exact-duplicate rate from the canonical normalized fingerprint.
    Composes four already-verified projections; every input to a float
    division is an exact integer or an order-free DECIMAL sum.

    Scale shape: three independent partial-combined aggregates (stats,
    fingerprint distinct, language census) + a LIMIT 1 on the
    |langs|-row census; all joined as 1-row broadcasts. The distinct
    fingerprint count is the only shuffle whose width scales with the
    corpus — the same hash-groupBy the exact-dedup pass itself pays."""
    from de_project_sprint_etl_spark.functions import text as _tx
    from de_project_sprint_etl_spark.plans.llm import doc_stats, docs_fanned

    docs = docs_fanned(spark, sf_dir)
    # volume/quality block reads the attributes artifact; only the
    # exact-dup fingerprint still needs the raw text stream
    stats = doc_stats(spark, sf_dir)
    base = stats.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum(F.col("quality_score").cast("decimal(18,6)")).alias("qsum"),
    )
    fp = docs.select(
        F.md5(_tx.norm_text(F.col("text"))).alias("h")
    ).agg(F.count_distinct("h").cast("bigint").alias("n_uniq"))
    langs = (
        t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    nl = langs.agg(F.count(F.lit(1)).cast("bigint").alias("n_langs"))
    top = (
        langs.orderBy(F.col("cnt").desc(), F.col("lang").asc())
        .limit(1)
        .select(F.col("lang").alias("top_lang"), F.col("cnt").alias("top_cnt"))
    )
    nd = F.col("n_docs").cast("double")
    return (
        base.crossJoin(F.broadcast(fp))
        .crossJoin(F.broadcast(nl))
        .crossJoin(F.broadcast(top))
        .select(
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens").cast("double") / nd, 6).alias(
                "mean_tokens_per_doc"
            ),
            F.round(F.col("qsum").cast("double") / nd, 6).alias("mean_quality"),
            "n_langs",
            "top_lang",
            F.round(F.col("top_cnt").cast("double") / nd, 6).alias(
                "top_lang_share"
            ),
            F.round(
                F.lit(1.0) - F.col("n_uniq").cast("double") / nd, 6
            ).alias("exact_dup_rate"),
        )
    )


# --- dedup blocking-key evaluation --------------------------------------------------


def _sql_blocking_eval() -> str:
    from de_project_sprint_etl_spark.plans.llm import MUT_OFFSET

    norm = SQL_NORM.format(c="text")
    toks = f"STRING_SPLIT({norm}, ' ')"
    rows = []
    for key in ("len64", "tok8", "first_tok"):
        rows.append(f"""
SELECT '{key}' AS blocking_key, n_blocks, cand AS candidate_pairs,
       ROUND(1.0 - CAST(cand AS DOUBLE) / CAST(total AS DOUBLE), 6)
         AS reduction_ratio,
       n_truth,
       ROUND(CAST(co_{key} AS DOUBLE) / CAST(n_truth AS DOUBLE), 6)
         AS pair_completeness
FROM c_{key} CROSS JOIN truth CROSS JOIN tot""")
    body = "\nUNION ALL\n".join(rows)
    block_ctes = ",\n".join(
        f"""b_{key} AS (SELECT {col} AS k, CAST(COUNT(*) AS BIGINT) AS nb
       FROM feat GROUP BY 1),
c_{key} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
                   CAST(SUM(nb * (nb - 1) // 2) AS BIGINT) AS cand
            FROM b_{key})"""
        for key, col in (
            ("len64", "k_len64"),
            ("tok8", "k_tok8"),
            ("first_tok", "k_first"),
        )
    )
    return f"""
WITH d AS ({SQL_DOCS_MUT}),
feat AS (
  SELECT doc_id,
         CAST(LENGTH(text) // 64 AS BIGINT) AS k_len64,
         CAST(len({toks}) // 8 AS BIGINT) AS k_tok8,
         ({toks})[1] AS k_first
  FROM d),
tot AS (SELECT CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS total
        FROM feat),
truth AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
         CAST(SUM(CASE WHEN fb.k_len64 = fm.k_len64 THEN 1 ELSE 0 END)
              AS BIGINT) AS co_len64,
         CAST(SUM(CASE WHEN fb.k_tok8 = fm.k_tok8 THEN 1 ELSE 0 END)
              AS BIGINT) AS co_tok8,
         CAST(SUM(CASE WHEN fb.k_first = fm.k_first THEN 1 ELSE 0 END)
              AS BIGINT) AS co_first_tok
  FROM feat fb JOIN feat fm ON fm.doc_id = fb.doc_id + {MUT_OFFSET}),
{block_ctes}
{body}
"""


@register("dedup_blocking_eval", _sql_blocking_eval())
def q_dedup_blocking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage blocking-key evaluation — the artifact that
    decides what a 100-TB dedup pass SHARDS on before it runs: for each
    candidate blocking key (64-char length bucket, 8-token count
    bucket, first normalized token), the reduction ratio (1 -
    candidate-pairs / all-pairs — how much of the quadratic space the
    key prunes) and the pair completeness against the known mutant
    truth pairs (how many real duplicates the key keeps co-located —
    a mutant drops its first two tokens, so first-token blocking
    SHOULD score near zero while length-bucket blocking survives only
    when the edit stays inside one bucket; surfacing that trade IS the
    eval). Same family as lsh_band_tuning / ivf_nprobe_recall_curve:
    price the configuration in-engine before committing the big run.

    Scale shape: one map-side feature projection, one groupBy per key
    (block census, integer pair counts — the candidate space is
    COUNTED, never materialized), and a truth equi-join on the shifted
    id; every metric is exact integers until one final division."""
    from de_project_sprint_etl_spark.functions import text as _tx
    from de_project_sprint_etl_spark.plans.llm import MUT_OFFSET

    d = docs_with_mutants(spark, sf_dir)
    toks = _tx.tokens(F.col("text"))
    # this narrow frame feeds five branches (three block censuses + both
    # sides of the truth join), so the tokenize projection re-executes
    # per branch — map-side narrow, no shuffle, and measured CHEAPER
    # than an eager checkpoint at bench scale (2.1 s vs 3.9 s: the
    # materialization barrier costs more than 600-doc re-tokenization).
    # At 100 TB the right move is joining the once-per-corpus
    # materialized derived streams (the mutant_shingles pattern), not a
    # per-query checkpoint.
    feat = d.select(
        "doc_id",
        F.expr("CAST(length(text) DIV 64 AS BIGINT)").alias("k_len64"),
        F.floor(F.size(toks) / 8).cast("bigint").alias("k_tok8"),
        F.element_at(toks, 1).alias("k_first"),
    )
    # integer DIV, never floor(double/2): a block of 1e9 rows puts
    # nb*(nb-1) past 2^53 where double division drops low bits
    tot = feat.agg(F.count(F.lit(1)).alias("__n")).select(
        F.expr("CAST(__n * (__n - 1) DIV 2 AS BIGINT)").alias("total")
    )
    fb = feat.alias("fb")
    fm = feat.alias("fm")
    truth = (
        fb.join(
            fm,
            F.col("fm.doc_id") == F.col("fb.doc_id") + MUT_OFFSET,
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_truth"),
            *[
                F.sum(
                    (F.col(f"fb.{c}") == F.col(f"fm.{c}")).cast("long")
                )
                .cast("bigint")
                .alias(f"co_{k}")
                for k, c in (
                    ("len64", "k_len64"),
                    ("tok8", "k_tok8"),
                    ("first_tok", "k_first"),
                )
            ],
        )
    )

    def one_key(key: str, col: str) -> DataFrame:
        blocks = feat.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("nb")
        )
        census = blocks.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.sum(F.expr("nb * (nb - 1) DIV 2"))
            .cast("bigint")
            .alias("cand"),
        )
        return (
            census.crossJoin(F.broadcast(truth))
            .crossJoin(F.broadcast(tot))
            .select(
                F.lit(key).alias("blocking_key"),
                "n_blocks",
                F.col("cand").alias("candidate_pairs"),
                F.round(
                    F.lit(1.0)
                    - F.col("cand").cast("double") / F.col("total").cast("double"),
                    6,
                ).alias("reduction_ratio"),
                "n_truth",
                F.round(
                    F.col(f"co_{key}").cast("double")
                    / F.col("n_truth").cast("double"),
                    6,
                ).alias("pair_completeness"),
            )
        )

    return (
        one_key("len64", "k_len64")
        .unionByName(one_key("tok8", "k_tok8"))
        .unionByName(one_key("first_tok", "k_first"))
    )


# --- n-gram novelty curve ------------------------------------------------------------

NOVELTY_BUCKETS = 10


def _sql_novelty() -> str:
    from de_project_sprint_etl_spark.functions.text import sql_shingles

    sh3 = sql_shingles("text", n=3)
    return f"""
WITH sh AS (SELECT doc_id, UNNEST({sh3}) AS shingle FROM documents),
shf AS (SELECT doc_id, shingle FROM sh WHERE LENGTH(shingle) > 0),
first AS (SELECT shingle, MIN(doc_id) AS first_doc FROM shf GROUP BY shingle),
cnts AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
         FROM shf GROUP BY doc_id),
news AS (SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_new
         FROM first GROUP BY first_doc),
per_doc AS (
  SELECT c.doc_id, c.n_shingles,
         CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new
  FROM cnts c LEFT JOIN news n USING (doc_id)),
rng AS (SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM per_doc)
SELECT CAST((doc_id - mn) // (((mx - mn) // {NOVELTY_BUCKETS}) + 1) AS INT)
         AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_shingles) AS BIGINT) AS n_shingles,
       CAST(SUM(n_new) AS BIGINT) AS n_new,
       ROUND(CAST(SUM(n_new) AS DOUBLE) / CAST(SUM(n_shingles) AS DOUBLE), 6)
         AS novelty_rate
FROM per_doc CROSS JOIN rng
GROUP BY 1
"""


@register("ngram_novelty_curve", _sql_novelty())
def q_ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal-data-value curve: for each tranche of the corpus (10
    equal-width doc_id buckets, doc_id = ingestion order), what
    fraction of its distinct trigram shingles had never appeared in any
    earlier document. Early tranches score near 1, and the decay rate
    says how fast NEW data stops adding new n-grams — the per-tranche
    complement of the corpus-level vocab_growth_curve, and the signal
    behind the Heaps-law saturation router (dedup_strategy_select).

    First-occurrence attribution is one shingle-keyed groupBy
    (min doc_id) — the SAME shuffle key the shingle-dedup tier already
    pays — followed by a per-doc aggregate and a 10-row rollup; the
    novelty rate is pooled from exact integer counts, one division per
    bucket."""
    from de_project_sprint_etl_spark.plans.llm import MUT_OFFSET, mutant_shingles

    # the base-corpus slice of the once-per-corpus materialized shingle
    # stage (mutants live above MUT_OFFSET) — an inline explode here
    # re-pays the regex/shingle tree AND trips InferFiltersFromGenerate
    # into dragging it below the fan-out (the dedup._exploded_shingles
    # pathology): measured 9.1 s vs 1.3 s at sf0.1 for identical rows
    sh = (
        mutant_shingles(spark, sf_dir, n=3)
        .filter(F.col("id") < MUT_OFFSET)
        .select(F.col("id").alias("doc_id"), "shingle")
    )
    # n_new per doc comes from the first-occurrence table ALONE (group
    # the min-doc winners by doc), never from joining the corpus-scale
    # shingle stream back onto itself — the join formulation re-keyed
    # every shingle row a second time and measured 2x slower
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    cnts = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    news = first.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    per_doc = cnts.join(news, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_new"), F.lit(0)).cast("bigint").alias("n_new"),
    )
    rng = per_doc.agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
    bucketed = per_doc.crossJoin(F.broadcast(rng)).select(
        F.expr(
            f"CAST((doc_id - mn) DIV (((mx - mn) DIV {NOVELTY_BUCKETS}) + 1)"
            " AS INT)"
        ).alias("bucket"),
        "n_shingles",
        "n_new",
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_shingles").cast("bigint").alias("n_shingles"),
        F.sum("n_new").cast("bigint").alias("n_new"),
        F.round(
            F.sum("n_new").cast("double") / F.sum("n_shingles").cast("double"),
            6,
        ).alias("novelty_rate"),
    )


# --- PCA variance (power iteration) ---------------------------------------------------

PCA_ITERS = 3
PCA_SCALE = 1_000_000  # same 1e6 fixed-point grid as embedding_outliers
#: driver-eigensolve width bound: d^2 cells is ~8 MB of Rows at 1024
#: dims — model-sized by construction. Spark MLlib draws the same line
#: (RowMatrix.computePrincipalComponents caps at 65535 Gramian columns).
PCA_DRIVER_DIM_BOUND = 1024
#: bounded output of the PC1 projection query
PC1_TOPK = 50


def _sql_pca_ctes() -> str:
    it_ctes = []
    prev = "v0"
    for i in range(1, PCA_ITERS + 1):
        it_ctes.append(f"""w{i} AS (
  SELECT m.j, list_aggregate(LIST(m.md * {prev}.vv ORDER BY m.k), 'sum') AS wv
  FROM m JOIN {prev} ON {prev}.k = m.k GROUP BY m.j),
nrm{i} AS (SELECT SQRT(list_aggregate(LIST(wv * wv ORDER BY j), 'sum')) AS nr
           FROM w{i}),
v{i} AS (SELECT j AS k, wv / nr AS vv FROM w{i} CROSS JOIN nrm{i})""")
        prev = f"v{i}"
    its = ",\n".join(it_ctes)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (SELECT vec_id,
             list_transform(v, a -> CAST(FLOOR(a * {PCA_SCALE} + 0.5)
                                         AS BIGINT)) AS xi
      FROM e),
nn AS (SELECT CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
              CAST(COUNT(*) AS BIGINT) AS n_vecs FROM x),
dd AS (SELECT CAST(MAX(len(xi)) AS INT) AS dim FROM x),
ex AS (SELECT vec_id, CAST(u.i AS INT) AS j, xi[CAST(u.i AS INT)] AS vj, xi
       FROM x, UNNEST(generate_series(1, len(xi))) u(i)),
pr AS (SELECT j, CAST(w.i AS INT) AS k, vj, xi[CAST(w.i AS INT)] AS vk
       FROM ex, UNNEST(generate_series(1, len(xi))) w(i)),
a AS (SELECT j, k,
             CAST(SUM(CAST(vj * vk AS DECIMAL(28,0))) AS DECIMAL(28,0)) AS av
      FROM pr GROUP BY j, k),
s AS (SELECT j, CAST(SUM(vj) AS DECIMAL(19,0)) AS sv FROM ex GROUP BY j),
m AS (SELECT a.j, a.k,
             nn.n * a.av - sj.sv * sk.sv AS mdec,
             CAST(nn.n * a.av - sj.sv * sk.sv AS DOUBLE) AS md
      FROM a JOIN s sj ON sj.j = a.j JOIN s sk ON sk.j = a.k CROSS JOIN nn),
tr AS (SELECT CAST(SUM(mdec) AS DOUBLE) AS trace FROM m WHERE j = k),
v0 AS (SELECT j AS k, CASE WHEN j = 1 THEN 1.0 ELSE 0.0 END AS vv FROM s),
{its},
w4 AS (
  SELECT m.j, list_aggregate(LIST(m.md * v{PCA_ITERS}.vv ORDER BY m.k), 'sum')
           AS wv
  FROM m JOIN v{PCA_ITERS} ON v{PCA_ITERS}.k = m.k GROUP BY m.j),
lam AS (SELECT list_aggregate(
                 LIST(v{PCA_ITERS}.vv * w4.wv ORDER BY v{PCA_ITERS}.k), 'sum')
                 AS l1
        FROM v{PCA_ITERS} JOIN w4 ON w4.j = v{PCA_ITERS}.k),
top AS (SELECT k AS top_dim FROM v{PCA_ITERS}
        ORDER BY ABS(vv) DESC, k LIMIT 1)"""


def _sql_pca_variance() -> str:
    return f"""{_sql_pca_ctes()}
SELECT nn.n_vecs, dd.dim,
       ROUND(lam.l1 / tr.trace, 6) AS explained_ratio,
       top.top_dim
FROM nn CROSS JOIN dd CROSS JOIN lam CROSS JOIN tr CROSS JOIN top
"""


def _sql_pc1_scores() -> str:
    return f"""{_sql_pca_ctes()},
scores AS (
  SELECT ex.vec_id,
         list_aggregate(
           LIST(CAST(ex.vj AS DOUBLE) * v{PCA_ITERS}.vv ORDER BY ex.j),
           'sum') AS sdot
  FROM ex JOIN v{PCA_ITERS} ON v{PCA_ITERS}.k = ex.j
  GROUP BY ex.vec_id)
SELECT vec_id, ROUND(sdot / {PCA_SCALE}.0, 6) AS pc1_score
FROM scores
ORDER BY ABS(sdot) DESC, vec_id LIMIT {PC1_TOPK}
"""


def _pca_scatter_batches(batches):
    """Arrow-side exact-integer scatter partials for the PCA pass: for
    each Arrow batch of fixed-point vectors, emit the d^2 rows of the
    partial scatter X^T X as int64 — one numpy integer matmul per
    batch instead of n*d^2 codegen-generated rows (VERDICT r8 #1).

    Exactness: numpy int64 matmul is exact while every accumulated
    entry stays below 2^63; the chunk step is derived from the batch's
    max |component| so each partial is bounded by 2^62, and the
    cross-batch combine happens in Spark as DECIMAL(28,0) — the same
    integers the posexplode form summed, in a different (irrelevant)
    order. Ragged widths fall back to width-grouped accumulation,
    matching explode semantics (a width-w row only touches j,k <= w);
    NULLs raise loudly — the fixed-point grid has no NULL encoding."""
    import numpy as np
    import pyarrow as pa

    def emit(x_mat):
        w = x_mat.shape[1]
        m = int(np.abs(x_mat).max()) if x_mat.size else 0
        if m >= 1 << 31:
            # a single outer-product entry is m^2 >= 2^62: even step=1
            # cannot keep the partial exact, and numpy int64 would wrap
            # silently — refuse loudly (|value| >= ~2147 on the 1e6
            # fixed-point grid; unreachable for normalized embeddings)
            raise ValueError(
                "embedding pca scatter: |component| "
                f"{m} >= 2^31 on the fixed-point grid — outer-product "
                "entries exceed the exact int64 range; rescale or clip "
                "the embedding corpus before the covariance pass"
            )
        step = max(1, (1 << 62) // max(1, m * m))
        jj = pa.array(np.repeat(np.arange(1, w + 1, dtype=np.int32), w))
        kk = pa.array(np.tile(np.arange(1, w + 1, dtype=np.int32), w))
        for s0 in range(0, x_mat.shape[0], step):
            part = x_mat[s0 : s0 + step]
            scat = part.T @ part
            yield pa.RecordBatch.from_arrays(
                [jj, kk, pa.array(scat.ravel())], names=["j", "k", "av"]
            )

    for batch in batches:
        arr = batch.column(0)
        if len(arr) == 0:
            continue
        flat_arr = arr.flatten()
        if arr.null_count or flat_arr.null_count:
            raise ValueError(
                "embedding_pca_variance: NULL embedding or component — "
                "drop or impute before the covariance pass"
            )
        widths = arr.value_lengths().to_numpy(zero_copy_only=False)
        flat = flat_arr.to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False
        )
        if widths.size and (widths == widths[0]).all():
            if widths[0] == 0:
                continue
            yield from emit(flat.reshape(-1, int(widths[0])))
        else:
            starts = np.concatenate(([0], np.cumsum(widths)))
            for w in np.unique(widths):
                if w == 0:
                    continue
                idx = np.flatnonzero(widths == w)
                yield from emit(
                    np.stack([flat[starts[i] : starts[i] + w] for i in idx])
                )


#: once-per-corpus PCA model memo (codebook pattern — the PQ family
#: caches its trained codebooks the same way); stat-fingerprint-keyed
#: so a regenerated fixture can never serve a stale component
_PCA_MODEL_CACHE: dict[tuple, dict | None] = {}


def _pca_model(spark: SparkSession, sf_dir: str) -> dict | None:
    """Top-principal-component model of the embedding corpus by power
    iteration — the shared once-per-corpus stage behind
    ``embedding_pca_variance`` (the variance-share artifact) and
    ``embedding_pc1_scores`` (the executed projection). Returns None on
    an empty corpus; otherwise ``{n_vecs, dim, dims, v, l1, trace,
    top_dim}`` where ``v`` is the unit top component keyed by 1-based
    dim.

    Exactness staging (the embedding-family pattern): vectors quantize
    to the 1e6 fixed-point grid, the scatter matrix accumulates as
    EXACT integers (per-dim sums DECIMAL(19,0), cross-products
    DECIMAL(28,0)), and the centered second-moment matrix
    M = n*A - s s^T is exact DECIMAL before ONE shared cast to double —
    so both engines start the float phase from identical 64x64 values.
    The {PCA_ITERS} unrolled power iterations, norms, the Rayleigh
    quotient, and the trace ratio are all fixed-order folds over
    dim-sorted lists (never a partition-order float sum). Deterministic
    e_1 start; ties in the loading argmax resolve to the lowest dim.

    Scale shape: ONE O(n*d^2) corpus pass for A — the honest covariance
    flop count, but executed as Arrow-batched numpy integer matmuls
    (one X^T X kernel per batch, exact int64 partials bounded below
    2^62, DECIMAL-combined onto d^2 = 4096 keys) rather than n*d^2
    codegen rows; sampled estimation is the named cheaper path. The
    power iteration then runs DRIVER-SIDE on the collected d^2-cell
    matrix — Spark's own PCA does exactly this
    (RowMatrix.computePrincipalComponents: distributed Gramian, local
    eigensolve), because iterating model-sized state through
    distributed stages pays ~20 shuffle/stage round-trips to move 32 KB.
    The collect is dim-guarded (<= {PCA_DRIVER_DIM_BOUND} dims, ~8 MB of
    cells) and the Python loop replays the identical IEEE fold order,
    so the result is bit-equal to the former in-engine iteration AND to
    the oracle's LIST(... ORDER BY) sums."""
    import os

    from de_project_sprint_etl_spark.plans.llm import fan_out
    from de_project_sprint_etl_spark.plans.registry import data_fingerprint

    key = (
        id(spark),
        sf_dir,
        data_fingerprint(os.path.join(sf_dir, "embeddings.parquet")),
    )
    if key in _PCA_MODEL_CACHE:
        return _PCA_MODEL_CACHE[key]
    # single-live-session contract (the _PLAN_CACHE discipline): drop
    # models trained under any other SparkSession on insert
    for k in [k for k in _PCA_MODEL_CACHE if k[0] != id(spark)]:
        _PCA_MODEL_CACHE.pop(k, None)

    emb = fan_out(
        spark, t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    xi = F.transform(
        F.col("embedding"),
        lambda a: F.floor(a.cast("double") * PCA_SCALE + 0.5).cast("long"),
    )
    x = emb.select("vec_id", xi.alias("xi"))
    head = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.max(F.size("xi")).cast("int").alias("dim"),
    ).collect()[0]
    n_vecs, dim = head["n_vecs"], head["dim"]
    if dim is not None and dim > PCA_DRIVER_DIM_BOUND:
        raise ValueError(
            f"embedding pca model: dim {dim} exceeds the driver "
            f"eigensolve bound {PCA_DRIVER_DIM_BOUND}; use the "
            "distributed matrix-frame power iteration (or a randomized "
            "sketch) for wide models"
        )
    ex = x.select(F.posexplode("xi").alias("p", "vj")).select(
        (F.col("p") + 1).alias("j"), "vj"
    )
    # d x d scatter via Arrow-vectorized per-batch outer products
    # (was: a second nested posexplode = n*d^2 generated rows; the
    # matmul form moves the same exact integer arithmetic into one
    # vectorized kernel per Arrow batch and combines d^2-keyed partials
    # map-side — ~10x less CPU at any corpus size, identical values)
    a = (
        x.select("xi")
        .mapInArrow(_pca_scatter_batches, "j int, k int, av long")
        .groupBy("j", "k")
        .agg(
            F.sum(F.col("av").cast("decimal(28,0)"))
            .cast("decimal(28,0)")
            .alias("av")
        )
    )
    s = ex.groupBy("j").agg(
        F.sum(F.col("vj").cast("decimal(19,0)"))
        .cast("decimal(19,0)")
        .alias("sv")
    )
    sj = s.select(F.col("j").alias("j"), F.col("sv").alias("svj"))
    sk = s.select(F.col("j").alias("k"), F.col("sv").alias("svk"))
    n_dec = F.lit(n_vecs).cast("decimal(10,0)")
    mdec = n_dec * F.col("av") - F.col("svj") * F.col("svk")
    # ONE distributed job materializes the exact centered second-moment
    # matrix (d^2 cells, both the exact DECIMAL and its one double
    # cast); the model phase below runs on the driver (MLlib
    # computePrincipalComponents precedent — the guard above bounds the
    # collect by model width, never by corpus size)
    cells = (
        a.join(sj, "j")
        .join(sk, "k")
        .select("j", "k", mdec.alias("mdec"), mdec.cast("double").alias("md"))
        .collect()
    )
    if not cells:
        # empty corpus: callers produce empty frames (the former
        # all-DataFrame form yielded zero rows via empty inner joins)
        _PCA_MODEL_CACHE[key] = None
        return None
    # trace as an exact integer sum (the cells' DECIMALs are integers);
    # int -> float is correctly rounded in both CPython and the JVM, so
    # this equals the former Spark-side SUM(mdec)::DOUBLE bit-for-bit
    trace = float(sum(int(r["mdec"]) for r in cells if r["j"] == r["k"]))
    by_j: dict[int, list[tuple[int, float]]] = {}
    for r in sorted(cells, key=lambda r: (r["j"], r["k"])):
        by_j.setdefault(r["j"], []).append((r["k"], r["md"]))
    dims = sorted(by_j)

    # fixed-order power iteration: every reduction folds in dim-sorted
    # order with a 0.0 seed — the exact arithmetic the in-engine
    # F.aggregate(array_sort(...)) form and the oracle's
    # LIST(... ORDER BY) sums perform, one IEEE double op at a time
    def mat_vec(v: dict[int, float]) -> dict[int, float]:
        out = {}
        for j in dims:
            acc = 0.0
            for k, md in by_j[j]:
                acc = acc + md * v[k]
            out[j] = acc
        return out

    v = {j: 1.0 if j == 1 else 0.0 for j in dims}
    for _ in range(PCA_ITERS):
        w = mat_vec(v)
        acc = 0.0
        for j in dims:
            acc = acc + w[j] * w[j]
        nrm = math.sqrt(acc)
        if nrm == 0.0:
            raise ValueError(
                "embedding pca model: zero spectral norm — the "
                "centered corpus is identically zero"
            )
        v = {j: w[j] / nrm for j in dims}
    w4 = mat_vec(v)
    l1 = 0.0
    for k in dims:
        l1 = l1 + v[k] * w4[k]
    top_dim, best = dims[0], -1.0
    for k in dims:
        if abs(v[k]) > best:
            top_dim, best = k, abs(v[k])
    model = {
        "n_vecs": n_vecs,
        "dim": dim,
        "dims": dims,
        "v": v,
        "l1": l1,
        "trace": trace,
        "top_dim": top_dim,
    }
    _PCA_MODEL_CACHE[key] = model
    return model


@register("embedding_pca_variance", _sql_pca_variance())
def q_embedding_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-principal-component variance share of the embedding corpus —
    the artifact read before trusting a truncation dim (MRL / random
    projection) or an IVF geometry: a high explained_ratio says the
    space is effectively low-rank (truncation is cheap, one IVF axis
    dominates); near-uniform says it is not. All the machinery —
    exact-integer scatter, Arrow-batched matmuls, the driver-side
    fixed-order power iteration and its scale guards — lives in
    ``_pca_model`` (shared with ``embedding_pc1_scores``).

    NOTE (eager): building this plan trains the memoized PCA model,
    which runs two distributed jobs (head agg + d^2-cell scatter
    collect) at DataFrame-CONSTRUCTION time, once per (session, corpus
    fingerprint) — explain-only harnesses pay one corpus pass, and
    data errors (NULL embeddings) surface at construction."""
    model = _pca_model(spark, sf_dir)
    if model is None:
        return spark.range(0).select(
            F.lit(None).cast("bigint").alias("n_vecs"),
            F.lit(None).cast("int").alias("dim"),
            F.lit(None).cast("double").alias("explained_ratio"),
            F.lit(None).cast("int").alias("top_dim"),
        )
    # division + HALF_UP rounding stay in Spark so the output cell is
    # produced by the same engine expression as before
    return spark.range(1).select(
        F.lit(model["n_vecs"]).cast("bigint").alias("n_vecs"),
        F.lit(model["dim"]).cast("int").alias("dim"),
        F.round(F.lit(model["l1"]) / F.lit(model["trace"]), 6).alias(
            "explained_ratio"
        ),
        F.lit(model["top_dim"]).cast("int").alias("top_dim"),
    )


@register("embedding_pc1_scores", _sql_pc1_scores())
def q_embedding_pc1_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE the PCA: the {PC1_TOPK} vectors most extreme along the
    corpus's top principal component, with their projection scores —
    the companion that applies what ``embedding_pca_variance`` only
    measures (the same curve→assignment pairing as
    pack_efficiency_curve→pack_assign_greedy). Extreme-PC1 vectors are
    the review queue for axis-dominating content (near-constant
    boilerplate embeddings, a single over-represented domain) before a
    truncation or IVF geometry is frozen on this corpus.

    The component comes from the shared once-per-corpus ``_pca_model``
    (driver-side fixed-order eigensolve, memoized); the projection is
    one map-side zip_with fold per vector in dim order — the identical
    IEEE sequence the oracle's LIST(... ORDER BY j) sum performs — and
    the top-k is rank-by-|raw-dot| with vec_id tiebreak, computed on
    the UNROUNDED dot so a rounding collision cannot reorder the
    boundary. Scale shape: ONE narrow corpus pass + Spark's TakeOrdered
    top-k; nothing but the k result rows crosses to the driver.

    NOTE (eager): like ``embedding_pca_variance``, constructing this
    plan trains the memoized ``_pca_model`` (two distributed jobs) on
    first build per (session, corpus fingerprint)."""
    from de_project_sprint_etl_spark.plans.llm import fan_out

    model = _pca_model(spark, sf_dir)
    emb = fan_out(
        spark, t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    xi = F.transform(
        F.col("embedding"),
        lambda a: F.floor(a.cast("double") * PCA_SCALE + 0.5).cast("long"),
    )
    x = emb.select("vec_id", xi.alias("xi"))
    if model is None:
        return x.select(
            "vec_id", F.lit(None).cast("double").alias("pc1_score")
        ).filter(F.lit(False))
    varr = F.array(
        *[
            F.lit(model["v"].get(j, 0.0))
            for j in range(1, model["dim"] + 1)
        ]
    )
    # ragged rows: fold over the ROW'S OWN positions only — slicing the
    # component to size(xi) keeps zip_with from NULL-padding a short
    # vector (which would NULL the whole fold), and matches the oracle's
    # partial dot over ex's existing (vec_id, j) rows; for the
    # equal-width common case slice(varr, 1, dim) IS varr, so values
    # (and hashes) are unchanged
    sdot = F.aggregate(
        F.zip_with(
            F.col("xi"),
            F.slice(varr, 1, F.size("xi")),
            lambda a, b: a.cast("double") * b,
        ),
        F.lit(0.0),
        lambda acc, term: acc + term,
    )
    return (
        x.select("vec_id", sdot.alias("sdot"))
        .orderBy(F.abs(F.col("sdot")).desc(), F.col("vec_id").asc())
        .limit(PC1_TOPK)
        .select(
            "vec_id",
            F.round(F.col("sdot") / PCA_SCALE, 6).alias("pc1_score"),
        )
    )
