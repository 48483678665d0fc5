"""Statistical language-model scoring over document tables: bigram
log-loss (the classic KenLM-style perplexity quality filter, reduced to
an n-gram model trainable inside the engine) and BM25 ranking.

Reference parity: the reference (MatthewS-M/de-project-sprint-ETL) has
no text operators at all — these are extension ops from the build
brief's training-data-pipeline surface (quality scoring family, next to
``functions/text.py``).

Cross-engine determinism strategy (shared with ``text.with_token_entropy``):
probabilities are ratios of exact integers, so both engines compute
``log2``/``ln`` of bit-identical doubles; per-document summation folds
over an in-row *sorted* array so addition order is fixed; final scores
round to 6 decimals.

Scale notes: training is two partial-combined aggregations (bigram and
unigram counts) — the exact shape a 100 TB corpus wants (map-side
combine collapses the Zipf head before the shuffle). Scoring joins the
(doc, bigram)-type stream against the model on the bigram key: the
per-doc stream is pre-aggregated to *types* first, so join input is
O(distinct bigrams per doc), not O(tokens). No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from de_project_sprint_etl_spark.functions.text import SQL_NORM, SQL_TOKENS, tokens


def _bigram_structs(toks: Column) -> Column:
    """``array<struct<w1,w2>>`` of adjacent token pairs (1-based
    ``element_at`` mirrors DuckDB's 1-based list indexing)."""
    return F.expr(
        "CASE WHEN size(__toks) >= 2 THEN "
        "transform(sequence(1, size(__toks) - 1), "
        "i -> struct(element_at(__toks, i) AS w1, element_at(__toks, i + 1) AS w2)) "
        "ELSE array() END"
    )


def bigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train: DataFrame | None = None,
) -> DataFrame:
    """Score each document by its average bigram negative log2
    probability (bits per bigram) under an add-one-smoothed bigram model
    trained on ``train`` (default: the corpus itself — self-perplexity,
    the cheap boilerplate/gibberish detector; production quality
    filtering trains on a held-out high-quality corpus and passes it as
    ``train``).

    Model: ``p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)`` with ``c(w1)`` the
    unigram occurrence count and ``V`` the distinct-unigram vocabulary
    size. Documents with fewer than two tokens are dropped (no bigrams
    to score).

    Output: ``doc_id, n_bigrams, bits_per_bigram`` — low bits =
    predictable/templated text, high bits = rare or shuffled n-grams.
    """
    if train is None:
        train = docs
    tr_toks = (
        train.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
    )
    # Two partial-combined aggs: the Zipf head collapses map-side.
    uni = tr_toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vocab = uni.agg(F.count(F.lit(1)).alias("__v"))
    tr_big = (
        train.select(F.col(text_col).alias("__t"))
        .withColumn("__toks", tokens(F.col("__t")))
        .select(F.explode(_bigram_structs(F.col("__toks"))).alias("b"))
        .select("b.w1", "b.w2")
        .filter((F.length("w1") > 0) & (F.length("w2") > 0))
    )
    model = tr_big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))

    doc_big = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
        .withColumn("__toks", tokens(F.col("__t")))
        .select("doc_id", F.explode(_bigram_structs(F.col("__toks"))).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
        .filter((F.length("w1") > 0) & (F.length("w2") > 0))
        # pre-aggregate to (doc, bigram)-TYPES so the model join carries
        # one row per distinct bigram per doc, not one per token
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    scored = (
        doc_big.join(model, ["w1", "w2"], "inner")  # self-trained: always hits
        .join(uni.withColumnRenamed("w", "w1"), ["w1"], "inner")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "w1",
            "w2",
            "cnt",
            (
                F.col("cnt").cast("double")
                * -F.log2(
                    (F.col("c12") + F.lit(1))
                    / (F.col("c1") + F.col("__v")).cast("double")
                )
            ).alias("bits"),
        )
    )
    # Deterministic per-doc reduction: fold the (w1,w2)-sorted term list
    # in-row so double addition order is engine-identical.
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.sort_array(
                F.collect_list(F.struct("w1", "w2", "bits"))
            ).alias("__terms"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                F.aggregate(
                    "__terms", F.lit(0.0).cast("double"), lambda acc, x: acc + x["bits"]
                )
                / F.col("n_bigrams"),
                6,
            ).alias("bits_per_bigram"),
        )
    )


def sql_bigram_lm_score(rel: str, text_col: str = "text") -> str:
    """DuckDB mirror of :func:`bigram_lm_score` (self-trained form):
    same tokenization, same add-one model, same sorted-fold reduction."""
    toks = SQL_TOKENS.format(c=text_col)
    return f"""
WITH toked AS (
  SELECT doc_id, {toks} AS t FROM {rel}
),
tr_uni AS (
  SELECT w, COUNT(*) AS c1
  FROM (SELECT UNNEST(t) AS w FROM toked) u
  WHERE LENGTH(w) > 0 GROUP BY w
),
vocab AS (SELECT COUNT(*) AS v FROM tr_uni),
big AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toked, UNNEST(CASE WHEN len(t) >= 2 THEN range(1, len(t)) ELSE [] END) AS r(i)
  WHERE LENGTH(t[i]) > 0 AND LENGTH(t[i + 1]) > 0
),
model AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
doc_big AS (
  SELECT doc_id, w1, w2, COUNT(*) AS cnt FROM big GROUP BY doc_id, w1, w2
),
terms AS (
  SELECT d.doc_id, d.w1, d.w2, d.cnt,
         CAST(d.cnt AS DOUBLE)
           * -LOG2((m.c12 + 1) / CAST(u.c1 + vocab.v AS DOUBLE)) AS bits
  FROM doc_big d
  JOIN model m ON d.w1 = m.w1 AND d.w2 = m.w2
  JOIN tr_uni u ON d.w1 = u.w
  CROSS JOIN vocab
),
agg AS (
  SELECT doc_id, SUM(cnt) AS n_bigrams,
         list_sort(list({{'w1': w1, 'w2': w2, 'bits': bits}})) AS terms
  FROM terms GROUP BY doc_id
)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       ROUND(list_aggregate(list_transform(terms, x -> x.bits), 'sum')
             / n_bigrams, 6) AS bits_per_bigram
FROM agg
"""


# --- BM25 -------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k retrieval for a fixed bag of query terms.

    Shape: per-doc term frequencies are in-row array filters (narrow, no
    explode, no shuffle of the corpus); document frequencies and the
    average document length are one-row global aggregates broadcast
    back; the score is a *fixed-order* expression sum over the query
    terms (written order, engine-identical); top-k via TakeOrdered.
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (the standard
    non-negative variant).

    Output: ``doc_id, score, rank`` for the k best documents.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__toks")
    ).withColumn("dl", F.size(F.filter("__toks", lambda x: F.length(x) > 0)))
    # closure factory, not a default-arg lambda: pyspark dispatches
    # higher-order lambdas on ARITY, so `lambda x, t=term:` would be
    # called as the (element, index) two-arg form
    def _match(term: str):
        return lambda x: x == F.lit(term)

    for i, term in enumerate(query_terms):
        base = base.withColumn(
            f"tf{i}", F.size(F.filter("__toks", _match(term)))
        )
    return bm25_rank_from_tf(base.drop("__toks"), len(query_terms), k)


def bm25_rank_from_tf(base: DataFrame, n_terms: int, k: int) -> DataFrame:
    """BM25 stats + scoring + top-k over a precomputed term-frequency
    frame ``(doc_id, dl, tf0..tf{n_terms-1})`` — the scoring core of
    :func:`bm25_topk`, split out (r12) so a caller that already owns a
    tokenization pass (hybrid retrieval's shared exploded aggregation)
    can reuse the IDENTICAL df/avgdl/idf float expressions without
    re-tokenizing the corpus."""
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("dl").alias("__dl_sum"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(n_terms)
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("__dl_sum") / F.col("__n").cast("double")
    score = F.lit(0.0).cast("double")
    for i in range(n_terms):
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col(f"df{i}") + F.lit(0.5))
            / (F.col(f"df{i}") + F.lit(0.5))
        )
        tf = F.col(f"tf{i}").cast("double")
        score = score + idf * (
            tf
            * (BM25_K1 + 1)
            / (tf + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl))
        )
    scored = joined.select("doc_id", F.round(score, 6).alias("score"))
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
            .cast("int"),
        )
    )


def sql_bm25_topk(
    rel: str, query_terms: tuple[str, ...], k: int = 20, text_col: str = "text"
) -> str:
    """DuckDB mirror of :func:`bm25_topk` — identical tf/df/avgdl
    integers, identical fixed-order score expression."""
    toks = SQL_TOKENS.format(c=text_col)
    tf_cols = ",\n         ".join(
        f"len(list_filter(__toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(query_terms)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(query_terms))
    )
    parts = []
    for i in range(len(query_terms)):
        idf = f"LN(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
        tf = f"CAST(tf{i} AS DOUBLE)"
        parts.append(
            f"{idf} * ({tf} * ({BM25_K1} + 1) / ({tf} + {BM25_K1} * "
            f"(1 - {BM25_B} + {BM25_B} * dl / avgdl)))"
        )
    score = " + ".join(parts) if parts else "0.0"
    return f"""
WITH base AS (
  SELECT doc_id,
         len(list_filter(__toks, x -> LENGTH(x) > 0)) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, {toks} AS __toks FROM {rel}) t
),
stats AS (
  SELECT COUNT(*) AS n, SUM(dl) AS dl_sum, {df_cols} FROM base
),
scored AS (
  SELECT doc_id,
         ROUND({score}, 6) AS score
  FROM (SELECT base.*, stats.n, stats.dl_sum / CAST(stats.n AS DOUBLE) AS avgdl,
               {", ".join(f"stats.df{i}" for i in range(len(query_terms))) or "1"}
        FROM base CROSS JOIN stats) j
)
SELECT doc_id, score,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
FROM scored
ORDER BY score DESC, doc_id
LIMIT {k}
"""


# --- BPE merge-candidate counting -------------------------------------------



def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Word-frequency vocabulary (``w, freq``) — the shared
    corpus-to-vocab collapse both BPE training statistics and the BPE
    encoder build on; changing the tokenizer/vocab filter HERE keeps
    training and encoding in lockstep."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def sql_word_freqs(rel: str, text_col: str = "text") -> str:
    """DuckDB mirror of :func:`word_freqs` (a derived-table string)."""
    toks = SQL_TOKENS.format(c=text_col)
    return (
        f"(SELECT w, COUNT(*) AS freq"
        f" FROM (SELECT UNNEST({toks}) AS w FROM {rel}) u"
        f" WHERE LENGTH(w) > 0 GROUP BY w)"
    )

def bpe_merge_candidates(
    docs: DataFrame, k: int = 50, text_col: str = "text"
) -> DataFrame:
    """One step of byte-pair-encoding tokenizer training: count adjacent
    character-pair frequencies across the corpus and emit the top-k
    merge candidates.

    The BPE scale trick is worked in: pair counting runs over the
    *distinct word vocabulary* weighted by word frequency — corpus-sized
    text collapses to vocab-sized work in the first partial-combined
    aggregation, which is why tokenizer training is feasible on a
    100 TB corpus at all. All-integer counts; ties break on the pair.

    Output: ``left, right, cnt, rank`` (rank 1 = the pair the next BPE
    merge would fuse).
    """
    words = word_freqs(docs, text_col)
    pairs = (
        words.filter(F.length("w") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1),"
                    " i -> struct(substring(w, i, 1) AS l, substring(w, i + 1, 1) AS r))"
                )
            ).alias("p"),
        )
        .select(F.col("p.l").alias("left"), F.col("p.r").alias("right"), "freq")
        .groupBy("left", "right")
        .agg(F.sum("freq").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("left").asc(), F.col("right").asc())
    return (
        pairs.orderBy(F.col("cnt").desc(), F.col("left").asc(), F.col("right").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )


def sql_bpe_merge_candidates(rel: str, k: int = 50, text_col: str = "text") -> str:
    """DuckDB mirror of :func:`bpe_merge_candidates`."""
    wf = sql_word_freqs(rel, text_col)
    return f"""
WITH words AS (SELECT * FROM {wf}),
pairs AS (
  SELECT SUBSTR(w, i, 1) AS "left", SUBSTR(w, i + 1, 1) AS "right",
         CAST(SUM(freq) AS BIGINT) AS cnt
  FROM words, UNNEST(range(1, LENGTH(w))) AS r(i)
  WHERE LENGTH(w) >= 2
  GROUP BY 1, 2
)
SELECT "left", "right", cnt,
       CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, "left", "right") AS INT) AS rank
FROM pairs
ORDER BY cnt DESC, "left", "right"
LIMIT {k}
"""


# --- DSIR (Data Selection via Importance Resampling) ------------------------


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    buckets: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    score every document by how much more likely its hashed-bigram bag
    is under a bag-of-ngrams model of the ``target`` corpus than under
    the model of the raw corpus itself. Selecting the top-weighted
    documents (or Gumbel-resampling on the weights) is the DSIR data
    selection step; the weights are the engine op.

    Features: adjacent-token bigrams hashed into ``buckets`` buckets
    (the hashing trick bounds model width at any corpus size). Models:
    add-one-smoothed bucket frequencies; ``log2`` importance ratio
    ``log2 p_tgt(b) - log2 p_raw(b)`` summed over each doc's buckets
    weighted by count. Documents with no bigram features are dropped
    (no evidence either way), same contract as ``bigram_lm_score``.

    Output: ``doc_id, n_feats, logw`` (logw in bits, rounded to 6).

    Scale shape: the two models are partial-combined aggregations over
    a ≤``buckets``-row key space — the Zipf head collapses map-side and
    the ratio table is broadcast back, so the corpus shuffles only on
    (doc, bucket) types. Cross-engine determinism: exact-integer
    probability ratios, per-doc bucket-sorted in-row fold (same
    contract as the bigram LM above).
    """
    from de_project_sprint_etl_spark.functions.text import h64

    def bigram_buckets(df: DataFrame, keep_id: bool) -> DataFrame:
        ids = [F.col(id_col).alias("doc_id")] if keep_id else []
        out = (
            df.select(*ids, F.col(text_col).alias("__t"))
            .withColumn("__toks", tokens(F.col("__t")))
            .select(*(["doc_id"] if keep_id else []),
                    F.explode(_bigram_structs(F.col("__toks"))).alias("b"))
            .select(*(["doc_id"] if keep_id else []), "b.w1", "b.w2")
            .filter((F.length("w1") > 0) & (F.length("w2") > 0))
        )
        # h64 is non-negative (60-bit), so % == pmod on both engines
        return out.withColumn(
            "bucket", h64(F.concat_ws(" ", "w1", "w2")) % F.lit(buckets)
        )

    # ONE tokenize+hash pass over the scored corpus: the raw model is
    # the per-doc feature table re-aggregated (c_raw == Σ cnt), so
    # derive both from the same stream instead of scanning twice
    # (review finding; the SQL mirror already shares its raw_big CTE).
    doc_feat = (
        bigram_buckets(docs, True)
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    raw = doc_feat.groupBy("bucket").agg(F.sum("cnt").alias("c_raw"))
    tgt = bigram_buckets(target, False).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c_tgt")
    )
    totals = raw.agg(F.sum("c_raw").alias("n_raw")).crossJoin(
        tgt.agg(F.sum("c_tgt").alias("n_tgt"))
    )
    # raw is trained on the scored corpus itself, so every doc bucket
    # hits a raw row; target buckets may be absent (c_tgt -> 0)
    ratio = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log2(
                    (F.coalesce(F.col("c_tgt"), F.lit(0)) + F.lit(1))
                    / (F.col("n_tgt") + F.lit(buckets)).cast("double")
                )
                - F.log2(
                    (F.col("c_raw") + F.lit(1))
                    / (F.col("n_raw") + F.lit(buckets)).cast("double")
                )
            ).alias("lr"),
        )
    )
    terms = doc_feat.join(F.broadcast(ratio), "bucket").select(
        "doc_id", "bucket", "cnt",
        (F.col("cnt").cast("double") * F.col("lr")).alias("term"),
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.sort_array(F.collect_list(F.struct("bucket", "term"))).alias("__ts"),
        )
        .select(
            "doc_id",
            F.col("n_feats").cast("bigint").alias("n_feats"),
            F.round(
                F.aggregate(
                    "__ts", F.lit(0.0).cast("double"), lambda acc, x: acc + x["term"]
                ),
                6,
            ).alias("logw"),
        )
    )


def sql_dsir_importance(
    rel: str, target_rel: str, buckets: int = 512, text_col: str = "text"
) -> str:
    """DuckDB mirror of :func:`dsir_importance`: same tokenization,
    bucket hash, add-one models, and bucket-sorted fold."""
    from de_project_sprint_etl_spark.functions.text import sql_h64

    toks = SQL_TOKENS.format(c=text_col)
    pair_expr = "CONCAT(w1, ' ', w2)"
    bucket = f"{sql_h64(pair_expr)} % {buckets}"
    return f"""
WITH raw_tok AS (SELECT doc_id, {toks} AS t FROM {rel}),
tgt_tok AS (SELECT doc_id, {toks} AS t FROM {target_rel}),
raw_big AS (
  SELECT doc_id, {bucket} AS bucket
  FROM (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM raw_tok, UNNEST(CASE WHEN len(t) >= 2 THEN range(1, len(t)) ELSE [] END) AS r(i)
        WHERE LENGTH(t[i]) > 0 AND LENGTH(t[i + 1]) > 0) s
),
tgt_big AS (
  SELECT {bucket} AS bucket
  FROM (SELECT t[i] AS w1, t[i + 1] AS w2
        FROM tgt_tok, UNNEST(CASE WHEN len(t) >= 2 THEN range(1, len(t)) ELSE [] END) AS r(i)
        WHERE LENGTH(t[i]) > 0 AND LENGTH(t[i + 1]) > 0) s
),
raw_m AS (SELECT bucket, COUNT(*) AS c_raw FROM raw_big GROUP BY bucket),
tgt_m AS (SELECT bucket, COUNT(*) AS c_tgt FROM tgt_big GROUP BY bucket),
tot AS (SELECT (SELECT SUM(c_raw) FROM raw_m) AS n_raw,
               (SELECT SUM(c_tgt) FROM tgt_m) AS n_tgt),
ratio AS (
  SELECT r.bucket,
         LOG2((COALESCE(g.c_tgt, 0) + 1) / CAST(t.n_tgt + {buckets} AS DOUBLE))
           - LOG2((r.c_raw + 1) / CAST(t.n_raw + {buckets} AS DOUBLE)) AS lr
  FROM raw_m r LEFT JOIN tgt_m g USING (bucket) CROSS JOIN tot t
),
doc_feat AS (SELECT doc_id, bucket, COUNT(*) AS cnt
             FROM raw_big GROUP BY doc_id, bucket),
terms AS (SELECT d.doc_id, d.bucket, d.cnt,
                 CAST(d.cnt AS DOUBLE) * r.lr AS term
          FROM doc_feat d JOIN ratio r USING (bucket)),
agg AS (SELECT doc_id, SUM(cnt) AS n_feats,
               list_sort(list({{'bucket': bucket, 'term': term}})) AS ts
        FROM terms GROUP BY doc_id)
SELECT doc_id, CAST(n_feats AS BIGINT) AS n_feats,
       ROUND(list_aggregate(list_transform(ts, x -> x.term), 'sum'), 6) AS logw
FROM agg
"""


# --- BPE tokenization apply (greedy ranked-merge encoding) -------------------

#: Pinned merge table (rank-ordered), the trained-tokenizer artifact the
#: encoder applies — the counterpart of ``bpe_merge_candidates``, which
#: computes the statistics such a table is learned from. Pinned as
#: literals for the same reason the LSH hyperplanes are: the oracle is a
#: static SQL string, and a tokenizer's merge table is a frozen artifact
#: applied unchanged to any corpus.
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("s", "p"), ("sp", "a"), ("spa", "r"), ("spar", "k"),
    ("j", "o"), ("jo", "i"), ("joi", "n"),
    ("d", "a"), ("da", "t"), ("dat", "a"),
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("b", "a"), ("ba", "t"), ("bat", "c"), ("batc", "h"),
)



_MERGE_TOKEN_RE = None


def _validate_merges(merges) -> None:
    """Merge tokens are interpolated into SQL literals and LIKE
    patterns on both engines, so restrict them to the normalized-token
    alphabet — anything else (quotes, %, _) would parse-error or
    silently corrupt the greedy fold's last-token guard."""
    import re as _re

    global _MERGE_TOKEN_RE
    if _MERGE_TOKEN_RE is None:
        _MERGE_TOKEN_RE = _re.compile(r"^[a-z0-9]+$")
    for a, b in merges:
        if not (_MERGE_TOKEN_RE.match(a) and _MERGE_TOKEN_RE.match(b)):
            raise ValueError(
                f"merge tokens must match [a-z0-9]+ (got {(a, b)!r}); "
                "the normalized corpus alphabet is the supported domain"
            )

def _bpe_fold_expr(prev: str, a: str, b: str) -> str:
    """One ranked merge as a greedy leftmost left-fold over the
    space-separated token string ``prev`` (identical semantics on both
    engines: seed = first token, merge appends ``b`` without a space
    when the accumulator's last token is exactly ``a``)."""
    return (
        f"aggregate(slice(split({prev}, ' '), 2,"
        f" greatest(size(split({prev}, ' ')) - 1, 0)),"
        f" element_at(split({prev}, ' '), 1),"
        f" (acc, x) -> CASE WHEN x = '{b}' AND (acc = '{a}' OR acc LIKE '% {a}')"
        f" THEN concat(acc, '{b}') ELSE concat(acc, ' ', x) END)"
    )


def bpe_encode_vocab(
    docs: DataFrame,
    merges: tuple[tuple[str, str], ...] = BPE_MERGES,
    text_col: str = "text",
) -> DataFrame:
    """Apply a BPE merge table to the corpus VOCABULARY: split every
    distinct word to characters, then run the ranked merges in order,
    each a greedy leftmost pass (the standard BPE encode step, e.g.
    Sennrich et al. 2016). Output: ``word, freq, pieces, n_pieces``.

    Scale shape: tokenization work is VOCAB-sized, not corpus-sized —
    the explode+count collapses the Zipf head map-side (same contract
    as ``bpe_merge_candidates``), and per-doc piece counts are a
    broadcast join of this table back to the token stream. All folds
    are Catalyst expressions; no Python.
    """
    _validate_merges(merges)
    vocab = word_freqs(docs, text_col).withColumnRenamed("w", "word")
    out = vocab.withColumn(
        "s", F.expr("array_join(regexp_extract_all(word, '.', 0), ' ')")
    )
    for a, b in merges:
        out = out.withColumn("s", F.expr(_bpe_fold_expr("s", a, b)))
    return out.select(
        "word",
        F.col("freq").cast("bigint").alias("freq"),
        F.col("s").alias("pieces"),
        F.size(F.split("s", " ")).cast("int").alias("n_pieces"),
    )


def sql_bpe_encode_vocab(
    rel: str,
    merges: tuple[tuple[str, str], ...] = BPE_MERGES,
    text_col: str = "text",
) -> str:
    """DuckDB mirror of :func:`bpe_encode_vocab` (list_reduce seeds with
    the first element, matching the Spark fold's explicit seed)."""
    _validate_merges(merges)

    def fold(prev: str, a: str, b: str) -> str:
        return (
            f"list_reduce(string_split({prev}, ' '),"
            f" (acc, x) -> CASE WHEN x = '{b}' AND (acc = '{a}' OR acc LIKE '% {a}')"
            f" THEN acc || '{b}' ELSE acc || ' ' || x END)"
        )

    ctes = [
        f"vocab AS (SELECT w AS word, freq FROM {sql_word_freqs(rel, text_col)} wf)",
        "s0 AS (SELECT word, freq,"
        " array_to_string(regexp_extract_all(word, '.'), ' ') AS s FROM vocab)",
    ]
    prev = "s0"
    for i, (a, b) in enumerate(merges, start=1):
        ctes.append(
            f"s{i} AS (SELECT word, freq, {fold('s', a, b)} AS s FROM {prev})"
        )
        prev = f"s{i}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT word, CAST(freq AS BIGINT) AS freq, s AS pieces,
       CAST(len(string_split(s, ' ')) AS INT) AS n_pieces
FROM {prev}"""
    )


# --- exact phrase search over a positional inverted index --------------------


def phrase_occurrences(
    docs: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase matching the way a search engine does it: a
    positional posting list ``(doc, term, pos)`` filtered to the query
    phrases' terms ONLY (predicate pushed below the explode — the index
    touched is O(query-term postings), never the corpus vocabulary),
    then one equi-join per adjacency ``pos_{i+1} = pos_i + 1``. The
    positional primitive that completes the search tier next to BM25
    (bag-of-words) and RRF fusion.

    Output: ``phrase, n_docs, n_occurrences`` (phrases with no match
    included with zeros — the query set is the left side).
    """
    from de_project_sprint_etl_spark.functions.text import py_norm_text, tokens

    # Query phrases go through the SAME normalizer as the corpus
    # tokenizer — an uppercase/punctuated phrase must match the
    # normalized posting list, not silently miss. The output label
    # stays the caller's original phrase string.
    # A phrase that normalizes to EMPTY (punctuation-only, non-Latin)
    # trivially matches nothing: it gets the zero-count row, keeping
    # this a total function over any query set (ADVICE r5 — the
    # transient ValueError here was a behavior regression for callers
    # probing such phrases).
    norm = {p: py_norm_text(p) for p in phrases}
    terms = sorted({w for np_ in norm.values() for w in np_.split()})
    # the posting list feeds every phrase branch AND every adjacency
    # join side — materialize or the corpus tokenize/explode re-runs per
    # reference (~5 scans for a 2-phrase query). Eager localCheckpoint
    # instead of persist: O(query-term postings) rows, GC-managed blocks
    # (no CacheManager entry leaked per call in a long-lived session).
    # ... unless every phrase normalized to empty: no branch reads the
    # posting list then, so don't run the (eager) corpus tokenize job
    post = None
    if terms:
        post = (
            docs.select(
                F.col(id_col).alias("doc"),
                F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
            )
            .filter(F.col("term").isin(terms))
            .localCheckpoint(eager=True)
        )
    out = None
    for phrase in phrases:
        ws = norm[phrase].split()
        if not ws:
            agg = docs.sparkSession.range(1).select(
                F.lit(phrase).alias("phrase"),
                F.lit(0).cast("long").alias("n_docs"),
                F.lit(0).cast("long").alias("n_occurrences"),
            )
            out = agg if out is None else out.unionByName(agg)
            continue
        cur = post.filter(F.col("term") == ws[0]).select(
            "doc", F.col("pos").alias("p0")
        )
        for i, w in enumerate(ws[1:], start=1):
            nxt = post.filter(F.col("term") == w).select(
                F.col("doc").alias("d2"), F.col("pos").alias("pi")
            )
            cur = cur.join(
                nxt,
                (F.col("doc") == F.col("d2"))
                & (F.col("pi") == F.col("p0") + i),
            ).select("doc", "p0")
        agg = cur.agg(
            F.countDistinct("doc").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        ).select(
            F.lit(phrase).alias("phrase"),
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("n_occurrences", F.lit(0)).alias("n_occurrences"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


def sql_phrase_occurrences(rel: str, phrases: list[str]) -> str:
    """DuckDB mirror of :func:`phrase_occurrences` (same normalization,
    same positional joins; posexplode is 0-based so the 1-based
    generate_series subscript is shifted to match)."""
    from de_project_sprint_etl_spark.functions.text import SQL_NORM, py_norm_text

    def q(s: str) -> str:  # SQL string literal: escape embedded quotes
        return s.replace("'", "''")

    norm = {p: py_norm_text(p) for p in phrases}
    terms = sorted({w for np_ in norm.values() for w in np_.split()})
    in_list = ", ".join(f"'{q(t)}'" for t in terms) or "''"
    branches = []
    for phrase in phrases:
        ws = norm[phrase].split()
        if not ws:  # empty-normalizing phrase: zero-count row (total fn)
            branches.append(
                f"SELECT '{q(phrase)}' AS phrase,"
                f" CAST(0 AS BIGINT) AS n_docs,"
                f" CAST(0 AS BIGINT) AS n_occurrences"
            )
            continue
        joins = []
        for i, w in enumerate(ws[1:], start=1):
            joins.append(
                f"JOIN post t{i} ON t{i}.doc = t0.doc"
                f" AND t{i}.term = '{q(w)}' AND t{i}.pos = t0.pos + {i}"
            )
        branches.append(
            f"""SELECT '{q(phrase)}' AS phrase,
       CAST(COALESCE(COUNT(DISTINCT t0.doc), 0) AS BIGINT) AS n_docs,
       CAST(COALESCE(COUNT(*), 0) AS BIGINT) AS n_occurrences
FROM post t0 {' '.join(joins)}
WHERE t0.term = '{q(ws[0])}'"""
        )
    return f"""
WITH tk AS (
  SELECT doc_id AS doc,
         STRING_SPLIT({SQL_NORM.format(c='text')}, ' ') AS tks
  FROM {rel}),
post AS (
  SELECT doc, tks[CAST(u.i AS INT)] AS term, CAST(u.i - 1 AS BIGINT) AS pos
  FROM tk, UNNEST(generate_series(1, len(tks))) u(i)
  WHERE tks[CAST(u.i AS INT)] IN ({in_list}))
{' UNION ALL '.join(branches)}
"""
