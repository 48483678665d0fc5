"""Text analysis over document tables: normalization, tokenization,
quality scoring, language ID, fingerprinting.

All column-level helpers are pure Catalyst expressions (whole-stage
codegen, no UDFs), so they vectorize over a 100 TB documents table and
their semantics can be mirrored exactly in the DuckDB oracle SQL.

Cross-engine determinism: the shared 64-bit hash is
``conv(substr(md5(x),1,15),16,10)`` — 60 bits of the md5 digest — which
DuckDB reproduces as ``CAST('0x'||SUBSTR(md5(x),1,15) AS BIGINT)``
(verified bit-identical).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Stopword lists for the n-gram/stopword language-ID heuristic. Tiny on
# purpose: the heuristic is "which language's function words dominate",
# not a trained model.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "nicht", "mit", "auf"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "pour", "dans"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "los"),
}

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space
# symbol — the shape GPT-style byte-pair pre-splitting produces.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def h64(col: Column | str, seed: int | None = None) -> Column:
    """Shared deterministic 60-bit hash (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}|"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_h64(expr: str, seed: int | None = None) -> str:
    """DuckDB rendering of :func:`h64` — keep in lockstep."""
    if seed is not None:
        expr = f"CONCAT('{seed}|', {expr})"
    return f"CAST(CONCAT('0x', SUBSTR(md5({expr}), 1, 15)) AS BIGINT)"


def norm_text(col: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, collapse runs, trim
    — the canonical form used by dedup keys and fingerprints.

    ONE regex pass on purpose (r6): replacing each run of
    non-alphanumerics with a single space is output-identical to the
    historical strip-then-collapse two-pass form — both yield the
    ``[a-z0-9]+`` tokens joined by single spaces — but halves the regex
    work, and normalization is the dominant CPU of the exact-dedup
    family at scale (sf1 profile: 1.8 s of exact_dedup's 2.0 s was this
    expression). Dropping ``\\s`` from the class also removes the one
    cross-engine divergence the old form had (Java/RE2 treat ``\\s`` as
    ASCII, Python as Unicode); equivalence is pinned by a hypothesis
    property test against the two-pass reference."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


SQL_NORM = "TRIM(REGEXP_REPLACE(LOWER({c}), '[^a-z0-9]+', ' ', 'g'))"


def py_norm_text(s: str) -> str:
    """Driver-side twin of :func:`norm_text` / ``SQL_NORM`` for
    normalizing QUERY inputs (e.g. search phrases) with exactly the
    corpus tokenizer's rules — keep all three in lockstep."""
    import re

    return re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()


def tokens(col: Column | str) -> Column:
    return F.split(norm_text(col), " ")


SQL_TOKENS = f"STRING_SPLIT({SQL_NORM}, ' ')"


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting + quality scoring, one projection (no shuffle).

    Columns: n_chars, n_tokens (whitespace), n_bpe_tokens (BPE-ish
    regex), avg_token_len, punct_ratio, digit_ratio, stopword_ratio,
    quality_score (bounded composite in [0,1], monotone in "looks like
    prose").
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", ""))
    n_digit = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*LANG_STOPWORDS["en"]))
    )
    avg_len = F.when(n_tok > 0, F.length(F.concat_ws("", toks)) / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, n_digit / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    quality = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0))) * 0.2
        + (1.0 - F.least(digit_ratio * 4.0, F.lit(1.0))) * 0.1
    )
    return docs.select(
        "*",
        n_chars.alias("stat_n_chars"),
        n_tok.alias("n_tokens"),
        F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), 0)).alias(
            "n_bpe_tokens"
        ),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality_score"),
    )


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: per language, count token hits against
    its function-word list; argmax with deterministic lexicographic
    tiebreak. Pure expressions — no shuffle, no UDF."""
    toks = tokens(F.col(text_col))
    # greatest() over (hits, lang) structs: argmax on hits, ties broken
    # toward the lexicographically greatest lang code (mirrored by the
    # oracle's CASE order fr > es > en > de).
    def hit_filter(ws: tuple[str, ...]):
        # closure (not a default arg: a 2-param lambda would make
        # F.filter pass the element index as the second argument)
        return lambda t: t.isin(*ws)

    scores = [
        F.struct(
            F.size(F.filter(toks, hit_filter(words))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return docs.select(
        "*",
        best["lang"].alias("lang_pred"),
        best["hits"].cast("long").alias("lang_hits"),
    )


def token_histogram(docs: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Global top-k token frequencies — the vocabulary-building pass of
    a tokenizer/BPE training pipeline. One explode + one
    partial-combined groupBy; the final top-k is a TakeOrdered (per-
    partition partial top-k, then a k-row merge on the driver — never a
    global sort of the vocabulary). Ties broken by token ascending.

    Output: ``tok, n``.
    """
    toks = docs.select(
        F.explode_outer(tokens(F.col(text_col))).alias("tok")
    ).filter(F.length("tok") > 0)
    agg = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    return agg.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(k)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, int],
    default_rate: int = 100,
    id_col: str = "doc_id",
    salt: str = "smp",
) -> DataFrame:
    """Deterministic per-language downsampling: keep a row iff
    ``h64(salt|id) mod 100 < rate[lang_pred]`` — the standard way a
    training mix rebalances dominant languages. Hash-gated (not
    ``sample()``) on purpose: the decision is a pure function of the id,
    so it is reproducible across runs/engines, stable under
    repartitioning, and oracle-checkable. Map-only — no shuffle, no RNG
    state.

    Input must carry ``lang_pred`` (see :func:`with_lang_id`); ``rates``
    maps language codes to percent kept (0–100).
    """
    gate = h64(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))) % 100
    rate = F.lit(default_rate)
    for lang, r in sorted(rates.items()):
        rate = F.when(F.col("lang_pred") == lang, F.lit(r)).otherwise(rate)
    return docs.filter(gate < rate)


def tfidf_topk_terms(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Per-document top-k TF-IDF terms (keyword extraction / doc
    representation). Two partial-combined aggregations — (doc, term)
    term frequencies, then term document frequencies — a broadcast of
    the 1-row corpus count, and a per-doc top-k window partitioned by
    the doc id (state scales with k, not vocabulary). ``idf =
    ln(N/df)``; scores rounded to 6 decimals, ties broken by term.

    Output: ``doc_id, tok, tf, df, tfidf, rank``.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode_outer(tokens(F.col(text_col))).alias("tok"),
    ).filter(F.length("tok") > 0)
    tf = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("id").alias("doc_id"),
            "tok",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("__n").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "tok", "tf", "df", "tfidf", "rank")
    )


def with_shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Attach a deduplicated shingle array column ``shingle``."""
    return (
        docs.withColumn("__toks", tokens(F.col(text_col)))
        .withColumn(
            "shingle_arr",
            # guard: sequence(0, -1) is a DESCENDING sequence in Spark,
            # so short docs need an explicit empty-array branch
            F.array_distinct(
                F.expr(
                    f"CASE WHEN size(__toks) >= {n} THEN "
                    f"transform(sequence(0, size(__toks) - {n}),"
                    f" i -> concat_ws(' ', slice(__toks, i + 1, {n}))) "
                    f"ELSE array() END"
                )
            ),
        )
        .drop("__toks")
    )


def sql_shingles(text_expr: str, n: int = 3) -> str:
    """DuckDB mirror of :func:`with_shingles` (1-based list slicing)."""
    toks = SQL_TOKENS.format(c=text_expr)
    return (
        f"list_distinct(list_transform(range(1, GREATEST(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' ')))"
    )


def with_fingerprints(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Document fingerprints: md5 of the normalized text, the shared
    64-bit content hash, and minhash-1 (min shingle hash — a 1-component
    MinHash signature, the rolling-hash fingerprint family)."""
    normed = norm_text(F.col(text_col))
    out = with_shingles(docs, text_col, n)
    return out.select(
        "*",
        F.md5(normed).alias("fp_md5"),
        h64(normed).alias("fp_h64"),
        F.array_min(F.transform(F.col("shingle_arr"), lambda s: h64(s, seed=0))).alias(
            "fp_minhash1"
        ),
    ).drop("shingle_arr")


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    size: int = 500,
    overlap: int = 100,
) -> DataFrame:
    """Split each document into fixed-width character chunks with
    overlap — the context-window packing step of a training pipeline
    (no reference analog; its unit is the whole CSV row).

    Chunk ``i`` covers ``[i*stride, i*stride + size)`` with
    ``stride = size - overlap``; every doc yields at least one chunk,
    and the chunk count is ``ceil((len - overlap) / stride)`` so the
    final chunk is the only one shorter than ``size`` and no chunk
    starts beyond the text.

    Scale shape: ``explode(sequence(...))`` is a narrow map-only
    operation — chunking a 100 TB corpus is one codegen'd scan, no
    shuffle, and the fan-out factor (~len/stride) is bounded per row,
    so partition sizes grow predictably.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap
    n = F.length(F.col(text_col))
    n_chunks = F.greatest(
        F.lit(1), F.expr(f"(length({text_col}) - {overlap} + {stride - 1}) div {stride}")
    ).cast("int")
    return (
        docs.withColumn("__n_chunks", n_chunks)
        .select(
            "*",
            F.explode(F.sequence(F.lit(0), F.col("__n_chunks") - 1)).alias("chunk_id"),
        )
        .select(
            *[c for c in docs.columns if c != text_col],
            "chunk_id",
            (F.col("chunk_id") * stride).alias("chunk_start"),
            F.substring(F.col(text_col), F.col("chunk_id") * stride + 1, size).alias(
                "chunk_text"
            ),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
    )


def sql_chunk_documents(
    rel: str, text_col: str = "text", size: int = 500, overlap: int = 100
) -> str:
    """DuckDB mirror of :func:`chunk_documents` (same chunk-count
    formula; ``substr`` is 1-based on both engines)."""
    stride = size - overlap
    return f"""
WITH n AS (
  SELECT *, GREATEST(1, (LENGTH({text_col}) - {overlap} + {stride - 1}) // {stride})
            AS __n_chunks
  FROM {rel}),
c AS (
  SELECT n.*, CAST(u.i AS INT) AS chunk_id
  FROM n, UNNEST(range(0, __n_chunks)) AS u(i))
SELECT doc_id, lang, source, n_chars, chunk_id,
       CAST(chunk_id * {stride} AS INT) AS chunk_start,
       SUBSTR({text_col}, chunk_id * {stride} + 1, {size}) AS chunk_text,
       CAST(LENGTH(SUBSTR({text_col}, chunk_id * {stride} + 1, {size})) AS INT)
         AS chunk_len
FROM c
"""


def with_repetition(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition / boilerplate signals per document: distinct-token
    ratio and the fraction of duplicated token trigrams (the
    Gopher-style "repetitious document" filters). Pure array
    expressions over the token stream — map-only, no shuffle, no
    Python; a 100 TB corpus pays one codegen'd scan.
    """
    toks = tokens(F.col(text_col))
    tris = F.expr(
        "CASE WHEN size(__toks) >= 3 THEN "
        "transform(sequence(0, size(__toks) - 3),"
        " i -> concat_ws(' ', slice(__toks, i + 1, 3))) "
        "ELSE array() END"
    )
    return (
        docs.withColumn("__toks", toks)
        .withColumn("__tris", tris)
        .select(
            "*",
            F.size("__toks").alias("n_tokens"),
            F.round(
                F.size(F.array_distinct("__toks"))
                / F.greatest(F.size("__toks"), F.lit(1)),
                6,
            ).alias("distinct_token_ratio"),
            F.when(F.size("__tris") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    1 - F.size(F.array_distinct("__tris")) / F.size("__tris"), 6
                )
            )
            .alias("dup_trigram_frac"),
        )
        .drop("__toks", "__tris")
    )


def sql_repetition(rel: str, text_col: str = "text") -> str:
    """DuckDB mirror of :func:`with_repetition`."""
    toks = SQL_TOKENS.format(c=text_col)
    tris = (
        f"CASE WHEN len(__toks) >= 3 THEN "
        f"list_transform(range(1, len(__toks) - 1), "
        f"i -> array_to_string(__toks[i:i+2], ' ')) "
        f"ELSE [] END"
    )
    return f"""
WITH t AS (SELECT *, {toks} AS __toks FROM {rel}),
x AS (SELECT *, {tris} AS __tris FROM t)
SELECT doc_id, CAST(len(__toks) AS INT) AS n_tokens,
       ROUND(len(list_distinct(__toks)) / GREATEST(len(__toks), 1), 6)
         AS distinct_token_ratio,
       CASE WHEN len(__tris) = 0 THEN 0.0
            ELSE ROUND(1 - len(list_distinct(__tris)) / CAST(len(__tris) AS DOUBLE), 6)
       END AS dup_trigram_frac
FROM x
"""


# PII patterns, restricted to syntax Java regex and RE2 share (no
# lookaround, no backreferences) so the Spark and DuckDB forms are the
# same string. Order matters: IPs are redacted before phone numbers so
# a dotted quad isn't half-eaten as a digit run.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d -]{7,}\d", "<PHONE>"),
)


def redact_pii(col: Column | str) -> Column:
    """Replace emails, IPv4 addresses, and phone-like digit runs with
    typed placeholder tags. Pure ``regexp_replace`` chain — map-only,
    codegen'd, no shuffle at any corpus size."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


def sql_redact_pii(expr: str) -> str:
    """DuckDB mirror of :func:`redact_pii` (same patterns, 'g' flag;
    backslashes stay single — DuckDB string literals are
    standard-conforming)."""
    for pat, tag in PII_PATTERNS:
        expr = f"REGEXP_REPLACE({expr}, '{pat.replace(chr(39), chr(39) * 2)}', '{tag}', 'g')"
    return expr


def with_token_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon entropy of the per-document token distribution (bits) —
    the cheap perplexity proxy: low entropy = repetitive/templated text,
    high entropy = diverse vocabulary. Complements
    :func:`with_repetition` (which counts exact repeats; entropy also
    sees skewed-but-not-identical distributions).

    Pure array expressions: for each distinct token, its in-doc
    frequency is one ``filter`` pass over the token array — O(n·d) per
    doc (n tokens, d distinct), fine for document-sized n and free of
    shuffles at any corpus size.
    """
    return (
        docs.withColumn("__toks", tokens(F.col(text_col)))
        .withColumn(
            "token_entropy",
            F.round(
                F.expr(
                    "CASE WHEN size(__toks) = 0 THEN 0.0 ELSE "
                    "aggregate(array_distinct(__toks), 0.0d, (acc, tk) -> "
                    " acc - (size(filter(__toks, x -> x = tk)) / CAST(size(__toks) AS DOUBLE))"
                    "       * log2(size(filter(__toks, x -> x = tk)) / CAST(size(__toks) AS DOUBLE))"
                    ") END"
                ),
                6,
            ),
        )
        .drop("__toks")
    )


def sql_token_entropy(rel: str, text_col: str = "text") -> str:
    """DuckDB mirror of :func:`with_token_entropy` (same left-fold over
    the distinct-token list, same log2)."""
    toks = SQL_TOKENS.format(c=text_col)
    return f"""
WITH t AS (SELECT doc_id, {toks} AS __toks FROM {rel})
SELECT doc_id,
       CASE WHEN len(__toks) = 0 THEN 0.0 ELSE ROUND(
         list_reduce(
           list_prepend(0.0, list_transform(list_distinct(__toks), tk ->
             -(len(list_filter(__toks, x -> x = tk)) / CAST(len(__toks) AS DOUBLE))
              * log2(len(list_filter(__toks, x -> x = tk)) / CAST(len(__toks) AS DOUBLE)))),
           (acc, v) -> acc + v), 6) END AS token_entropy
FROM t
"""


# Gopher-style document quality rules (Rae et al. 2021, §A1.1). The
# paper's thresholds assume web prose; the *rules* are what matters —
# word-count bounds, mean-word-length bounds, required stopword
# evidence, and a repetitiveness cut — and each threshold is a
# parameter here. All pure array/length expressions: map-only, no
# shuffle at any corpus size.
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 80
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_STOP_HITS = 1
GOPHER_MIN_DISTINCT_RATIO = 0.4


def with_gopher_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher rule statistics + the composite keep flag.

    Columns: n_words, mean_word_len, stop_hits (distinct English
    function words present), distinct_ratio (vocabulary diversity — the
    repetition cut), gopher_keep.
    """
    toks = tokens(F.col(text_col))
    n_words = F.size(toks)
    mean_len = F.when(
        n_words > 0, F.length(F.concat_ws("", toks)) / n_words
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]]),
        )
    )
    distinct_ratio = F.when(
        n_words > 0, F.size(F.array_distinct(toks)) / n_words
    ).otherwise(F.lit(0.0))
    keep = (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_len.between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        & (stop_hits >= GOPHER_MIN_STOP_HITS)
        & (distinct_ratio >= GOPHER_MIN_DISTINCT_RATIO)
    )
    return docs.select(
        "*",
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        stop_hits.alias("stop_hits"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        keep.alias("gopher_keep"),
    )


def sql_gopher_stats(rel: str, text_col: str = "text") -> str:
    """DuckDB mirror of :func:`with_gopher_stats`. ``list_intersect``
    de-duplicates like Spark's array_intersect over a distinct array;
    the keep predicate repeats the same bounds."""
    toks = SQL_TOKENS.format(c=text_col)
    stops = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    return f"""
WITH t AS (SELECT *, {toks} AS __toks FROM {rel}),
s AS (
  SELECT *,
         CAST(len(__toks) AS INT) AS n_words,
         CASE WHEN len(__toks) > 0
              THEN len(array_to_string(__toks, '')) / CAST(len(__toks) AS DOUBLE)
              ELSE 0.0 END AS __mean_len,
         CAST(len(list_intersect(list_distinct(__toks), [{stops}])) AS INT)
           AS stop_hits,
         CASE WHEN len(__toks) > 0
              THEN len(list_distinct(__toks)) / CAST(len(__toks) AS DOUBLE)
              ELSE 0.0 END AS __distinct_ratio
  FROM t)
SELECT doc_id, n_words,
       ROUND(__mean_len, 6) AS mean_word_len,
       stop_hits,
       ROUND(__distinct_ratio, 6) AS distinct_ratio,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
        AND __mean_len BETWEEN {GOPHER_MIN_MEAN_WORD_LEN} AND {GOPHER_MAX_MEAN_WORD_LEN}
        AND stop_hits >= {GOPHER_MIN_STOP_HITS}
        AND __distinct_ratio >= {GOPHER_MIN_DISTINCT_RATIO}) AS gopher_keep
FROM s
"""
