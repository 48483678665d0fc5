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
    — the canonical form used by dedup keys and fingerprints."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", " "), r"\s+", " "))


SQL_NORM = (
    "TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER({c}), '[^a-z0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)


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
