"""Training-data-pipeline + reshaping operators, round 3 additions.

Five op families the earlier rounds didn't cover, each Spark-first with
an exact DuckDB oracle:

- deterministic dataset split (train/val/test) — content-hash bucketing,
  the reproducible alternative to ``randomSplit`` (whose assignment
  depends on partitioning). md5 is computed engine-side on both systems
  and the first 8 hex chars interpreted as an integer → bucket 0..99.
  Pure narrow projection: no shuffle, scales linearly at 100 TB.
- pivot (long→wide): one shuffle (groupBy year), pivot values pinned
  up-front so Spark skips its values-discovery job — the form to use at
  scale when the pivot domain is known (here: order status F/O/P).
- unpivot/melt (wide→long): zero-shuffle row explosion via
  ``DataFrame.unpivot`` (Catalyst Expand — each input row emits 4
  measure rows map-side; no exchange anywhere).
- edit-distance near-dup verification: suffix-block candidate pairs
  (the mutant corpus drops *leading* tokens, so originals and mutants
  share suffixes), length-band prefilter, then exact
  ``levenshtein`` only on survivors — the standard
  block → cheap-filter → expensive-verify shape; all JVM expressions.
- time-range rolling window (RANGE frame): per-user 1-hour trailing
  event-value sum ordered by event time — the windowed analytics form
  that needs a RANGE (not ROWS) frame; one shuffle on user_id. Values
  go through DECIMAL so the frame sum is addition-order independent
  across engines.

Reference parity note: none of these exist in the reference (see
SURVEY.md §2.12 — its SQL surface stops at equi/range joins and plain
grouped aggregation); they are extension ops for the 100 TB
training-data use case, same as plans/llm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_project_sprint_etl_spark.functions.text import SQL_NORM, norm_text
from de_project_sprint_etl_spark.plans.llm import SQL_DOCS_MUT, docs_with_mutants
from de_project_sprint_etl_spark.plans.registry import register
from de_project_sprint_etl_spark.plans.testdata import events_df, t

# --- deterministic dataset split -------------------------------------------

TRAIN_PCT, VAL_PCT = 80, 10  # remaining 10% = test


def split_bucket(col: F.Column) -> F.Column:
    """Stable 0..99 bucket from md5 of the column's string form.

    conv() parses the first 8 hex chars (32 bits — fits a BIGINT, no
    overflow wrap ambiguity) identically to DuckDB's '0x..' cast."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % 100
    )


@register(
    "dataset_split_assign",
    f"""
SELECT doc_id,
       CAST(bucket AS INT) AS bucket,
       CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
            WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 100 AS bucket
      FROM documents) b
""",
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by content-key hash —
    reproducible across runs, partitionings, and engines (unlike
    randomSplit, whose per-row assignment depends on partition layout).
    Narrow projection only: the 100 TB cost is one scan."""
    bucket = split_bucket(F.col("doc_id"))
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        bucket.cast("int").alias("bucket"),
        F.when(bucket < TRAIN_PCT, F.lit("train"))
        .when(bucket < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


@register(
    "dataset_split_sizes",
    f"""
SELECT split, COUNT(*) AS n_docs
FROM (SELECT CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
                  WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 100 AS bucket
            FROM documents) b) s
GROUP BY split
""",
)
def q_dataset_split_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-size audit over the assignment above (the check a pipeline
    runs before training: did the hash split land near 80/10/10?)."""
    return (
        q_dataset_split(spark, sf_dir)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --- pivot / unpivot --------------------------------------------------------

_DEC_SUM = "CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE)"
ORDER_STATUSES = ("F", "O", "P")


@register(
    "pivot_status_revenue",
    f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       {", ".join(
           _DEC_SUM.format(c=f"CASE WHEN o_orderstatus = '{s}' THEN o_totalprice END")
           + f" AS rev_{s.lower()}"
           for s in ORDER_STATUSES
       )}
FROM orders
GROUP BY 1
""",
)
def q_pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: revenue per year × order status as one row per
    year, lowered to conditional aggregation (one SUM(CASE WHEN) per
    pinned status value) — ONE hash-aggregate shuffle on year, same
    cost as a plain groupBy at any scale.

    Deliberately NOT ``groupBy().pivot(col, values).agg()``: even with
    pinned values Spark lowers that to two stacked aggregates (shuffle
    on (year, status), then shuffle on year). Conditional aggregation
    is the strictly-better plan when the pivot domain is known, and
    pinning the domain is the only pivot form that's sane at 100 TB
    anyway (unpinned pivot adds a values-discovery pass over the
    corpus). Plan shape pinned in tests/test_plans.py."""
    return (
        t(spark, sf_dir, "orders")
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            *[
                F.sum(
                    F.when(
                        F.col("o_orderstatus") == s,
                        F.col("o_totalprice").cast("decimal(18,2)"),
                    )
                )
                .cast("double")
                .alias(f"rev_{s.lower()}")
                for s in ORDER_STATUSES
            ]
        )
    )


_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "unpivot_lineitem_measures",
    "\nUNION ALL\n".join(
        f"SELECT l_orderkey, l_linenumber, '{m}' AS measure,"
        f" CAST({m} AS DOUBLE) AS value FROM lineitem WHERE l_orderkey % 10 = 0"
        for m in _MEASURES
    ),
)
def q_unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of the four lineitem measures via
    ``DataFrame.unpivot`` — compiles to a single map-side Expand (4
    output rows per input row, zero shuffles, no UNION re-scan; the
    oracle's UNION ALL form scans the table 4 times, ours once). The
    %10 key filter only bounds the differential-compare row count; the
    melt itself is scale-free."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 10 == 0)
        .select("l_orderkey", "l_linenumber", *_MEASURES)
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            [F.col(m).cast("double").alias(m) for m in _MEASURES],
            "measure",
            "value",
        )
    )


# --- edit-distance near-dup verification ------------------------------------

_SUFFIX = 16  # suffix block width
_LEN_BAND = 40  # candidate length-difference cap
_LEV_MAX = 30  # accept pairs within this edit distance

_SQL_LEV_PAIRS = f"""
WITH mut AS ({SQL_DOCS_MUT}),
n AS (SELECT doc_id, {SQL_NORM.format(c="text")} AS ntext FROM mut)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.ntext, b.ntext) AS INT) AS edit_dist
FROM n a JOIN n b
  ON right(a.ntext, {_SUFFIX}) = right(b.ntext, {_SUFFIX})
 AND a.doc_id < b.doc_id
WHERE abs(length(a.ntext) - length(b.ntext)) <= {_LEN_BAND}
  AND levenshtein(a.ntext, b.ntext) <= {_LEV_MAX}
"""


@register("levenshtein_near_dup", _SQL_LEV_PAIRS)
def q_levenshtein_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs over the mutant corpus:
    block on the last {16} normalized chars (mutants drop LEADING
    tokens, so true pairs share suffixes), prefilter by length band,
    then exact levenshtein ≤ {30} on survivors only.

    Scale shape: the equi-join on the suffix key is a hash join (no
    all-pairs), the length band is a cheap JVM filter ahead of the
    O(len²) DP, and levenshtein runs only on candidates — the
    block → filter → verify cascade every fuzzy-match pipeline uses.
    All engine-side expressions; no Python."""
    n = docs_with_mutants(spark, sf_dir).select(
        "doc_id", norm_text(F.col("text")).alias("ntext")
    )
    a = n.select(
        F.col("doc_id").alias("id_a"),
        F.col("ntext").alias("text_a"),
        F.expr(f"right(ntext, {_SUFFIX})").alias("blk"),
        F.length("ntext").alias("len_a"),
    )
    b = n.select(
        F.col("doc_id").alias("id_b"),
        F.col("ntext").alias("text_b"),
        F.expr(f"right(ntext, {_SUFFIX})").alias("blk"),
        F.length("ntext").alias("len_b"),
    )
    return (
        a.join(b, "blk")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= _LEN_BAND)
        )
        .withColumn(
            "edit_dist", F.levenshtein(F.col("text_a"), F.col("text_b")).cast("int")
        )
        .filter(F.col("edit_dist") <= _LEV_MAX)
        .select("id_a", "id_b", "edit_dist")
    )


# --- time-range rolling window ----------------------------------------------

_HOUR_US = 3_600_000_000


@register(
    "range_window_user_value",
    f"""
SELECT user_id, event_id, ts_us,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
            PARTITION BY user_id ORDER BY ts_us
            RANGE BETWEEN {_HOUR_US} PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS value_1h
FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events) e
""",
)
def q_range_window_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user event-value sum — a RANGE frame over
    event time (rows at identical timestamps share a frame, unlike a
    ROWS frame). One shuffle on user_id, streaming frame evaluation
    within each partition; values aggregate as DECIMAL so the result
    is addition-order independent (double summation order differs
    between engines)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_HOUR_US, Window.currentRow)
    )
    return events_df(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    ).select(
        "user_id",
        "event_id",
        "ts_us",
        F.sum("v").over(w).cast("double").alias("value_1h"),
    )


# --- incremental dedup (increment vs snapshot) ------------------------------

INC_OFFSET = 200_000

_SQL_INC_DEDUP = f"""
WITH snap_keys AS (
  SELECT DISTINCT md5({SQL_NORM.format(c="text")}) AS dup_key FROM documents),
increment AS (
  SELECT doc_id + {INC_OFFSET} AS doc_id, text
  FROM documents WHERE doc_id % 7 = 0            -- re-submissions (dups)
  UNION ALL
  SELECT doc_id, text FROM ({SQL_DOCS_MUT}) m
  WHERE doc_id >= {100_000}                      -- genuinely-new mutants
)
SELECT i.doc_id, md5({SQL_NORM.format(c="i.text")}) AS dup_key
FROM increment i
WHERE md5({SQL_NORM.format(c="i.text")}) NOT IN (SELECT dup_key FROM snap_keys)
"""


@register("incremental_exact_dedup", _SQL_INC_DEDUP)
def q_incremental_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a new increment (re-submitted docs + new
    mutants) is deduplicated AGAINST the existing snapshot corpus by
    content digest — a left-anti join on the digest, so only the
    increment shuffles and only digests (32 bytes/row) of the snapshot
    move. This is the daily-ingest shape at 100 TB: the snapshot's
    digest set is a materialized by-product of its own exact-dedup
    pass, and each day's increment anti-joins it instead of
    re-scanning the corpus. Re-submitted texts are dropped; mutant
    texts (near-dups, different digest) survive — exactness is the
    contract, near-dup removal is the LSH family's job."""
    from de_project_sprint_etl_spark.functions.text import norm_text
    from de_project_sprint_etl_spark.plans.llm import docs_fanned

    docs = docs_fanned(spark, sf_dir)
    snap_keys = docs.select(
        F.md5(norm_text(F.col("text"))).alias("dup_key")
    ).distinct()
    resub = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + INC_OFFSET).alias("doc_id"), "text"
    )
    new = docs_with_mutants(spark, sf_dir).filter(F.col("doc_id") >= 100_000)
    increment = resub.unionByName(new)
    return (
        increment.withColumn("dup_key", F.md5(norm_text(F.col("text"))))
        .join(snap_keys, "dup_key", "left_anti")
        .select("doc_id", "dup_key")
    )


# --- per-source capping + quality-decile filtering --------------------------

_SOURCE_CAP = 20


@register(
    "source_capped_sample",
    f"""
SELECT doc_id, source,
       CAST(ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id) AS INT) AS source_rank
FROM documents
QUALIFY source_rank <= {_SOURCE_CAP}
""",
)
def q_source_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/source capping: keep at most N docs per source (longest
    first, id tiebreak) — the anti-domination guard every web-scale
    training mix applies so one crawl domain can't swamp the corpus.
    One shuffle on source; rank-and-filter streams within each
    partition (no per-source materialization)."""
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars")
        .withColumn("source_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("source_rank") <= _SOURCE_CAP)
        .select("doc_id", "source", "source_rank")
    )


@register(
    "quality_decile_filter",
    """
SELECT doc_id, lang, ROUND(pr, 6) AS length_pct_rank
FROM (SELECT doc_id, lang,
             PERCENT_RANK() OVER (PARTITION BY lang
                  ORDER BY n_chars, doc_id) AS pr
      FROM documents) r
WHERE pr >= 0.1
""",
)
def q_quality_decile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language bottom-decile drop by length percentile — quality
    filtering relative to each language's own distribution (an absolute
    threshold over-prunes low-resource languages). percent_rank is one
    shuffle on lang + a streaming rank pass; ties broken by doc_id so
    the cut is deterministic on both engines."""
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.1)
        .select("doc_id", "lang", F.round("pr", 6).alias("length_pct_rank"))
    )


# --- token-budget sequence packing ------------------------------------------

_PACK_BUDGET = 4096


@register(
    "pack_sequences",
    f"""
SELECT doc_id, lang, n_tokens,
       CAST(FLOOR((cum - n_tokens) / {_PACK_BUDGET}) AS INT) AS bin_id
FROM (SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM (SELECT doc_id, lang,
                   len(STRING_SPLIT({SQL_NORM.format(c="text")}, ' ')) AS n_tokens
            FROM documents) tc) c
""",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs (in stable doc_id order, per
    language) to training-context bins of ~{4096} tokens via a running
    token-count window — bin_id = floor(tokens-before-this-doc /
    budget). The streaming-window formulation packs without any
    per-bin state or driver loop: one shuffle on lang, one ordered
    pass. (Greedy first-fit would need stateful iteration; the
    running-sum form is the scalable batch shape and is what
    sequence-packing pipelines actually ship.)"""
    from de_project_sprint_etl_spark.functions.text import tokens

    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"))
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.floor((F.col("cum") - F.col("n_tokens")) / _PACK_BUDGET)
            .cast("int")
            .alias("bin_id"),
        )
    )


# --- packing-efficiency curve (round 8) ---------------------------------------

#: candidate training context lengths swept by the packing curve
PACK_CURVE_LENS = (128, 256, 512, 1024, 2048)


def _chunks_sql(L: int) -> str:
    """Per-row ceil(nt / L) in exact integer arithmetic shared verbatim
    by both engines: the dividend is made exactly divisible before the
    one double division (quotient < 2^53 ⇒ exact), so no FLOOR-boundary
    ulp risk — the scaled_sql lesson applied to ceiling division."""
    return (
        f"(CAST((nt - (nt % {L})) / {L} AS BIGINT)"
        f" + (CASE WHEN nt % {L} > 0 THEN 1 ELSE 0 END))"
    )


def _sql_pack_efficiency() -> str:
    sums = ", ".join(
        f"CAST(COALESCE(SUM({_chunks_sql(L)}), 0) AS BIGINT) AS nc_{i}"
        for i, L in enumerate(PACK_CURVE_LENS)
    )
    branches = " UNION ALL ".join(
        f"SELECT CAST({L} AS BIGINT) AS max_len, n_docs, total_tokens,"
        f" nc_{i} AS n_chunks, nc_{i} * {L} AS padded_tokens,"
        f" ROUND(1.0 - CAST(total_tokens AS DOUBLE)"
        f" / GREATEST(nc_{i} * {L}, 1), 6) AS waste_frac FROM s"
        for i, L in enumerate(PACK_CURVE_LENS)
    )
    return f"""
WITH tc AS (SELECT CAST(len(STRING_SPLIT({SQL_NORM.format(c="text")}, ' '))
                   AS BIGINT) AS nt
            FROM documents),
s AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(SUM(nt), 0) AS BIGINT) AS total_tokens,
         {sums}
  FROM tc)
{branches}
"""


@register("pack_efficiency_curve", _sql_pack_efficiency())
def q_pack_efficiency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length tuning curve for sequence packing (the sibling of
    pack_sequences, and the fourth member of the tuning-artifact family
    with dedup_threshold_sensitivity / lsh_band_tuning /
    ivf_nprobe_recall_curve): for each candidate max_len, the chunk
    count a chunk-and-pad packing would produce and the padding waste
    fraction — the number a training-data pipeline reads before fixing
    its context length. ONE narrow pass over the corpus (token counts),
    one conditional aggregate; all chunk math is exact shared-text
    integer arithmetic, so the curve hashes identically cross-engine.
    At 100 TB this is a map-side aggregate — no shuffle grows with the
    corpus beyond the single agg row."""
    from de_project_sprint_etl_spark.functions.text import tokens

    tc = (
        t(spark, sf_dir, "documents")
        .select(F.size(tokens(F.col("text"))).cast("long").alias("nt"))
    )
    row = tc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("nt"), F.lit(0)).cast("long").alias("total_tokens"),
        *[
            F.coalesce(F.sum(F.expr(_chunks_sql(L))), F.lit(0))
            .cast("long")
            .alias(f"nc_{i}")
            for i, L in enumerate(PACK_CURVE_LENS)
        ],
    )
    structs = [
        F.struct(
            F.lit(L).cast("long").alias("max_len"),
            F.col("n_docs"),
            F.col("total_tokens"),
            F.col(f"nc_{i}").alias("n_chunks"),
            (F.col(f"nc_{i}") * F.lit(L)).cast("long").alias("padded_tokens"),
            F.round(
                F.lit(1.0)
                - F.col("total_tokens").cast("double")
                / F.greatest(F.col(f"nc_{i}") * F.lit(L), F.lit(1)),
                6,
            ).alias("waste_frac"),
        )
        for i, L in enumerate(PACK_CURVE_LENS)
    ]
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


# --- rank-family window functions -------------------------------------------


@register(
    "window_rank_functions",
    """
SELECT o_orderkey, o_custkey,
       CAST(NTILE(4) OVER w AS INT) AS spend_quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS spend_pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS spend_cume_dist,
       FIRST_VALUE(o_orderkey) OVER w AS cheapest_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""",
)
def q_window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-family window functions (ntile / percent_rank /
    cume_dist / first_value) in one per-customer pass — one shuffle on
    the partition key, every function evaluated in the same sorted
    frame (Spark fuses same-window functions into one Window node)."""
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).cast("int").alias("spend_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("spend_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("spend_cume_dist"),
        F.first("o_orderkey").over(w).alias("cheapest_order"),
    )


# --- feature engineering (round 3 batch) -----------------------------------


@register(
    "impute_event_values",
    """
WITH masked AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END AS value
  FROM events),
med AS (SELECT event_type, median(value) AS type_median
        FROM masked GROUP BY event_type)
SELECT m.event_id, m.event_type,
       CAST(m.value IS NULL AS BOOLEAN) AS was_missing,
       COALESCE(m.value, med.type_median) AS value_imputed
FROM masked m JOIN med USING (event_type)
""",
)
def q_impute_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation with the per-group median: one
    aggregate pass computes each group's median over the non-null
    values, the group→median map (one row per group — always tiny)
    broadcasts back, and the fill is a map-side COALESCE. The fact
    table is scanned twice but never shuffled. Nulls are synthesized
    deterministically (event_id % 10) since the fixture has none —
    the imputation shape is the op under test."""
    ev = events_df(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 10 == 0, None)
        .otherwise(F.col("value"))
        .alias("value"),
    )
    med = ev.groupBy("event_type").agg(
        F.median("value").alias("type_median")
    )
    return ev.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        F.col("value").isNull().alias("was_missing"),
        F.coalesce("value", "type_median").alias("value_imputed"),
    )


@register(
    "one_hot_event_types",
    """
SELECT event_id, user_id,
       CAST(event_type = 'click' AS INT) AS is_click,
       CAST(event_type = 'view' AS INT) AS is_view,
       CAST(event_type = 'purchase' AS INT) AS is_purchase,
       CAST(event_type = 'signup' AS INT) AS is_signup,
       CAST(event_type = 'error' AS INT) AS is_error
FROM events
""",
)
def q_one_hot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot encoding over a PINNED category vocabulary — pure
    narrow projection (zero shuffle, zero discovery pass; an unpinned
    encoder needs a distinct scan first, same trade as pivot's
    values list)."""
    ev = events_df(spark, sf_dir)
    cats = ["click", "view", "purchase", "signup", "error"]
    return ev.select(
        "event_id",
        "user_id",
        *[
            (F.col("event_type") == c).cast("int").alias(f"is_{c}")
            for c in cats
        ],
    )


from de_project_sprint_etl_spark.functions.text import sql_h64  # noqa: E402

_SQL_FEATURE_HASH = f"""
WITH toks AS (
  SELECT doc_id, unnest(STRING_SPLIT({SQL_NORM.format(c='text')}, ' ')) AS tok
  FROM documents)
SELECT doc_id,
       CAST({sql_h64('tok')} % 64 AS INT) AS feature_bucket,
       COUNT(*) AS n
FROM toks
WHERE tok <> ''
GROUP BY doc_id, CAST({sql_h64('tok')} % 64 AS INT)
"""


@register("feature_hash_docs", _SQL_FEATURE_HASH)
def q_feature_hash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization: token → stable hash → fixed 64-dim
    bucket, counts aggregated per (doc, bucket). No vocabulary build,
    no dictionary broadcast, bounded output width at any corpus size —
    the classic scale answer when a full vocab is too big. Explode +
    one partial-aggregatable shuffle; the hash is the package's shared
    cross-engine 60-bit md5 (functions/text.h64)."""
    from de_project_sprint_etl_spark.functions.text import h64, tokens

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    ).filter(F.col("tok") != "")
    return (
        toks.select(
            "doc_id", (h64(F.col("tok")) % 64).cast("int").alias("feature_bucket")
        )
        .groupBy("doc_id", "feature_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "label_encode_sources",
    """
WITH vocab AS (
  SELECT source,
         CAST(DENSE_RANK() OVER (ORDER BY source) AS INT) - 1 AS source_id
  FROM (SELECT DISTINCT source FROM documents))
SELECT d.doc_id, d.source, v.source_id
FROM documents d JOIN vocab v USING (source)
""",
)
def q_label_encode_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label (dictionary) encoding: distinct category values get dense
    contiguous ids by sorted order — reproducible across runs and
    engines, unlike hash- or arrival-order ids. The vocab is built
    with ONE distinct aggregate (cardinality = #categories, tiny) and
    broadcast back; the single-partition window only ever sees the
    distinct values, never fact rows."""
    docs = t(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    vocab = (
        docs.select("source")
        .distinct()
        .withColumn(
            "source_id",
            (F.dense_rank().over(W.partitionBy().orderBy("source")) - 1).cast(
                "int"
            ),
        )
    )
    return docs.select("doc_id", "source").join(F.broadcast(vocab), "source")


@register(
    "standard_scale_event_values",
    """
WITH m AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
         CAST(SUM(CAST(value AS DECIMAL(18,2))
                  * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ss
  FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type, e.value,
       (e.value - m.s / m.n) / sqrt((m.ss - m.s * m.s / m.n) / (m.n - 1))
         AS value_scaled
FROM events e JOIN m USING (event_type)
""",
)
def q_standard_scale_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard-scaler (per-group z-score) feature normalization: the
    per-type mean/stddev come from ONE exact-decimal moments aggregate
    (order-free, map-side partial — see stats_moments_by_event_type),
    broadcast back as a row-per-group map, and the scaling itself is a
    narrow projection. Two scans, zero fact-table shuffles — the same
    two-pass shape as winsorize. The final double expression is written
    identically in both engines so every scaled value hash-matches."""
    ev = events_df(spark, sf_dir)
    dec = F.col("value").cast("decimal(18,2)")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("ss"),
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    return (
        ev.select("event_id", "event_type", "value")
        .join(F.broadcast(m), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            (
                (F.col("value") - s / n)
                / F.sqrt((ss - s * s / n) / (n - 1))
            ).alias("value_scaled"),
        )
    )


@register(
    "pack_sequences_text",
    f"""
WITH tc AS (
  SELECT doc_id, lang, text,
         len(STRING_SPLIT({SQL_NORM.format(c="text")}, ' ')) AS n_tokens
  FROM documents),
c AS (SELECT doc_id, lang, text, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM tc),
b AS (SELECT doc_id, lang, text, n_tokens,
             CAST(FLOOR((cum - n_tokens) / {_PACK_BUDGET}) AS INT) AS bin_id
      FROM c)
SELECT lang, bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       string_agg(text, '<|eos|>' ORDER BY doc_id) AS packed_text
FROM b GROUP BY lang, bin_id
""",
)
def q_pack_sequences_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing MATERIALIZED: each (lang, bin) emits its training
    row — member docs concatenated in doc_id order with an EOS
    separator, plus audit counts. collect_list is unordered by
    contract, so the struct array is sorted IN-ROW (array_sort on
    (doc_id, text) structs) before joining — the only way a
    distributed concat is reproducible. Same one-shuffle running-sum
    bin assignment as pack_sequences; the group-concat adds one more
    partial-aggregatable pass. Bin payloads are bounded by the token
    budget, so no group can outgrow an executor."""
    from de_project_sprint_etl_spark.functions.text import tokens

    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            "text",
            F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn(
            "bin_id",
            F.floor((F.col("cum") - F.col("n_tokens")) / _PACK_BUDGET).cast(
                "int"
            ),
        )
    )
    return binned.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                lambda x: x["text"],
            ),
            "<|eos|>",
        ).alias("packed_text"),
    )


# --- in-engine supervised training (GD linear model) ------------------------

from de_project_sprint_etl_spark.functions import ml as _ml  # noqa: E402
from de_project_sprint_etl_spark.plans.llm import _sql_text_quality  # noqa: E402

_LINREG_FEATS_SQL = f"""(
  SELECT q.doc_id,
         [1.0, q.stopword_ratio,
          ROUND(LEAST(q.n_tokens / 100.0, 1.0), 6), q.punct_ratio] AS xs,
         CAST(CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS DOUBLE) AS y
  FROM ({_sql_text_quality('documents')}) q
  JOIN documents d USING (doc_id)) fx"""


@register(
    "linreg_quality_train",
    _ml.sql_linreg_gd(_LINREG_FEATS_SQL, n_features=4, iterations=3, lr=0.5),
)
def q_linreg_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine supervised training: a linear quality model (is-English
    from text statistics) fit by 3 full-batch GD steps entirely inside
    the engine, then applied back to every document — the learned-filter
    step of a curation pipeline, with the whole training run replayed
    bit-exactly by the DuckDB oracle (extension op;
    functions/ml.linreg_gd — same engine-replayable iterative tier as
    k-means and PageRank). Features are pre-rounded ratios of exact
    integers, so both engines descend from identical doubles."""
    from de_project_sprint_etl_spark.plans.llm import doc_stats

    # features come from the once-per-corpus attributes table — the
    # learned filter trains on the same scored artifact the planners
    # and reports read
    s = doc_stats(spark, sf_dir)
    feats = s.select(
        "doc_id",
        F.array(
            F.lit(1.0),
            F.col("stopword_ratio"),
            F.round(F.least(F.col("n_tokens") / 100.0, F.lit(1.0)), 6),
            F.col("punct_ratio"),
        ).alias("xs"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).cast("double").alias("y"),
    )
    return _ml.linreg_gd(feats, n_features=4, iterations=3, lr=0.5)


# --- ROC-AUC of the in-engine quality model --------------------------------------

AUC_SCORE_BOUND = 10_000_000


def _sql_quality_auc() -> str:
    from de_project_sprint_etl_spark.plans.registry import ORACLES

    train = ORACLES["linreg_quality_train"]
    return f"""
WITH scored AS ({train}),
per AS (
  SELECT pred,
         CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
  FROM scored GROUP BY pred),
cum AS (
  SELECT n_pos, n_neg,
         CAST(COALESCE(SUM(n_neg) OVER (ORDER BY pred
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS neg_below
  FROM per),
s AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS p,
             CAST(SUM(n_neg) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_scores,
             CAST(SUM(n_pos * (2 * neg_below + n_neg)) AS BIGINT) AS numer2
      FROM cum)
SELECT p AS n_pos, n AS n_neg, n_scores,
       ROUND(CAST(numer2 AS DOUBLE) / (2.0 * CAST(p AS DOUBLE) * CAST(n AS DOUBLE)),
             6) AS auc
FROM s
"""


@register("quality_roc_auc", _sql_quality_auc())
def q_quality_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the in-engine-trained quality model against its
    is-English label — the threshold-free companion to the calibration
    reliability diagram: AUC = P(score_pos > score_neg) + 0.5
    P(score_pos = score_neg), computed exactly from the score-level
    histogram (per distinct score: positive/negative counts; one
    ordered pass accumulates negatives-below; ties contribute the half
    term via the doubled-numerator integer identity numer2 =
    sum(n_pos * (2*neg_below + n_neg)), so the whole statistic is ONE
    double division).

    Scale shape: the rank window runs over DISTINCT SCORES, not docs —
    already collapsed by a partial-combined groupBy — and is guarded,
    with a quantized-score (6-decimal) histogram named as the 100-TB
    fallback that bounds it structurally. The oracle replays the full
    GD training then the same accumulation."""
    from de_project_sprint_etl_spark.functions import guards

    scored = q_linreg_quality_train(spark, sf_dir)
    per = scored.groupBy("pred").agg(
        F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.when(F.col("y") == 1.0, 0).otherwise(1))
        .cast("bigint")
        .alias("n_neg"),
    )
    w = Window.orderBy("pred")
    neg_below = guards.bounded_global_window(
        F.coalesce(
            F.sum("n_neg").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("bigint"),
        w,
        AUC_SCORE_BOUND,
        "quality_roc_auc score ranking",
        "a 6-decimal quantized-score histogram (bounds distinct scores)",
    )
    cum = per.select("n_pos", "n_neg", neg_below.alias("neg_below"))
    s = cum.agg(
        F.sum("n_pos").cast("bigint").alias("p"),
        F.sum("n_neg").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_scores"),
        F.sum(
            F.col("n_pos") * (2 * F.col("neg_below") + F.col("n_neg"))
        )
        .cast("bigint")
        .alias("numer2"),
    )
    return s.select(
        F.col("p").alias("n_pos"),
        F.col("n").alias("n_neg"),
        "n_scores",
        F.round(
            F.col("numer2").cast("double")
            / (F.lit(2.0) * F.col("p").cast("double") * F.col("n").cast("double")),
            6,
        ).alias("auc"),
    )


# --- greedy FFD sequence packing (round 9) -------------------------------------

#: token budget per packed training sequence for the FFD assignment
PACK_FFD_BUDGET = 256
#: docs per FFD chunk: FFD runs EXACTLY within fixed 64-doc chunks of
#: the global (n_tokens DESC, doc_id) rank order, so the assignment is
#: deterministic, embarrassingly parallel (one pandas group per chunk),
#: and replayable in SQL with a depth-64 recursion — the hierarchical
#: shape a 100-TB packer actually ships (bins never span chunks, so
#: chunks pack independently on any number of executors)
PACK_FFD_CHUNK = 64


def _sql_pack_assign_greedy() -> str:
    B, C = PACK_FFD_BUDGET, PACK_FFD_CHUNK
    nt = f"CAST(len(STRING_SPLIT({SQL_NORM.format(c='text')}, ' ')) AS BIGINT)"
    return f"""
WITH RECURSIVE tc AS (SELECT doc_id, {nt} AS nt FROM documents),
rk AS (SELECT doc_id, nt, ROW_NUMBER() OVER (ORDER BY nt DESC, doc_id) AS rn
       FROM tc),
ck AS (SELECT doc_id, nt, CAST((rn - 1) // {C} AS BIGINT) AS chunk_id,
              CAST(rn - 1 - ((rn - 1) // {C}) * {C} + 1 AS BIGINT) AS step
       FROM rk),
ffd(chunk_id, step, loads, assigns) AS (
  SELECT chunk_id, CAST(0 AS BIGINT), CAST([] AS BIGINT[]),
         CAST([] AS STRUCT(doc_id BIGINT, nt BIGINT, slot BIGINT,
                           off BIGINT)[])
  FROM (SELECT DISTINCT chunk_id FROM ck)
  UNION ALL
  SELECT chunk_id, step,
         list_slice(loads, 1, slot - 1) || [COALESCE(loads[slot], 0) + nt]
           || list_slice(loads, slot + 1, len(loads)),
         assigns || [struct_pack(doc_id := doc_id, nt := nt, slot := slot,
                                 off := COALESCE(loads[slot], 0))]
  FROM (
    SELECT f.chunk_id, c.step, f.loads, f.assigns, c.doc_id, c.nt,
           COALESCE((SELECT MIN(u.i)
                     FROM (SELECT UNNEST(f.loads) AS v,
                                  UNNEST(generate_series(1,
                                    CAST(len(f.loads) AS BIGINT))) AS i) u
                     WHERE u.v + c.nt <= {B}),
                    len(f.loads) + 1) AS slot
    FROM ffd f JOIN ck c ON c.chunk_id = f.chunk_id AND c.step = f.step + 1
  ) z),
sizes AS (SELECT chunk_id, COUNT(*) AS n FROM ck GROUP BY chunk_id),
fin AS (SELECT f.chunk_id, UNNEST(f.assigns) AS a
        FROM ffd f JOIN sizes s ON s.chunk_id = f.chunk_id AND f.step = s.n)
SELECT a.doc_id AS doc_id, a.nt AS n_tokens,
       chunk_id * {C} + a.slot AS bin_id, a.off AS "offset"
FROM fin
"""


@register("pack_assign_greedy", _sql_pack_assign_greedy())
def q_pack_assign_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTABLE greedy sequence packing (VERDICT r8 #5) — the
    assignment pass the tuning artifact ``pack_efficiency_curve``
    measures: first-fit-decreasing of documents into fixed
    token-budget training sequences, emitting (doc_id, n_tokens,
    bin_id, offset). Deterministic by construction: docs rank globally
    by (n_tokens DESC, doc_id) — the FFD order — and exact FFD runs
    within fixed {PACK_FFD_CHUNK}-doc chunks of that rank (bin ids are
    chunk-local slots offset by chunk * {PACK_FFD_CHUNK}; a doc larger
    than the budget opens its own over-budget bin, which can never
    receive another doc — the standard oversize-truncates-at-training
    convention). The rank itself is the SHARDED exact global rank
    (functions/ranking.py, VERDICT r9 #3): quantile-cut shards rank
    independently in parallel and driver-folded base offsets
    reconstruct the identical global row number — no
    Exchange SinglePartition anywhere in the plan (pinned in
    tests/test_extensions_r10.py), so the packer's per-corpus costs
    are all embarrassingly parallel. Construction runs the two tiny
    ranking jobs eagerly over the persisted token-count projection
    (see the ranking module's eagerness note).

    Chunked on purpose, not as an approximation dodge: UNCHUNKED FFD is
    an inherently sequential global fold (each placement depends on
    every earlier bin load), unimplementable without funnelling the
    corpus through one task; chunked FFD is the hierarchical form a
    100-TB packer ships — each chunk packs independently (one small
    pandas group per chunk, any number of executors), and because the
    rank order sorts by length, docs within a chunk are near-uniform,
    where FFD is at its strongest. The DuckDB oracle replays the identical algorithm as a depth-64
    recursive CTE over per-chunk (loads, assigns) list state —
    bit-identical integer arithmetic, so the whole assignment (not a
    summary of it) sits inside the correctness gate."""
    import os

    from de_project_sprint_etl_spark.functions import ranking
    from de_project_sprint_etl_spark.functions.caching import (
        cached_generation,
        session_scoped_value,
    )
    from de_project_sprint_etl_spark.functions.text import tokens
    from de_project_sprint_etl_spark.plans.llm import fan_out
    from de_project_sprint_etl_spark.plans.registry import data_fingerprint

    budget, chunk = PACK_FFD_BUDGET, PACK_FFD_CHUNK

    # persist the tokenize projection ONCE per (session, corpus
    # fingerprint): the sharded rank scans it three times (cut points,
    # shard counts, the ranked pass) and tokenize is the query's
    # dominant CPU; fan_out first so an under-split single-file corpus
    # tokenizes on all cores instead of its 1-2 input splits. The memo
    # (the codebook/pair-artifact pattern) keeps rebuilds from
    # re-persisting a cold generation per call.
    def _docs():
        return cached_generation(
            spark,
            f"pack_assign_greedy:{sf_dir}",
            fan_out(
                spark, t(spark, sf_dir, "documents").select("doc_id", "text")
            ).select(
                "doc_id",
                F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
            ),
        )

    # the ranked frame is memoized per (session, corpus fingerprint)
    # alongside the persist: the quantile cuts and shard base offsets
    # embedded in it are corpus constants, so rebuilding the plan per
    # call would re-run the two small ranking jobs for identical
    # literals
    def _ranked():
        return ranking.sharded_global_rank(
            _docs(), "n_tokens", "doc_id", rank_col="rn"
        ).select(
            "doc_id",
            "n_tokens",
            "rn",
            F.expr(f"CAST((rn - 1) DIV {chunk} AS BIGINT)").alias(
                "chunk_id"
            ),
            # 64 chunks per pandas group: FFD state is still strictly
            # per-chunk (loads reset at each chunk boundary), but one
            # Python round-trip carries 64 chunks' rows — ~64x fewer
            # worker calls at identical results
            F.expr(f"CAST((rn - 1) DIV {chunk * chunk} AS BIGINT)").alias(
                "super_id"
            ),
        )

    ranked = session_scoped_value(
        "pack_assign_ranked",
        spark,
        (
            sf_dir,
            data_fingerprint(os.path.join(sf_dir, "documents.parquet")),
        ),
        _ranked,
    )

    def ffd(pdf):
        import pandas as pd

        pdf = pdf.sort_values("rn")
        bins, offs = [], []
        loads: list[int] = []
        prev_chunk = None
        for cid, nt in zip(pdf["chunk_id"], pdf["n_tokens"]):
            cid, nt = int(cid), int(nt)
            if cid != prev_chunk:
                loads = []
                prev_chunk = cid
            slot = next(
                (i for i, l in enumerate(loads) if l + nt <= budget),
                len(loads),
            )
            if slot == len(loads):
                loads.append(0)
            offs.append(loads[slot])
            loads[slot] += nt
            bins.append(cid * chunk + slot + 1)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_tokens": pdf["n_tokens"].to_numpy(),
                "bin_id": bins,
                "offset": offs,
            }
        )

    return ranked.groupBy("super_id").applyInPandas(
        ffd, "doc_id long, n_tokens long, bin_id long, offset long"
    )
