"""LLM-data-pipeline queries (dedup / similarity / text analysis) bound
to the TESTDATA.md ``documents`` and ``embeddings`` tables, each with an
exact DuckDB oracle.

The synthetic corpus has no natural near-duplicates (500 distinct
bag-of-words docs; max pairwise embedding cosine ≈ 0.51), so the
near-dup queries build their corpus as ``base ∪ mutated copies`` inside
the query — identically on both engines — which exercises the operators
with non-trivial output while staying on the provided tables.

Cross-engine numeric rules:
- shared 60-bit hash (functions.text.h64 / sql_h64) — bit-identical.
- cosine math in double precision, left-fold summation on both sides,
  rounded to 6 decimals before ranking; ties broken by id.
- double sums (events value) go through DECIMAL(18,2).
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_sprint_etl_spark.functions import dedup, embeddings, media, similarity, text
from de_project_sprint_etl_spark.functions.caching import cached_generation
from de_project_sprint_etl_spark.functions.text import SQL_NORM, sql_h64
from de_project_sprint_etl_spark.sources import incremental
from de_project_sprint_etl_spark.plans.registry import register
from de_project_sprint_etl_spark.plans.testdata import events_df, t

# --- shared corpus builders -------------------------------------------------

MUT_OFFSET = 100_000


def fan_out(
    spark: SparkSession, df: DataFrame, min_splits: int | None = None
) -> DataFrame:
    """Small single-file parquet inputs arrive as 1-2 input splits, which
    serializes CPU-heavy per-row work (regex/md5/shingle explode) onto 2
    of the 32 cores. One cheap round-robin repartition fans the
    downstream projection out to full parallelism — but ONLY when the
    input is actually under-split: a corpus that already arrives as many
    splits (the 100 TB case) must not pay a corpus-wide exchange here,
    so an input with >= ``min_splits`` (default cores/2) partitions
    passes through untouched (plan-shape pinned in tests/test_plans.py).
    """
    target = spark.sparkContext.defaultParallelism
    if min_splits is None:
        min_splits = max(2, target // 2)
    # memoize per input plan object: df.rdd.getNumPartitions() forces
    # physical planning (~0.1 s of driver time per call), and the same
    # cached scan (plans/testdata.t) flows through here in every query.
    # The cache holds the df reference so its id() can't be recycled.
    key = (id(df), min_splits)
    hit = _FAN_CACHE.get(key)
    if hit is None or hit[0] is not df:
        hit = (df, df.rdd.getNumPartitions() >= min_splits)
        _FAN_CACHE[key] = hit
    if hit[1]:
        return df
    return df.repartition(target)


_FAN_CACHE: dict[tuple, tuple] = {}
_DOCS_CACHE: dict[tuple[int, str], DataFrame] = {}


def docs_fanned(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (id(spark), sf_dir)
    if key not in _DOCS_CACHE:
        _DOCS_CACHE[key] = fan_out(
            spark, t(spark, sf_dir, "documents").select("doc_id", "text")
        )
    return _DOCS_CACHE[key]


# --- once-per-corpus materialization ----------------------------------------
#
# The near-dup queries all start from the same derived streams (mutant
# corpus, its shingles, its tokens). Re-deriving them inside every query
# keeps each query self-contained but pays the regex/shingle/explode
# subtree N times per session. At 100 TB these streams are pipeline
# *stages* — shingle once, materialize, reuse — so the engine does the
# same here: each stream is written to parquet once per (sf_dir, source
# fingerprint) and later queries scan it. Results are bit-identical to
# the inline derivation (a deterministic projection round-tripped
# through parquet); the DuckDB oracles still derive everything from the
# raw `documents` table, so the correctness gate also checks the cache.

_CACHE_ROOT = str(Path(__file__).resolve().parents[2] / ".cache" / "derived")


_READ_CACHE: dict[tuple[int, str], DataFrame] = {}


def _artifact_path(sf_dir: str, name: str) -> Path:
    """Stage-artifact directory for ``name``, keyed by the corpus
    fingerprint (documents.parquet mtime+size) — a regenerated fixture
    can never serve a stale artifact."""
    src = os.stat(os.path.join(sf_dir, "documents.parquet"))
    key = sf_dir.strip("/").replace("/", "_")
    return Path(_CACHE_ROOT) / f"{key}-{src.st_mtime_ns}-{src.st_size}" / name


def _read_artifact(spark: SparkSession, path: Path) -> DataFrame:
    rkey = (id(spark), str(path))
    if rkey not in _READ_CACHE:
        _READ_CACHE[rkey] = fan_out(spark, spark.read.parquet(str(path)))
    return _READ_CACHE[rkey]


def _materialized(
    spark: SparkSession, sf_dir: str, name: str, build
) -> DataFrame:
    path = _artifact_path(sf_dir, name)
    if not (path / "_SUCCESS").exists():
        build().write.mode("overwrite").parquet(str(path))
        _READ_CACHE.pop((id(spark), str(path)), None)
    return _read_artifact(spark, path)


def _docs_with_mutants_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de_project_sprint_etl_spark.functions import guards

    docs = docs_fanned(spark, sf_dir)
    toks = text.tokens(F.col("text"))
    mut = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + MUT_OFFSET).alias("doc_id"),
            F.concat_ws(" ", F.slice(toks, 3, F.size(toks))).alias("text"),
        )
        .filter(F.length("text") > 0)
    )
    # a natural doc_id >= MUT_OFFSET would collide with a shifted mutant
    # id — and because the oracle shares the constant, the differential
    # could never see it (ADVICE r7): fail loudly, row-level, plan-side
    base = docs.select(
        guards.assert_below(
            F.col("doc_id"), MUT_OFFSET, "docs_with_mutants"
        ).alias("doc_id"),
        "text",
    )
    return base.unionByName(mut)


def docs_with_mutants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ near-duplicate mutants: every 5th doc re-appears with
    id+100000 and its first two normalized tokens dropped (materialized
    once per corpus, see above)."""
    return _materialized(
        spark, sf_dir, "docs_mut", lambda: _docs_with_mutants_plan(spark, sf_dir)
    )


def mutant_shingles(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """(id, shingle) stream of the mutant corpus, distinct per doc —
    the shared input of the ngram-Jaccard and MinHash passes."""
    return _materialized(
        spark,
        sf_dir,
        f"shingles_n{n}",
        lambda: dedup._exploded_shingles(
            _docs_with_mutants_plan(spark, sf_dir), "text", "doc_id", n
        ),
    )


def mutant_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, tok) token-instance stream of the mutant corpus (SimHash
    input)."""

    def build() -> DataFrame:
        docs = _docs_with_mutants_plan(spark, sf_dir)
        return (
            docs.select(
                F.col("doc_id").alias("id"), text.tokens(F.col("text")).alias("toks")
            )
            .select("id", F.explode_outer("toks").alias("tok"))
            .filter(F.length("tok") > 0)
        )

    return _materialized(spark, sf_dir, "tokens", build)


def ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact n-gram-Jaccard near-dup PAIR OUTPUT (n=3, j >= 0.3),
    materialized once per corpus (VERDICT r8 #2). At 100 TB near-dup
    pairs are a WRITTEN pipeline artifact — the dedup pass produces
    them once and every tuning/eval/report query scans that table; the
    engine mirrors that by extending the shingle-stage discipline to
    the pair output. ``ngram_jaccard_dedup`` itself still executes the
    live join (it IS the pair pipeline under test); this accessor is
    for its consumers. Bit-identical to the inline derivation (a
    deterministic output round-tripped through parquet); every
    consumer's DuckDB oracle still re-derives pairs from raw
    ``documents``, so the cache sits inside the correctness gate."""
    return _materialized(
        spark,
        sf_dir,
        "ngram_pairs_n3_j03",
        lambda: dedup.ngram_jaccard_pairs(
            shingles=mutant_shingles(spark, sf_dir, n=3),
            n=3,
            min_jaccard=0.3,
            max_shingle_df=_MAX_SHINGLE_DF,
        ),
    )


def minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash(16)+LSH(4x4) candidate PAIR OUTPUT (est j >= 0.5),
    materialized once per corpus — same pipeline-artifact argument as
    ``ngram_pairs``: the banded dedup produces this table once; the
    cross-dup matrix, leakage check, cluster-quality report and eval
    queries scan it instead of re-mining candidates per report."""
    return _materialized(
        spark,
        sf_dir,
        "mh_pairs_16x4_j05",
        # persist_input=False: the signature input IS a written artifact
        # scan — persisting it would poison every other consumer of the
        # mh_sigs_16 artifact with an InMemoryRelation substitution
        lambda: dedup.minhash_lsh_pairs(
            minhash_sigs(spark, sf_dir),
            num_hashes=16,
            bands=4,
            min_est_jaccard=0.5,
            persist_input=False,
        ),
    )


def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text-statistics ATTRIBUTES table (token counts,
    ratios, quality_score — every ``with_text_stats`` column, text
    dropped), materialized once per corpus. This is the 'attributes
    file' every production curation stack writes next to the raw text
    (Dolma's attributes/, CCNet's minified metadata): quality is scored
    ONCE, and each planner/report/trainer scans the scored table
    instead of re-running the regex projection over the corpus.
    ``text_quality`` itself stays the live producer; doubles round-trip
    parquet bit-exactly, and every consumer's oracle still recomputes
    the stats from raw ``documents``, so the artifact sits inside the
    correctness gate."""
    return _materialized(
        spark,
        sf_dir,
        "doc_stats",
        lambda: text.with_text_stats(
            fan_out(spark, t(spark, sf_dir, "documents")), "text"
        ).drop("text"),
    )


def mutant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The attributes table of the mutant corpus (same contract as
    ``doc_stats``) — the quality input of the dedup keep/report
    family."""
    return _materialized(
        spark,
        sf_dir,
        "mut_stats",
        lambda: text.with_text_stats(
            _docs_with_mutants_plan(spark, sf_dir), "text"
        ).drop("text"),
    )


# --- incremental artifact maintenance (VERDICT r9 #2) ---------------------
#
# The reference's whole point is incremental loads without duplication
# (README.md:8-9,21-22 — daily increments merged idempotently into the
# snapshot); the curation artifacts above were rebuild-per-corpus. These
# refreshers apply the same discipline to the pair and attributes
# tables: shingle/sign/score the INCREMENT only, derive its new rows
# (band-joined against snapshot ∪ increment for pairs; a pure
# projection for attributes), and APPEND them to the snapshot's
# artifact. MinHash signatures and text stats are per-doc — no global
# statistic shifts with the increment — so refreshed ≡ full-rebuild
# EXACTLY, and the registered queries below prove it: each returns the
# refreshed artifact while its oracle recomputes the full rebuild from
# raw documents (hash equality IS the invariant). The exact-Jaccard
# PPJoin pair table is deliberately NOT refreshed this way: its
# max_shingle_df posting filter is a corpus-global statistic, so its
# incremental form requires a df-merge pass first (documented gap, not
# a silent approximation).

#: attribute columns shared by every attributes artifact
STAT_COLS = (
    "stat_n_chars",
    "n_tokens",
    "n_bpe_tokens",
    "avg_token_len",
    "punct_ratio",
    "digit_ratio",
    "stopword_ratio",
    "quality_score",
)


def minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SIGNATURE stage as a written artifact — MinHash(16) per doc
    over the full mutant corpus. A production dedup pipeline stores
    signatures (they are the expensive shingle-fold; banding and
    re-banding are cheap projections over them), which is exactly what
    makes the incremental refresh below O(|increment|): the snapshot
    side is READ, never re-signed."""
    return _materialized(
        spark,
        sf_dir,
        "mh_sigs_16",
        lambda: dedup.minhash_signatures(
            shingles=mutant_shingles(spark, sf_dir, n=3), num_hashes=16
        ),
    )


def minhash_sigs_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SNAPSHOT's signature artifact ('yesterday's' signatures,
    before the increment landed) — signed from the snapshot-filtered
    shingle stream. Signatures are per-doc, so each snapshot doc's
    signature is identical to its full-corpus one."""
    return _materialized(
        spark,
        sf_dir,
        "mh_sigs_snap_16",
        lambda: dedup.minhash_signatures(
            shingles=mutant_shingles(spark, sf_dir, n=3).filter(
                F.col("id") < MUT_OFFSET
            ),
            num_hashes=16,
        ),
    )


def minhash_pairs_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SNAPSHOT's pair artifact — near-dup pairs among the original
    documents only ('yesterday's' pair table, before the increment
    landed), banded from the snapshot signature artifact."""
    return _materialized(
        spark,
        sf_dir,
        "mh_pairs_snap_16x4_j05",
        # persist_input=False: artifact-scan input (see minhash_pairs)
        lambda: dedup.minhash_lsh_pairs(
            minhash_sigs_snapshot(spark, sf_dir),
            num_hashes=16,
            bands=4,
            min_est_jaccard=0.5,
            persist_input=False,
        ),
    )


def _refreshed_artifact(spark: SparkSession, sf_dir: str, name: str,
                        build_writes) -> DataFrame:
    """Run ``build_writes(path)`` (a multi-step overwrite+append write
    sequence) once per corpus, gated on a marker touched only AFTER the
    last write — parquet's own _SUCCESS lands after the FIRST write, so
    gating on it could serve a half-refreshed table after a crash
    between the two steps. Still used where the refreshed table is a
    REWRITE by nature (dup groups: membership of old rows changes);
    append-shaped refreshes use the manifest-gated in-place views
    below."""
    path = _artifact_path(sf_dir, name)
    done = path / "_REFRESH_COMPLETE"
    if not done.exists():
        build_writes(path)
        done.touch()
        _READ_CACHE.pop((id(spark), str(path)), None)
    return _read_artifact(spark, path)


def _view_artifact(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    base_artifacts: list[str],
    tag: str,
    build_delta,
    columns: list[str] | None = None,
) -> DataFrame:
    """The PRODUCTION refresh shape (VERDICT r10 #2): an in-place
    manifest-gated view whose base members are the ALREADY-WRITTEN
    snapshot artifacts (referenced, never copied — round 10's refresh
    cost was mostly parquet copy of the snapshot) and whose increment
    lands as one atomic commit of increment-sized files.

    ``build_delta() -> (data_df, [delete_dfs])`` runs once per corpus
    (idempotence = the manifest tag; a crash between the delta write
    and the manifest publish leaves the previous generation served —
    sources/incremental.py). The returned DataFrame is the committed
    view; the read-side cache is keyed by the view's generation so a
    new commit invalidates it."""
    root = _artifact_path(sf_dir, name)
    incremental.init_view(
        root, [str(_artifact_path(sf_dir, a)) for a in base_artifacts]
    )
    if not incremental.has_tag(root, tag):
        data, deletes = build_delta()
        incremental.append_delta(data, root, tag=tag, deletes=deletes)
    # keyed by the manifest's unique commit id, not the generation
    # number: a lost-manifest recovery re-commits at the SAME gen with
    # fresh part files, and a gen-keyed cache would serve the dead plan
    man = incremental.read_manifest(root)
    rkey = (id(spark), f"{root}::{man.get('cid', man['gen'])}")
    if rkey not in _READ_CACHE:
        # evict superseded generations of THIS view (a long-lived
        # session committing daily refreshes would otherwise retain one
        # dead plan per old cid — the bare-persist leak shape
        # functions/caching.py exists to bound)
        prefix = f"{root}::"
        for k in [
            k for k in _READ_CACHE
            if isinstance(k[1], str) and k[1].startswith(prefix)
        ]:
            _READ_CACHE.pop(k, None)
        _READ_CACHE[rkey] = fan_out(
            spark, incremental.read_view(spark, root, columns=columns)
        )
    return _READ_CACHE[rkey]


def minhash_refresh_delta(
    inc_sigs: DataFrame, snap_sigs: DataFrame
) -> DataFrame:
    """The increment's NEW pair rows from already-signed inputs:
    band-join increment × snapshot (``minhash_lsh_pairs_against`` — the
    snapshot side is the WRITTEN signature artifact, read not
    re-signed, and never self-joined) plus increment × increment.
    Cross pairs canonicalize by least/greatest — correct whether or not
    increment ids exceed snapshot ids (the soak's "snapshot" includes
    earlier mutant slices, so orientation is by id, not by which side
    was the increment; for the single-increment refresher, where inc
    ids DO exceed snap ids, least/greatest reduces to (snap, inc)).
    Callers persist ``inc_sigs`` (both band joins consume the signature
    subtree, ADVICE r10). The 16/4/0.5 family constants live here
    once, shared by the refresher and the soak."""
    cross = dedup.minhash_lsh_pairs_against(
        inc_sigs, snap_sigs, num_hashes=16, bands=4, min_est_jaccard=0.5
    ).select(
        F.least("id_inc", "id_snap").alias("id_a"),
        F.greatest("id_inc", "id_snap").alias("id_b"),
        "est_jaccard",
    )
    within = dedup.minhash_lsh_pairs(
        # the caller already persists inc_sigs (generation-managed);
        # a second bare persist here would outlive that management
        inc_sigs, num_hashes=16, bands=4, min_est_jaccard=0.5,
        persist_input=False,
    )
    return cross.unionByName(within)


def refresh_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally REFRESH the near-dup pair artifact IN PLACE: the
    snapshot's written pair table is the view's base member (referenced
    by the manifest, never copied — the round-10 shape rewrote it,
    paying a snapshot-sized parquet copy per refresh), and the
    increment's new pairs land as one atomic increment-sized commit.
    The only corpus-sized inputs touched are the increment's raw text
    and the stored snapshot signatures — O(|increment| + matched
    posting lists), not a full-corpus re-dedup."""
    minhash_pairs_snapshot(spark, sf_dir)  # ensure the base is written

    def build_delta():
        inc_docs = _docs_with_mutants_plan(spark, sf_dir).filter(
            F.col("doc_id") >= MUT_OFFSET
        )
        inc_sigs = cached_generation(
            spark,
            "mh_refresh_inc_sigs",
            dedup.minhash_signatures(
                shingles=dedup._exploded_shingles(
                    inc_docs, "text", "doc_id", 3
                ),
                num_hashes=16,
            ),
        )
        return (
            minhash_refresh_delta(
                inc_sigs, minhash_sigs_snapshot(spark, sf_dir)
            ),
            [],
        )

    return _view_artifact(
        spark,
        sf_dir,
        "mh_pairs_16x4_j05_refreshed",
        ["mh_pairs_snap_16x4_j05"],
        "inc-mutants",
        build_delta,
    )


def refresh_mutant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally REFRESH the attributes artifact: the snapshot's
    attributes ARE the existing per-corpus ``doc_stats`` table (the
    originals are exactly ``documents``), so the refresh scores ONLY
    the increment's text and appends — the Dolma-attributes analog of
    the reference's snapshot∪increment merge. Text stats are pure
    per-doc projections: no cross-doc statistic, so appended ≡
    recomputed."""

    doc_stats(spark, sf_dir)  # ensure the base is written

    def build_delta():
        cols = ["doc_id", *STAT_COLS]
        inc = text.with_text_stats(
            _docs_with_mutants_plan(spark, sf_dir).filter(
                F.col("doc_id") >= MUT_OFFSET
            ),
            "text",
        ).select(*cols)
        return inc, []

    return _view_artifact(
        spark,
        sf_dir,
        "mut_stats_refreshed",
        ["doc_stats"],
        "inc-mutants",
        build_delta,
        columns=["doc_id", *STAT_COLS],
    )


# --- N-day refresh soak (VERDICT r10 #3) -----------------------------------
#
# The registered refreshers prove ONE increment; the reference's README
# demands the multi-day invariant — k successive daily increments, each
# merged idempotently, never duplicated. The soak splits the mutant
# increment into MUT_SLICES "days" and commits them one at a time into
# soak-dedicated signature and pair views (separate roots from the
# gate's single-increment artifacts). Each step reads the PREVIOUS
# generation's signature view (stored members, never re-signed), signs
# only its slice, and commits pairs-then-signatures — that order makes
# a crash between the two commits recoverable: pairs carry the real
# increment math, and a re-run skips them by tag and completes the
# cheap signature append; committing signatures first would make the
# re-run's cross join see the slice's own signatures in the "previous"
# view and emit self-pairs.

MUT_SLICES = 5


def _slice_pred(j: int):
    """Mutant slice j of MUT_SLICES: mutant ids are base+MUT_OFFSET with
    base % 5 == 0 and MUT_OFFSET % 25 == 0, so doc_id % 25 walks
    {0,5,10,15,20} — one residue per slice."""
    # ADVICE r11: the residue walk is only exhaustive-and-disjoint when
    # MUT_OFFSET is a multiple of the modulus; a MUT_SLICES change that
    # breaks this silently skews or EMPTIES slices (the soak would then
    # pass vacuously on empty days)
    assert MUT_OFFSET % (5 * MUT_SLICES) == 0, (
        "soak slice predicate requires MUT_OFFSET % (5*MUT_SLICES) == 0; "
        f"got MUT_OFFSET={MUT_OFFSET}, MUT_SLICES={MUT_SLICES}"
    )
    return F.col("doc_id") % (5 * MUT_SLICES) == 5 * j


def minhash_soak_step(
    spark: SparkSession,
    sf_dir: str,
    sigs_root,
    pairs_root,
    j: int,
) -> None:
    """Commit mutant slice ``j`` ('day j') into the soak views. Cost is
    slice-sized: sign the slice's text, band-join it against the STORED
    signature view (snapshot + previously committed slices), append.
    Idempotent per view via the slice tag."""
    tag = f"slice-{j}"
    done_pairs = incremental.has_tag(pairs_root, tag)
    done_sigs = incremental.has_tag(sigs_root, tag)
    if done_pairs and done_sigs:
        return
    slice_docs = _docs_with_mutants_plan(spark, sf_dir).filter(
        (F.col("doc_id") >= MUT_OFFSET) & _slice_pred(j)
    )
    inc_sigs = cached_generation(
        spark,
        "mh_soak_inc_sigs",
        dedup.minhash_signatures(
            shingles=dedup._exploded_shingles(
                slice_docs, "text", "doc_id", 3
            ),
            num_hashes=16,
        ),
    )
    if not done_pairs:
        # the previous generation's members are captured NOW (before
        # any commit), so the cross join never sees this slice's own
        # signatures
        prev_sigs = incremental.read_view(spark, sigs_root)
        incremental.append_delta(
            minhash_refresh_delta(inc_sigs, prev_sigs), pairs_root, tag=tag
        )
    if not incremental.has_tag(sigs_root, tag):
        incremental.append_delta(inc_sigs, sigs_root, tag=tag)


def init_minhash_soak(
    spark: SparkSession, sf_dir: str, suffix: str = "soak"
):
    """Fresh soak views over the stored snapshot artifacts; returns
    (sigs_root, pairs_root)."""
    minhash_sigs_snapshot(spark, sf_dir)
    minhash_pairs_snapshot(spark, sf_dir)
    sigs_root = _artifact_path(sf_dir, f"mh_sigs_{suffix}")
    pairs_root = _artifact_path(sf_dir, f"mh_pairs_{suffix}")
    incremental.init_view(
        sigs_root, [str(_artifact_path(sf_dir, "mh_sigs_snap_16"))]
    )
    incremental.init_view(
        pairs_root, [str(_artifact_path(sf_dir, "mh_pairs_snap_16x4_j05"))]
    )
    return sigs_root, pairs_root


# --- EXACT-tier k-day soak: chained census merges --------------------------
#
# The minhash soak above proves the per-doc chain; the exact tier is
# harder under chaining because each day's refresh depends on the
# ACCUMULATED df census (day j's crossings are shingles whose running
# df steps over the cut on day j — the fixture crosses every day at
# cut 3). State = three manifest views: pairs (upsert commits:
# equality-deletes for affected docs + recomputed rows), the shingle
# stream (append), and the census (upsert: increment-touched shingles
# deleted and re-added with merged df). Commit order pairs → stream →
# census: a crash after any prefix re-runs deterministically because
# every uncommitted view still serves the previous day's state, and
# ngram_refresh_delta reads only previous-day views plus the slice.


def _ngram_pairs_snapshot_at(
    spark: SparkSession, sf_dir: str, cut: int
) -> DataFrame:
    """'Yesterday's' exact-pair table at an arbitrary cut (the
    registered-query snapshot is the cut=_INC_NGRAM_CUT case)."""
    return _materialized(
        spark,
        sf_dir,
        f"ngram_pairs_snap_n3_c{cut}",
        lambda: dedup.ngram_jaccard_pairs(
            shingles=snapshot_shingles(spark, sf_dir),
            n=3,
            min_jaccard=0.3,
            max_shingle_df=cut,
        ),
    )


def snapshot_shingles_artifact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The snapshot (id, shingle) stream as its OWN written artifact —
    the view-base form of ``snapshot_shingles`` (a view member must be
    a parquet directory, not a filter plan)."""
    return _materialized(
        spark,
        sf_dir,
        "shingles_snap_n3",
        lambda: snapshot_shingles(spark, sf_dir),
    )


def init_ngram_soak(
    spark: SparkSession,
    sf_dir: str,
    cut: int,
    suffix: str = "soak",
):
    """Soak state for the exact tier; returns (pairs_root, stream_root,
    census_root) over the stored snapshot artifacts."""
    _ngram_pairs_snapshot_at(spark, sf_dir, cut)
    snapshot_shingles_artifact(spark, sf_dir)
    ngram_census_snapshot(spark, sf_dir)
    pairs_root = _artifact_path(sf_dir, f"ngram_pairs_{suffix}_c{cut}")
    stream_root = _artifact_path(sf_dir, f"ngram_stream_{suffix}")
    census_root = _artifact_path(sf_dir, f"ngram_census_{suffix}")
    incremental.init_view(
        pairs_root,
        [str(_artifact_path(sf_dir, f"ngram_pairs_snap_n3_c{cut}"))],
    )
    incremental.init_view(
        stream_root, [str(_artifact_path(sf_dir, "shingles_snap_n3"))]
    )
    incremental.init_view(
        census_root, [str(_artifact_path(sf_dir, "ngram_census_snap_n3"))]
    )
    return pairs_root, stream_root, census_root


def ngram_soak_step(
    spark: SparkSession,
    sf_dir: str,
    pairs_root,
    stream_root,
    census_root,
    j: int,
    cut: int,
) -> None:
    """Commit mutant slice ``j`` into the exact-tier soak views: run
    the census-merge refresh against YESTERDAY's stored census/stream
    views, upsert the pair view (drop pairs touching affected docs,
    add recomputed ones), append the slice's shingles, and upsert the
    census (increment-touched shingles re-added with merged df)."""
    tag = f"slice-{j}"
    if (
        incremental.has_tag(pairs_root, tag)
        and incremental.has_tag(stream_root, tag)
        and incremental.has_tag(census_root, tag)
    ):
        return
    slice_sh = cached_generation(
        spark,
        "ngram_soak_slice",
        mutant_shingles(spark, sf_dir, n=3).filter(
            (F.col("id") >= MUT_OFFSET)
            & (F.col("id") % (5 * MUT_SLICES) == 5 * j)
        ),
    )
    # previous-day state captured before ANY commit (manifest members
    # are resolved at read_view build time)
    prev_census = incremental.read_view(spark, census_root)
    prev_stream = incremental.read_view(spark, stream_root)
    if not incremental.has_tag(pairs_root, tag):
        affected, new_pairs = dedup.ngram_refresh_delta(
            prev_census,
            prev_stream,
            slice_sh,
            min_jaccard=0.3,
            max_shingle_df=cut,
            cache_tag="ngram_soak",
        )
        cols = ["id_a", "id_b", "shared", "n_a", "n_b", "jaccard"]
        incremental.append_delta(
            new_pairs.select(*cols),
            pairs_root,
            tag=tag,
            deletes=[
                affected.select(F.col("id").alias("id_a")),
                affected.select(F.col("id").alias("id_b")),
            ],
        )
    if not incremental.has_tag(stream_root, tag):
        incremental.append_delta(slice_sh, stream_root, tag=tag)
    if not incremental.has_tag(census_root, tag):
        inc_census = slice_sh.groupBy("shingle").agg(
            F.count(F.lit(1)).cast("long").alias("__df_inc")
        )
        merged = (
            inc_census.join(
                prev_census.select(
                    "shingle", F.col("df").alias("__df_prev")
                ),
                "shingle",
                "left",
            )
            .select(
                "shingle",
                (
                    F.coalesce("__df_prev", F.lit(0)) + F.col("__df_inc")
                ).cast("long").alias("df"),
            )
        )
        incremental.append_delta(
            merged,
            census_root,
            tag=tag,
            deletes=[inc_census.select("shingle")],
        )


def dup_groups_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Yesterday's' dup-group table — connected components over the
    snapshot's pair artifact only."""
    return _materialized(
        spark,
        sf_dir,
        "mh_groups_snap",
        lambda: dedup.dup_groups(
            minhash_pairs_snapshot(spark, sf_dir), simple_pairs=True
        ),
    )


def refresh_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally REFRESH the dup-group table by STAR CONTRACTION:
    the snapshot's stored groups contract to star edges
    (group_id → member — one edge per non-canonical member), the
    increment's new pairs union in, and connected components re-run
    over that contracted graph. Correctness is the textbook contraction
    argument: a star preserves exactly its component's connectivity, so
    components of star(CC(snapshot_pairs)) ∪ new_pairs equal components
    of snapshot_pairs ∪ new_pairs over the identical vertex set — same
    membership, same min-id labels, same sizes. Cost: the CC iterates
    over |snapshot dup members| + |new pairs| edges with snapshot
    components already at diameter 1, instead of re-propagating the
    full pair graph; the full-rebuild CC never touches the snapshot
    pairs again."""

    def build(path):
        snap = dup_groups_snapshot(spark, sf_dir)
        star = snap.filter(F.col("id") != F.col("group_id")).select(
            F.col("group_id").alias("id_a"), F.col("id").alias("id_b")
        )
        new_pairs = (
            refresh_minhash_pairs(spark, sf_dir)
            .filter(F.col("id_b") >= MUT_OFFSET)
            .select("id_a", "id_b")
        )
        # star edges are (group_id < id, one row per member); new pairs
        # are distinct with id_b >= MUT_OFFSET > every snapshot id, so the
        # union stays one distinct row per unordered pair with id_a < id_b
        dedup.dup_groups(
            star.unionByName(new_pairs), simple_pairs=True
        ).write.mode(
            "overwrite"
        ).parquet(str(path))

    return _refreshed_artifact(spark, sf_dir, "mh_groups_refreshed", build)


SQL_DOCS_MUT = f"""
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + {MUT_OFFSET} AS doc_id,
       array_to_string(list_slice(toks, 3, len(toks)), ' ') AS text
FROM (SELECT doc_id, STRING_SPLIT({SQL_NORM.format(c='text')}, ' ') AS toks
      FROM documents WHERE doc_id % 5 = 0) m
WHERE LENGTH(array_to_string(list_slice(toks, 3, len(toks)), ' ')) > 0
"""


def emb_with_copies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ exact copies of every 10th vector (id+100000);
    same loud id-collision guard as the mutant doc corpus."""
    from de_project_sprint_etl_spark.functions import guards

    emb = fan_out(spark, t(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    cp = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + MUT_OFFSET).alias("vec_id"), "embedding"
    )
    base = emb.select(
        guards.assert_below(F.col("vec_id"), MUT_OFFSET, "emb_with_copies")
        .alias("vec_id"),
        "embedding",
    )
    return base.unionByName(cp)


SQL_EMB_COPIES = f"""
SELECT vec_id, embedding FROM embeddings
UNION ALL
SELECT vec_id + {MUT_OFFSET} AS vec_id, embedding
FROM embeddings WHERE vec_id % 10 = 0
"""

# --- text analysis ----------------------------------------------------------

_NORM = SQL_NORM.format(c="text")
_TOKS = f"STRING_SPLIT({_NORM}, ' ')"
_STOP_EN = ", ".join(f"'{w}'" for w in text.LANG_STOPWORDS["en"])
# BPE-ish pattern, single-quoted for DuckDB
_BPE_SQL = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
_PUNCT_CLASS = r"[^.,;:!?''\"()\[\]{}-]"  # '' = escaped quote inside SQL string


def _sql_text_quality(rel: str) -> str:
    return f"""
WITH raw AS (
  SELECT doc_id,
         LENGTH(text) AS stat_n_chars,
         len({_TOKS}) AS n_tokens,
         len(regexp_extract_all(LOWER(text), '{_BPE_SQL}')) AS n_bpe_tokens,
         CASE WHEN len({_TOKS}) > 0
              THEN LENGTH(array_to_string({_TOKS}, '')) / len({_TOKS})
              ELSE 0.0 END AS avg_token_len,
         CASE WHEN LENGTH(text) > 0
              THEN LENGTH(REGEXP_REPLACE(text, '{_PUNCT_CLASS}', '', 'g')) / LENGTH(text)
              ELSE 0.0 END AS punct_ratio,
         CASE WHEN LENGTH(text) > 0
              THEN LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) / LENGTH(text)
              ELSE 0.0 END AS digit_ratio,
         CASE WHEN len({_TOKS}) > 0
              THEN len(list_filter({_TOKS}, tk -> tk IN ({_STOP_EN}))) / len({_TOKS})
              ELSE 0.0 END AS stopword_ratio
  FROM {rel})
SELECT doc_id, stat_n_chars, n_tokens, n_bpe_tokens,
       ROUND(avg_token_len, 6) AS avg_token_len,
       ROUND(punct_ratio, 6) AS punct_ratio,
       ROUND(digit_ratio, 6) AS digit_ratio,
       ROUND(stopword_ratio, 6) AS stopword_ratio,
       ROUND(LEAST(n_tokens / 100.0, 1.0) * 0.4
             + LEAST(stopword_ratio * 5.0, 1.0) * 0.3
             + (1.0 - LEAST(punct_ratio * 4.0, 1.0)) * 0.2
             + (1.0 - LEAST(digit_ratio * 4.0, 1.0)) * 0.1, 6) AS quality_score
FROM raw
"""


@register("text_quality", _sql_text_quality("documents"))
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring (extension op; pure projections,
    no shuffle — scales as a map over the documents scan)."""
    docs = docs_fanned(spark, sf_dir)
    return text.with_text_stats(docs, "text").drop("text")


def _sql_lang_id(rel: str) -> str:
    hit_cols = ", ".join(
        f"len(list_filter({_TOKS}, tk -> tk IN ({', '.join(repr(w) for w in ws)}))) AS hits_{lang}"
        for lang, ws in text.LANG_STOPWORDS.items()
    )
    return f"""
WITH hits AS (
  SELECT doc_id, {hit_cols}
  FROM {rel})
SELECT doc_id,
       CASE GREATEST(hits_en, hits_de, hits_fr, hits_es)
         WHEN hits_fr THEN 'fr' WHEN hits_es THEN 'es'
         WHEN hits_en THEN 'en' ELSE 'de' END AS lang_pred,
       CAST(GREATEST(hits_en, hits_de, hits_fr, hits_es) AS BIGINT) AS lang_hits
FROM hits
"""


@register("lang_id", _sql_lang_id("documents"))
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID (extension op). Tiebreak = greatest
    lang code (struct max), mirrored by the CASE order in the oracle."""
    docs = docs_fanned(spark, sf_dir)
    return text.with_lang_id(docs, "text").drop("text")


@register(
    "doc_fingerprint",
    f"""
SELECT doc_id,
       md5({_NORM}) AS fp_md5,
       {sql_h64(_NORM)} AS fp_h64,
       list_min(list_transform({text.sql_shingles('text')}, s -> {sql_h64('s', seed=0)})) AS fp_minhash1
FROM documents
""",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: md5 + 60-bit content hash + minhash-1
    (extension op; map-only)."""
    docs = docs_fanned(spark, sf_dir)
    return text.with_fingerprints(docs, "text").drop("text")


@register(
    "token_histogram",
    f"""
SELECT tok, n FROM (
  SELECT tok, COUNT(*) AS n,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rnk
  FROM (SELECT UNNEST({_TOKS}) AS tok FROM documents) t
  WHERE LENGTH(tok) > 0
  GROUP BY tok) r
WHERE rnk <= 100
""",
)
def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: global top-100 token frequencies (extension
    op; explode → partial-combined groupBy → TakeOrdered, never a global
    sort of the vocabulary)."""
    return text.token_histogram(docs_fanned(spark, sf_dir), k=100)


@register(
    "tfidf_topk_terms",
    f"""
WITH toks AS (
  SELECT id, tok FROM (
    SELECT doc_id AS id, UNNEST({_TOKS}) AS tok FROM documents
  ) t WHERE LENGTH(tok) > 0),
tf AS (SELECT id, tok, COUNT(*) AS tf FROM toks GROUP BY id, tok),
dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
n AS (SELECT COUNT(*) AS n FROM documents),
s AS (SELECT id AS doc_id, tok, tf, df,
             ROUND(tf * LN(CAST(n.n AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN dfq USING (tok) CROSS JOIN n)
SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY tfidf DESC, tok) AS INT) AS rank
FROM s QUALIFY rank <= 3
""",
)
def q_tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 TF-IDF terms (extension op; two partial-combined
    aggs + broadcast corpus count + per-doc top-k window)."""
    return text.tfidf_topk_terms(docs_fanned(spark, sf_dir), k=3)


_SQL_PII_INJECT = (
    "CONCAT(text, ' reach user', CAST(doc_id AS VARCHAR),"
    " '@example.com or +1 555-000-',"
    " LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),"
    " ' node 10.0.', CAST(doc_id % 256 AS VARCHAR), '.7')"
)


@register(
    "pii_redaction",
    f"SELECT doc_id, {text.sql_redact_pii(_SQL_PII_INJECT)} AS redacted\nFROM documents",
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: emails / IPv4s / phone-like digit runs replaced
    with typed tags (extension op; map-only regexp_replace chain). The
    corpus has no PII, so the query injects a deterministic synthetic
    email+phone+IP per doc_id before redacting — the hash check then
    proves all three patterns fire identically on both engines."""
    docs = docs_fanned(spark, sf_dir)
    injected = F.concat(
        F.col("text"),
        F.lit(" reach user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 555-000-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" node 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
    )
    return docs.select(
        "doc_id", text.redact_pii(injected).alias("redacted")
    )


@register("token_entropy", text.sql_token_entropy("documents"))
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token-distribution Shannon entropy — the cheap
    perplexity proxy for quality filtering (extension op; pure array
    expressions, map-only, see functions/text.with_token_entropy)."""
    return text.with_token_entropy(docs_fanned(spark, sf_dir)).select(
        "doc_id", "token_entropy"
    )


@register("doc_repetition", text.sql_repetition("documents"))
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/boilerplate quality signals (distinct-token ratio,
    duplicated-trigram fraction) — the Gopher-style filters (extension
    op; map-only array expressions, see functions/text.with_repetition)."""
    return text.with_repetition(docs_fanned(spark, sf_dir)).select(
        "doc_id", "n_tokens", "distinct_token_ratio", "dup_trigram_frac"
    )


@register(
    "chunk_documents",
    text.sql_chunk_documents("documents", size=500, overlap=100),
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: overlapping 500-char chunks (stride 400)
    per document (extension op; map-only explode — zero shuffles on a
    100 TB corpus, see functions/text.chunk_documents)."""
    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    return text.chunk_documents(docs, size=500, overlap=100)


@register(
    "chunk_documents_udtf",
    text.sql_chunk_documents("documents", size=500, overlap=100),
)
def q_chunk_documents_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME chunking through a Spark-4 Python UDTF lateral join
    (functions/pyudtf.ChunkText) — registered to prove the
    escape-hatch tier end-to-end against the identical oracle as the
    native explode form (chunk_documents). Slow path by design: row
    transfer to a Python worker vs whole-stage codegen; use the native
    op unless the fan-out logic needs a real Python library."""
    from pyspark.sql.functions import col, lit

    from de_project_sprint_etl_spark.functions.pyudtf import ChunkText

    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    return (
        docs.lateralJoin(ChunkText(col("text").outer(), lit(500), lit(100)))
        .drop("text")
        .withColumn("chunk_len", F.length("chunk_text"))
    )


SAMPLE_RATES = {"en": 40}  # percent kept per language; others 100


@register(
    "stratified_sample",
    f"""
WITH l AS ({_sql_lang_id('documents')})
SELECT doc_id, lang_pred FROM l
WHERE {sql_h64("CONCAT('smp|', CAST(doc_id AS VARCHAR))")} % 100 <
      CASE lang_pred WHEN 'en' THEN {SAMPLE_RATES['en']} ELSE 100 END
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix rebalancing: hash-gated per-language downsampling
    (extension op; deterministic — a pure function of the doc id, so
    reproducible across runs/engines and stable under repartitioning;
    map-only, no shuffle, no RNG state)."""
    lang = text.with_lang_id(docs_fanned(spark, sf_dir))
    return text.stratified_sample(lang, SAMPLE_RATES).select(
        "doc_id", "lang_pred"
    )


CURATION_MIN_QUALITY = 0.5
CURATION_MIN_TOKENS = 20


@register(
    "corpus_curation",
    f"""
WITH d AS ({SQL_DOCS_MUT}),
k AS (SELECT doc_id, text FROM (
        SELECT doc_id, text,
               ROW_NUMBER() OVER (
                 PARTITION BY md5({SQL_NORM.format(c='d2.text')})
                 ORDER BY doc_id) AS rn
        FROM d d2) t
      WHERE rn = 1),
q AS ({_sql_text_quality('k')}),
l AS ({_sql_lang_id('k')})
SELECT q.doc_id, l.lang_pred, q.n_tokens, q.quality_score
FROM q JOIN l ON q.doc_id = l.doc_id
WHERE q.quality_score >= {CURATION_MIN_QUALITY}
  AND q.n_tokens >= {CURATION_MIN_TOKENS}
""",
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — the composed pipeline a training-data
    run actually executes: exact-dedup keep-canonical over the mutant
    corpus, then quality scoring + language ID (one shared projection
    pass), then threshold filters. One dup-key window + map-only
    enrichment: the whole curation adds a single shuffle on top of the
    corpus scan."""
    kept = dedup.keep_canonical(docs_with_mutants(spark, sf_dir))
    enriched = text.with_lang_id(text.with_text_stats(kept))
    return enriched.filter(
        (F.col("quality_score") >= CURATION_MIN_QUALITY)
        & (F.col("n_tokens") >= CURATION_MIN_TOKENS)
    ).select("doc_id", "lang_pred", "n_tokens", "quality_score")


# --- dedup ------------------------------------------------------------------


@register(
    "exact_dedup",
    f"""
SELECT md5({SQL_NORM.format(c='d.text')}) AS dup_key,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
       COUNT(*) AS n_docs
FROM ({SQL_DOCS_MUT}) d
GROUP BY 1
""",
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy on normalized-text digest (one
    shuffle on a 32-byte key)."""
    return dedup.exact_dedup(docs_with_mutants(spark, sf_dir))


@register(
    "exact_dedup_keep_canonical",
    f"""
SELECT doc_id, text FROM (
  SELECT doc_id, text,
         ROW_NUMBER() OVER (
           PARTITION BY md5({SQL_NORM.format(c='d.text')})
           ORDER BY doc_id) AS rn
  FROM ({SQL_DOCS_MUT}) d) t
WHERE rn = 1
""",
)
def q_exact_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter side of exact dedup: one surviving row per distinct
    content (min-id representative), a single dup-key window — the op a
    training-data pipeline actually applies to the corpus."""
    return dedup.keep_canonical(docs_with_mutants(spark, sf_dir))


_SH3 = text.sql_shingles("d.text", n=3)
_MAX_SHINGLE_DF = 1000


def _sql_ngram_pairs(cut: int, j: float) -> str:
    """Full-rebuild PPJoin oracle at an arbitrary df cut/threshold —
    shared by the live pair producer (cut={_MAX_SHINGLE_DF}) and the
    incremental refresh proof (a tight cut the increment actually
    crosses at fixture scale)."""
    return f"""
WITH sh AS (
  SELECT id, shingle FROM (
    SELECT id, UNNEST(sh_arr) AS shingle FROM (
      SELECT doc_id AS id, {_SH3} AS sh_arr FROM ({SQL_DOCS_MUT}) d) s0
  ) s WHERE LENGTH(shingle) > 0
),
hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > {cut}),
shf AS (SELECT id, shingle FROM sh s
        WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.shingle = s.shingle)),
sizes AS (SELECT id, COUNT(*) AS n_sh FROM shf GROUP BY id),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS shared
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id)
SELECT id_a, id_b, shared, sa.n_sh AS n_a, sb.n_sh AS n_b,
       ROUND(shared / (sa.n_sh + sb.n_sh - shared), 6) AS jaccard
FROM shared
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE ROUND(shared / (sa.n_sh + sb.n_sh - shared), 6) >= {j}
"""


_SQL_NGRAM_PAIRS = _sql_ngram_pairs(_MAX_SHINGLE_DF, 0.3)


@register("ngram_jaccard_dedup", _SQL_NGRAM_PAIRS)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-Jaccard set-similarity join (shingle-posting shuffle, not
    |docs|² — SURVEY extension op). Trigram shingles on purpose: bigram
    posting lists are ~5× hotter (sum(df²) 104M vs 4M at sf0.1), and
    candidate volume is quadratic in posting-list length."""
    return dedup.ngram_jaccard_pairs(
        shingles=mutant_shingles(spark, sf_dir, n=3),
        n=3,
        min_jaccard=0.3,
        max_shingle_df=_MAX_SHINGLE_DF,
    )


def _sql_minhash(num_hashes: int = 16, shingle_n: int = 3) -> str:
    # Mirror of dedup.minhash_signatures: same base digest, same affine
    # (a_i, b_i) constants from dedup.minhash_coeffs, same modulus.
    sh3 = text.sql_shingles("d.text", n=shingle_n)
    p = dedup.MINHASH_P
    mins = ", ".join(
        f"MIN(({a} * x + {b}) % {p}) AS h{i}"
        for i, (a, b) in enumerate(dedup.minhash_coeffs(num_hashes))
    )
    return f"""
  SELECT id, {mins} FROM (
    SELECT id, {sql_h64('shingle')} % {p} AS x FROM (
      SELECT id, UNNEST(sh_arr) AS shingle FROM (
        SELECT doc_id AS id, {sh3} AS sh_arr FROM ({SQL_DOCS_MUT}) d) s0
    ) sh WHERE LENGTH(shingle) > 0
  ) s
  GROUP BY id
"""


def _sql_minhash_lsh(num_hashes: int = 16, bands: int = 4, thresh: float = 0.5) -> str:
    r = num_hashes // bands
    hcols = [f"h{i}" for i in range(num_hashes)]
    band_defs = ", ".join(
        "CONCAT_WS('_', " + ", ".join(hcols[b * r : (b + 1) * r]) + f") AS band{b}"
        for b in range(bands)
    )
    cand_union = "\nUNION\n".join(
        f"SELECT a.id AS id_a, b.id AS id_b FROM banded a "
        f"JOIN banded b ON a.band{b} = b.band{b} AND a.id < b.id"
        for b in range(bands)
    )
    matches = " + ".join(
        f"CASE WHEN sa.{h} = sb.{h} THEN 1 ELSE 0 END" for h in hcols
    )
    return f"""
WITH sig AS ({_sql_minhash(num_hashes)}),
banded AS (SELECT *, {band_defs} FROM sig),
cand AS ({cand_union})
SELECT id_a, id_b, ROUND(({matches}) / {num_hashes}.0, 6) AS est_jaccard
FROM cand JOIN sig sa ON sa.id = id_a JOIN sig sb ON sb.id = id_b
WHERE ROUND(({matches}) / {num_hashes}.0, 6) >= {thresh}
"""


@register("minhash_lsh_dedup", _sql_minhash_lsh())
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4 bands) near-dup pairs (extension op: one
    explode + one groupBy for signatures, band-key self-joins for
    candidates)."""
    sigs = dedup.minhash_signatures(
        shingles=mutant_shingles(spark, sf_dir, n=3), num_hashes=16
    )
    return dedup.minhash_lsh_pairs(sigs, num_hashes=16, bands=4, min_est_jaccard=0.5)


@register("minhash_signatures_table", _sql_minhash(16))
def q_minhash_signatures_table(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The stored SIGNATURE stage itself (``minhash_sigs`` artifact) —
    the table a production dedup pipeline persists between the shingle
    fold and the (cheap, re-runnable) banding passes, and the snapshot
    input the incremental refresh reads instead of re-signing. The
    oracle recomputes all 16 minima from raw documents, so the written
    stage sits directly inside the correctness gate rather than only
    via its pair consumers."""
    return minhash_sigs(spark, sf_dir)


@register("incremental_pair_refresh", _sql_minhash_lsh())
def q_incremental_pair_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROOF that incremental pair-artifact maintenance is exact
    (VERDICT r9 #2): returns the REFRESHED pair artifact — the
    snapshot's written pair table plus the increment's band-joined new
    pairs appended (``refresh_minhash_pairs``; only the increment was
    shingled/signed) — while the oracle recomputes the FULL pair set
    from raw documents. Hash equality at the gate IS the
    refreshed ≡ rebuilt invariant (the reference's C5
    snapshot∪increment idempotency, applied to the curation DAG's pair
    stage)."""
    return refresh_minhash_pairs(spark, sf_dir)


@register(
    "incremental_group_refresh",
    f"""
WITH RECURSIVE mh AS ({_sql_minhash_lsh()}),
edges AS (SELECT id_a AS s, id_b AS d FROM mh
          UNION SELECT id_b, id_a FROM mh),
reach(id, label) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.id
),
lab AS (SELECT id, MIN(label) AS group_id FROM reach GROUP BY id)
SELECT id, group_id,
       CAST(COUNT(*) OVER (PARTITION BY group_id) AS BIGINT) AS group_size
FROM lab
""",
)
def q_incremental_group_refresh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dup-GROUP twin of ``incremental_pair_refresh``: returns the
    star-contraction-refreshed group table (``refresh_dup_groups`` —
    snapshot groups contracted to star edges ∪ the increment's new
    pairs, CC re-run) while the oracle computes full-rebuild connected
    components from raw documents with a recursive CTE. Hash equality
    proves the contraction refresh IS the rebuild — completing the
    incremental chain: signatures → pairs → groups, each stage
    refreshed from the increment + stored snapshot artifacts only."""
    return refresh_dup_groups(spark, sf_dir)


@register(
    "incremental_attributes_refresh",
    _sql_text_quality(f"({SQL_DOCS_MUT}) dm"),
)
def q_incremental_attributes_refresh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The attributes-table twin of ``incremental_pair_refresh``:
    returns the refreshed attributes artifact (the existing per-corpus
    ``doc_stats`` table plus the increment's scores appended — only the
    increment's text was scored) while the oracle recomputes every
    stat from the raw mutant corpus. Hash equality proves
    appended ≡ recomputed."""
    return refresh_mutant_stats(spark, sf_dir)


@register("incremental_time_travel", _sql_text_quality("documents"))
def q_incremental_time_travel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Generation time travel on the in-place attributes view
    (sources/incremental.read_view ``as_of_gen``): AFTER the refresh
    commit has landed, read the view as of generation 0 — the result
    must be exactly what the pre-refresh view served, i.e. the snapshot
    attributes with no trace of the increment. The oracle recomputes
    the snapshot stats from the raw ``documents`` table, so hash
    equality proves the as-of fold excludes later generations
    completely (the audit read: 'what did the table hold before day
    j?'). History lives in the live manifest, so the query also pins
    that the refresh chain never compacts implicitly."""
    refresh_mutant_stats(spark, sf_dir)  # ensure the refresh committed
    root = _artifact_path(sf_dir, "mut_stats_refreshed")
    return incremental.read_view(
        spark, root, columns=["doc_id", *STAT_COLS], as_of_gen=0
    )


# --- incremental EXACT-Jaccard (PPJoin) refresh (VERDICT r10 #1) -----------
#
# The exact tier was the one hole in the incremental chain: its
# max_shingle_df posting cut is corpus-global, so an increment can push
# a shingle ACROSS the cut and silently change OLD pairs' values. The
# refresh (functions/dedup.ngram_refresh_pairs) merges the increment's
# df into the stored census, recomputes only docs whose sub-cut sets
# changed (crossing-shingle holders ∪ the increment) against their
# candidate partners, and carries every other snapshot pair over
# verbatim. The cut here is 5 — tight enough that the mutant increment
# REALLY crosses it at fixture scale (186 crossing shingles at sf0.01),
# so the registered proof exercises the case that makes the exact tier
# hard, not just the append path.

_INC_NGRAM_CUT = 5


def snapshot_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The snapshot's (id, shingle) stream — a filter over the STORED
    full shingle artifact (read, never re-shingled)."""
    return mutant_shingles(spark, sf_dir, n=3).filter(F.col("id") < MUT_OFFSET)


def increment_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The increment's (id, shingle) stream, same stored-artifact
    filter discipline."""
    return mutant_shingles(spark, sf_dir, n=3).filter(
        F.col("id") >= MUT_OFFSET
    )


def ngram_census_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Yesterday's' FULL shingle-df census (every shingle, not just
    sub-cut — the refresh must distinguish brand-new shingles from
    already-hot ones). Vocabulary-shaped; the stored statistic the
    df-merge reads instead of re-counting the snapshot."""
    return _materialized(
        spark,
        sf_dir,
        "ngram_census_snap_n3",
        lambda: snapshot_shingles(spark, sf_dir)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("df")),
    )


def ngram_pairs_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Yesterday's' exact-Jaccard pair table — PPJoin over the
    snapshot only, at the refresh family's tight df cut."""
    return _materialized(
        spark,
        sf_dir,
        f"ngram_pairs_snap_n3_c{_INC_NGRAM_CUT}",
        lambda: dedup.ngram_jaccard_pairs(
            shingles=snapshot_shingles(spark, sf_dir),
            n=3,
            min_jaccard=0.3,
            max_shingle_df=_INC_NGRAM_CUT,
        ),
    )


def refresh_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The refreshed exact-pair artifact as an IN-PLACE view: the
    stored snapshot pair table is the base member; one commit carries
    (a) two equality-delete files — the affected doc ids keyed as
    ``id_a`` and as ``id_b``, dropping every old pair touching a doc
    whose sub-cut set changed — and (b) the recomputed pairs as the
    data delta. All committed files are increment-sized (the snapshot
    is referenced, never rewritten), which is what makes the exact tier
    refreshable at daily-increment cost."""
    ngram_pairs_snapshot(spark, sf_dir)  # ensure the base is written

    def build_delta():
        affected, new_pairs = dedup.ngram_refresh_delta(
            ngram_census_snapshot(spark, sf_dir),
            snapshot_shingles(spark, sf_dir),
            increment_shingles(spark, sf_dir),
            min_jaccard=0.3,
            max_shingle_df=_INC_NGRAM_CUT,
        )
        cols = ["id_a", "id_b", "shared", "n_a", "n_b", "jaccard"]
        return new_pairs.select(*cols), [
            affected.select(F.col("id").alias("id_a")),
            affected.select(F.col("id").alias("id_b")),
        ]

    return _view_artifact(
        spark,
        sf_dir,
        f"ngram_pairs_n3_c{_INC_NGRAM_CUT}_refreshed",
        [f"ngram_pairs_snap_n3_c{_INC_NGRAM_CUT}"],
        "inc-mutants",
        build_delta,
    )


@register(
    "incremental_exact_pair_refresh",
    _sql_ngram_pairs(_INC_NGRAM_CUT, 0.3),
)
def q_incremental_exact_pair_refresh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PROOF that the EXACT-Jaccard tier refreshes incrementally
    (VERDICT r10 #1 — the MinHash chain's last hole): returns the
    refreshed PPJoin pair artifact — stored snapshot pairs carried
    over where no shingle crossed the df cut, affected + increment
    docs recomputed under the merged census — while the oracle
    rebuilds the FULL pair set from raw documents at the same cut.
    Hash equality at the gate IS refreshed ≡ rebuilt, including
    cut-crossing effects (dropped old pairs, newly admitted snapshot
    pairs): at sf0.01 the increment pushes 186 shingles across cut 5,
    so the equality is exercised on the hard case, not the append
    path."""
    return refresh_ngram_pairs(spark, sf_dir)


@register(
    "near_dedup_filter",
    f"""
WITH RECURSIVE mh AS ({_sql_minhash_lsh()}),
edges AS (SELECT id_a AS s, id_b AS d FROM mh
          UNION SELECT id_b, id_a FROM mh),
reach(id, label) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.id
),
lab AS (SELECT id, MIN(label) AS group_id FROM reach GROUP BY id),
drop_ids AS (SELECT id FROM lab WHERE id <> group_id)
SELECT d.doc_id FROM ({SQL_DOCS_MUT}) d
WHERE NOT EXISTS (SELECT 1 FROM drop_ids x WHERE x.id = d.doc_id)
""",
)
def q_near_dedup_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fuzzy dedup removal — THE canonical training-corpus
    pass: MinHash+LSH near-dup pairs → connected components → drop
    every non-canonical group member (keep the min-id representative),
    via an anti join of the drop set against the corpus. The drop set
    is broadcast only when a bounded early-exit count proves it fits
    the session broadcast threshold (``guards.gated_broadcast``); on a
    high-dup-rate corpus — a 100 TB web crawl can be 30–50% dup
    members, making the drop set corpus-scale — the join degrades to a
    plain shuffle anti join instead of an executor OOM. Composes the
    once-per-corpus pair ARTIFACT with the CC and anti-join operators —
    the staged production DAG (the dedup stage writes pairs; the
    removal pass reads them); the oracle recomputes the same thing from
    raw documents with a recursive CTE."""
    from de_project_sprint_etl_spark.functions import guards

    groups = dedup.dup_groups(minhash_pairs(spark, sf_dir), simple_pairs=True)
    drop = groups.filter(F.col("id") != F.col("group_id")).select(
        F.col("id").alias("doc_id")
    )
    return docs_with_mutants(spark, sf_dir).join(
        guards.gated_broadcast(drop, "near_dedup_filter drop set"),
        "doc_id",
        "left_anti",
    ).select("doc_id")


_SQL_KEEP_BEST = f"""
WITH RECURSIVE mh AS ({_sql_minhash_lsh()}),
edges AS (SELECT id_a AS s, id_b AS d FROM mh
          UNION SELECT id_b, id_a FROM mh),
reach(id, label) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.id
),
lab AS (SELECT id, MIN(label) AS group_id FROM reach GROUP BY id),
q AS (SELECT doc_id, quality_score
      FROM ({{Q}}) tq),
j AS (SELECT q.doc_id, COALESCE(l.group_id, q.doc_id) AS group_id,
             q.quality_score
      FROM q LEFT JOIN lab l ON l.id = q.doc_id),
r AS (SELECT j.*, ROW_NUMBER() OVER (
        PARTITION BY group_id
        ORDER BY quality_score DESC, doc_id) AS rn FROM j)
SELECT doc_id, group_id, quality_score FROM r WHERE rn = 1
"""


@register(
    "near_dedup_keep_best",
    _SQL_KEEP_BEST.replace("{Q}", _sql_text_quality(f"({SQL_DOCS_MUT}) dm")),
)
def q_near_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dedup with QUALITY-argmax canonical keep — what a training
    pipeline actually wants: per near-dup cluster, survive the
    highest-quality member (tiebreak min doc_id), not the arbitrary
    min-id one. Composes three verified operators: MinHash+LSH pairs →
    connected components → per-group argmax against the Gopher-style
    quality score. Scale shape: the label table holds dup members only
    — broadcast iff a bounded early-exit count proves it under the
    session threshold (``guards.gated_broadcast``; a high-dup-rate
    crawl makes the label table corpus-scale, where the hint must fall
    away to a shuffle join) — the argmax window shuffles just those
    members, and singletons — the overwhelming majority of a real
    corpus — stay on the map side entirely. Output: one row per
    surviving doc (doc_id, its cluster label, its quality score)."""
    from pyspark.sql import Window

    from de_project_sprint_etl_spark.functions import guards

    # both inputs are written stage artifacts — the candidate pairs and
    # the attributes table (quality scored once per corpus): the
    # keep-best pass composes them with CC + the group-best window
    groups = dedup.dup_groups(minhash_pairs(spark, sf_dir), simple_pairs=True)
    q = mutant_stats(spark, sf_dir).select("doc_id", "quality_score")
    lab = q.join(
        guards.gated_broadcast(groups, "near_dedup_keep_best dup groups"),
        q["doc_id"] == groups["id"],
        "left",
    )
    singles = lab.filter(F.col("id").isNull()).select(
        "doc_id", F.col("doc_id").alias("group_id"), "quality_score"
    )
    members = lab.filter(F.col("id").isNotNull()).select(
        "doc_id", "group_id", "quality_score"
    )
    w = Window.partitionBy("group_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    best = (
        members.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return singles.unionByName(best)


def _sql_simhash(bits: int = 32) -> str:
    bit_sums = ", ".join(
        f"SUM(CASE WHEN (th >> {b}) & 1 = 1 THEN tf ELSE -tf END) AS s{b}"
        for b in range(bits)
    )
    sig = " + ".join(f"CASE WHEN s{b} > 0 THEN {2**b} ELSE 0 END" for b in range(bits))
    return f"""
  SELECT id, CAST({sig} AS BIGINT) AS simhash FROM (
    SELECT id, {bit_sums} FROM (
      SELECT id, tok, COUNT(*) AS tf, {sql_h64('tok')} AS th FROM (
        SELECT doc_id AS id, UNNEST(STRING_SPLIT({SQL_NORM.format(c='d.text')}, ' ')) AS tok
        FROM ({SQL_DOCS_MUT}) d) t0
      WHERE LENGTH(tok) > 0 GROUP BY id, tok) t1
    GROUP BY id) t2
"""


def _sql_simhash_pairs(bits: int = 32, max_hamming: int = 3) -> str:
    width = bits // 4
    mask = (1 << width) - 1
    blocks = ", ".join(
        f"(simhash >> {k * width}) & {mask} AS blk{k}" for k in range(4)
    )
    cand_union = "\nUNION\n".join(
        f"SELECT a.id AS id_a, b.id AS id_b, a.simhash AS sh_a, b.simhash AS sh_b "
        f"FROM blocked a JOIN blocked b ON a.blk{k} = b.blk{k} AND a.id < b.id"
        for k in range(4)
    )
    return f"""
WITH sig AS ({_sql_simhash(bits)}),
blocked AS (SELECT *, {blocks} FROM sig),
cand AS ({cand_union})
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
"""


@register("simhash_dedup", _sql_simhash_pairs())
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(32-bit) near-dup pairs, byte-blocked (pigeonhole recall
    for hamming ≤ 3) + bit_count verify (extension op)."""
    sigs = dedup.simhash(toks=mutant_tokens(spark, sf_dir), bits=32)
    return dedup.simhash_pairs(sigs, bits=32, max_hamming=3)


# --- similarity search ------------------------------------------------------

N_QUERIES = 10
PLANES = similarity.hyperplanes(dim=64, n_planes=8, seed=7)
# Multi-table LSH: L independent tables recover the neighbours a single
# 8-plane table loses (a neighbour is missed only if it flips a sign bit
# in EVERY table) — the standard recall fix, mirrored in the oracle.
LSH_TABLES = [
    similarity.hyperplanes(dim=64, n_planes=8, seed=s) for s in (7, 8, 9)
]


def _sql_cos(av: str, bv: str) -> str:
    return (
        f"list_dot_product({av}, {bv}) / "
        f"(SQRT(list_dot_product({av}, {av})) * SQRT(list_dot_product({bv}, {bv})))"
    )


SQL_ANN_BRUTE = f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
sim AS (
  SELECT query_id, neighbor_id, ROUND({_sql_cos('qv', 'cv')}, 6) AS cos_sim
  FROM c CROSS JOIN q WHERE query_id <> neighbor_id)
SELECT query_id, neighbor_id, cos_sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
FROM sim QUALIFY rank <= 5
"""


@register("ann_bruteforce_topk", SQL_ANN_BRUTE)
def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 10 query vectors: broadcast queries, one
    narrow corpus pass, tiny top-k shuffle (extension op)."""
    emb = fan_out(spark, t(spark, sf_dir, "embeddings"))
    return similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < N_QUERIES), k=5
    )


@register("ann_bruteforce_topk_pandas", SQL_ANN_BRUTE)
def q_ann_bruteforce_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-batched numpy-GEMM twin of ann_bruteforce_topk with
    map-side partial top-k (see similarity.brute_force_topk_pandas) —
    the designed path once vector width makes per-element Catalyst
    folds the bottleneck. Shares the expression form's oracle: GEMM
    summation matches the left-fold at 6-decimal rounding on this data
    (verified at sf0.01 and sf0.1)."""
    emb = fan_out(spark, t(spark, sf_dir, "embeddings"))
    return similarity.brute_force_topk_pandas(
        emb, emb.filter(F.col("vec_id") < N_QUERIES), k=5
    )


def _sql_lsh_sig(vec: str, planes: list[list[float]] | None = None) -> str:
    bits = []
    for i, p in enumerate(planes if planes is not None else PLANES):
        arr = "[" + ", ".join(f"{v!r}" for v in p) + "]"
        bits.append(
            f"CASE WHEN list_dot_product({vec}, CAST({arr} AS DOUBLE[])) >= 0 "
            f"THEN {2**i} ELSE 0 END"
        )
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


_LSH_SIG_COLS = ", ".join(
    f"{_sql_lsh_sig('CAST(embedding AS DOUBLE[])', planes)} AS b{i}"
    for i, planes in enumerate(LSH_TABLES)
)
_LSH_CAND_UNION = "\nUNION ALL ".join(
    f"SELECT q.query_id, c.neighbor_id FROM c JOIN q ON c.b{i} = q.b{i}"
    for i in range(len(LSH_TABLES))
)


SQL_ANN_LSH = f"""
WITH c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv,
                  {_LSH_SIG_COLS}
           FROM embeddings),
q AS (SELECT neighbor_id AS query_id, cv AS qv,
             {", ".join(f"b{i}" for i in range(len(LSH_TABLES)))}
      FROM c WHERE neighbor_id < {N_QUERIES}),
cand AS (SELECT DISTINCT query_id, neighbor_id FROM ({_LSH_CAND_UNION}) u
         WHERE query_id <> neighbor_id),
sim AS (
  SELECT cand.query_id, cand.neighbor_id,
         ROUND({_sql_cos('q.qv', 'c.cv')}, 6) AS cos_sim
  FROM cand JOIN c ON c.neighbor_id = cand.neighbor_id
            JOIN q ON q.query_id = cand.query_id)
SELECT query_id, neighbor_id, cos_sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
FROM sim QUALIFY rank <= 5
"""


@register("ann_lsh_topk", SQL_ANN_LSH)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH (3 tables × 8 hyperplanes) approximate top-5
    (extension op: the corpus pass becomes a (table, bucket) equi-join;
    3 tables restore the recall a single table loses — 44/50 → 50/50
    result rows at sf0.1)."""
    emb = fan_out(spark, t(spark, sf_dir, "embeddings"))
    return similarity.lsh_topk_tables(
        emb, emb.filter(F.col("vec_id") < N_QUERIES), LSH_TABLES, k=5
    )


IVF_STRIDE = 50  # centroid seeds = every 50th vector → n_list ≈ N/50

_SQL_ANN_IVF = f"""
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT id AS cent_id, v AS cv FROM e WHERE id % {IVF_STRIDE} = 0),
scored AS (
  SELECT e.id, e.v, cent_id, ROUND({_sql_cos('e.v', 'cent.cv')}, 6) AS cos_c
  FROM e CROSS JOIN cent),
ranked AS (
  SELECT id, v, cent_id AS cell,
         ROW_NUMBER() OVER (PARTITION BY id ORDER BY cos_c DESC, cent_id DESC) AS rn
  FROM scored),
c AS (SELECT id AS neighbor_id, v AS cv, cell FROM ranked WHERE rn = 1),
q AS (SELECT id AS query_id, v AS qv, cell FROM ranked
      WHERE rn <= 2 AND id < {N_QUERIES}),
sim AS (
  SELECT query_id, neighbor_id, ROUND({_sql_cos('qv', 'cv')}, 6) AS cos_sim
  FROM c JOIN q USING (cell) WHERE query_id <> neighbor_id)
SELECT query_id, neighbor_id, cos_sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
FROM sim QUALIFY rank <= 5
"""


@register("ann_ivf_topk", _SQL_ANN_IVF)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5, nprobe=2 (extension op: the corpus pass is
    an index-build assignment; probes are cell equi-joins — see
    ann_ivf_topk_indexed for the materialized partition-pruned form)."""
    emb = fan_out(spark, t(spark, sf_dir, "embeddings"))
    return similarity.ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < N_QUERIES),
        emb.filter(F.col("vec_id") % IVF_STRIDE == 0),
        nprobe=2,
        k=5,
    )


def _ivf_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per corpus) the partitionBy(cell) IVF index under the
    derived-stream cache; keyed like _materialized."""
    src = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    key = sf_dir.strip("/").replace("/", "_")
    path = Path(_CACHE_ROOT) / f"{key}-emb-{src.st_mtime_ns}-{src.st_size}" / "ivf_index"
    if not (path / "_SUCCESS").exists():
        emb = fan_out(spark, t(spark, sf_dir, "embeddings"))
        similarity.build_ivf_index(
            emb, emb.filter(F.col("vec_id") % IVF_STRIDE == 0), str(path)
        )
    return str(path)


_SQL_ANN_IVF_ADAPTIVE = _SQL_ANN_IVF.replace(
    f"id % {IVF_STRIDE} = 0",
    "id % (SELECT CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) FROM e) = 0",
)
# a reworded _SQL_ANN_IVF / changed IVF_STRIDE would make the replace a
# silent no-op and register the adaptive query against the FIXED-stride
# oracle — fail at import instead of as a later hash mismatch
assert _SQL_ANN_IVF_ADAPTIVE != _SQL_ANN_IVF, "adaptive-stride rewrite missed"


def _emb_count(spark: SparkSession, sf_dir: str) -> int:
    """Corpus cardinality, one count job per (session, corpus
    fingerprint) — the adaptive stride needs n, but n is a property of
    the CORPUS, not of the query invocation (VERDICT r5 #5). Keyed on
    the leaf-file-aware parquet fingerprint so a regenerated fixture —
    even one rewritten in place with identical names/sizes —
    invalidates."""
    from de_project_sprint_etl_spark.functions.caching import session_scoped_value
    from de_project_sprint_etl_spark.plans.registry import data_fingerprint

    fp = data_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    return session_scoped_value(
        "emb_count",
        spark,
        (sf_dir, fp),
        lambda: t(spark, sf_dir, "embeddings").count(),
    )


@register("ann_ivf_topk_adaptive", _SQL_ANN_IVF_ADAPTIVE)
def q_ann_ivf_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5 with the SCALE-CORRECT list count: centroid stride =
    floor(sqrt(n)), so n_list ≈ sqrt(n) and the build-side assignment
    does n·sqrt(n) dots instead of the fixed-stride form's n·(n/50) —
    the sf1 stress run measured the fixed-stride build at 16× for 10×
    corpus (quadratic), which is exactly the textbook reason FAISS
    sizes n_list ~ sqrt(n). The oracle computes the same stride from
    the corpus in SQL (same policy as the SemDeDup adaptive-k mirror),
    so the two sides stay hash-equal at any scale. Python's
    floor(sqrt(float)) matches DuckDB's FLOOR(SQRT()) — both IEEE
    doubles — at any corpus size this engine will see."""
    import math

    emb = fan_out(spark, t(spark, sf_dir, "embeddings"))
    stride = max(1, int(math.floor(math.sqrt(_emb_count(spark, sf_dir)))))
    return similarity.ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < N_QUERIES),
        emb.filter(F.col("vec_id") % stride == 0),
        nprobe=2,
        k=5,
    )


@register("ann_ivf_topk_indexed", _SQL_ANN_IVF)
def q_ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF against the MATERIALIZED inverted file: index written
    partitionBy(cell) once per corpus; probes scan only the probed
    cells' directories (PartitionFilters pruning, pinned in
    tests/test_plans.py) — the sublinear serving path a 100 TB corpus
    needs. Same centroids, same semantics, same oracle as ann_ivf_topk."""
    emb = fan_out(spark, t(spark, sf_dir, "embeddings"))
    return similarity.ivf_topk_indexed(
        spark,
        _ivf_index_path(spark, sf_dir),
        emb.filter(F.col("vec_id") < N_QUERIES),
        emb.filter(F.col("vec_id") % IVF_STRIDE == 0),
        nprobe=2,
        k=5,
    )


# Shared by cosine_near_dup and dedup_groups (the latter's recursive CTE
# consumes these pairs as its edge list).
_SQL_COS_PAIRS = f"""
WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM ({SQL_EMB_COPIES}) ec),
b AS (SELECT id, v, {_sql_lsh_sig('v')} AS bucket FROM e)
SELECT a.id AS id_a, bb.id AS id_b, ROUND({_sql_cos('a.v', 'bb.v')}, 6) AS cos_sim
FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.id < bb.id
WHERE ROUND({_sql_cos('a.v', 'bb.v')}, 6) >= 0.95
"""


@register("cosine_near_dup", _SQL_COS_PAIRS)
def q_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-blocked (extension op)."""
    return similarity.cosine_near_dup_pairs(
        emb_with_copies(spark, sf_dir), PLANES, min_cos=0.95
    )


@register(
    "dedup_groups",
    f"""
WITH RECURSIVE pairs AS ({_SQL_COS_PAIRS}),
edges AS (SELECT id_a AS s, id_b AS d FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(id, label) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.id
),
lab AS (SELECT id, MIN(label) AS group_id FROM reach GROUP BY id)
SELECT id, group_id,
       CAST(COUNT(*) OVER (PARTITION BY group_id) AS BIGINT) AS group_size
FROM lab
""",
)
def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup group assembly: connected components over the
    embedding-cosine pair graph via iterative min-label propagation
    (extension op; the oracle's recursive CTE computes the same
    components as transitive reachability)."""
    pairs = similarity.cosine_near_dup_pairs(
        emb_with_copies(spark, sf_dir), PLANES, min_cos=0.95
    )
    # NOT simple_pairs: these pairs are an INLINE cosine join, and the
    # distinct's exchange right-sizes the persisted edge frame the CC
    # rounds rescan (the explode would inherit the join's output
    # partitioning - measured r12: 2x the partitions, consistently
    # 2-15x the bench-context wall on this iterative query); the
    # artifact-backed callers, whose edge frame inherits a small
    # parquet scan's splits, do skip the dedup shuffle
    return dedup.dup_groups(pairs)


_QP = [0.25, 0.5, 0.75, 0.95]


@register(
    "quality_percentiles",
    f"""
WITH q AS ({_sql_text_quality('documents')}),
d AS (SELECT doc_id, lang FROM documents)
SELECT lang, COUNT(*) AS n_docs,
       {", ".join(f"ROUND(quantile_cont(quality_score, {p}), 6) AS p{int(p * 100)}"
                  for p in _QP)}
FROM q JOIN d USING (doc_id)
GROUP BY lang
""",
)
def q_quality_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language quality-score percentiles (extension op).
    Spark's `percentile` and DuckDB's `quantile_cont` share the linear
    interpolation rule, so this hash-matches exactly — the distribution
    profile that sets corpus-curation thresholds."""
    # scans the once-per-corpus attributes table (doc_stats) — quality
    # is scored once, distribution profiling reads the scored table
    q = doc_stats(spark, sf_dir)
    aggs = [
        F.round(F.expr(f"percentile(quality_score, {p})"), 6).alias(f"p{int(p * 100)}")
        for p in _QP
    ]
    return q.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"), *aggs)


@register(
    "quality_percentiles_approx",
    # The Spark side hashes the VERDICT (each sketch percentile inside
    # the exact rank-neighborhood), so the oracle asserts TRUE per lang.
    "SELECT lang, COUNT(*) AS n_docs, "
    + ", ".join(f"TRUE AS p{int(p * 100)}_ok" for p in [0.25, 0.5, 0.75, 0.95])
    + " FROM documents GROUP BY lang",
)
def q_quality_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch twin of quality_percentiles via percentile_approx —
    bounded memory per group at any corpus size (the 100 TB path when
    exact order statistics would shuffle the full value stream).
    Spark's QuantileSummaries sketch is not bit-compatible with
    DuckDB's, so the hashed output is the VERDICT, stated exactly as
    the sketch's own guarantee (a RANK bound, not a value bound):
    ``p*_ok`` is true iff the returned value's rank interval
    [#(<v)/n, #(<=v)/n] overlaps [p−0.01, p+0.01] (accuracy=1000
    guarantees rank error ≤0.001 — the check is 10× the bound); the
    oracle asserts TRUE. The rank recheck is one broadcast join of the
    4-row sketch output back onto the stream plus a second map-side
    agg — no extra shuffle of the values. quality_percentiles above
    stays the exact value-hashed twin."""
    q = doc_stats(spark, sf_dir).select("lang", "quality_score")
    delta = 0.01
    sketch = q.groupBy("lang").agg(
        *[
            F.expr(f"percentile_approx(quality_score, {p}, 1000)").alias(
                f"_a{int(p * 100)}"
            )
            for p in _QP
        ]
    )
    joined = q.join(F.broadcast(sketch), "lang")
    rank_aggs = []
    for p in _QP:
        a = F.col(f"_a{int(p * 100)}")
        rank_aggs += [
            F.sum((F.col("quality_score") < a).cast("long")).alias(f"_lt{int(p*100)}"),
            F.sum((F.col("quality_score") <= a).cast("long")).alias(f"_le{int(p*100)}"),
        ]
    ranks = joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), *rank_aggs
    )
    n = F.col("n_docs")
    verdicts = [
        (
            (F.col(f"_lt{int(p*100)}") / n <= p + delta)
            & (F.col(f"_le{int(p*100)}") / n >= p - delta)
        ).alias(f"p{int(p*100)}_ok")
        for p in _QP
    ]
    return ranks.select("lang", "n_docs", *verdicts)


BENCH_MOD = 20  # doc_id % 20 == 0 <=> source 'src0' — the held-out eval set


@register(
    "contamination_check",
    f"""
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
    SELECT UNNEST({text.sql_shingles('d.text', n=3)}) AS shingle
    FROM documents d WHERE doc_id % {BENCH_MOD} = 0) x
  WHERE LENGTH(shingle) > 0
)
SELECT id, COUNT(*) AS n_sh, COUNT(b.shingle) AS n_hits,
       ROUND(COUNT(b.shingle) / CAST(COUNT(*) AS DOUBLE), 6) AS overlap_frac
FROM tr LEFT JOIN b ON tr.shingle = b.shingle
GROUP BY id
HAVING COUNT(b.shingle) > 0
""",
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination: per training doc, the count of its
    trigram shingles that appear anywhere in the benchmark set (source
    src0), via a broadcast semi-side join — the corpus stream is never
    shuffled (extension op, functions/dedup.contamination_hits). The
    mutant copies of src0 docs are the planted leaks the check must
    light up on."""
    sh = mutant_shingles(spark, sf_dir)
    train = sh.filter(
        ~((F.col("id") < MUT_OFFSET) & (F.col("id") % BENCH_MOD == 0))
    )
    bench_docs = t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % BENCH_MOD == 0
    )
    bench_sh = dedup._exploded_shingles(bench_docs, "text", "doc_id", 3)
    return dedup.contamination_hits(train, bench_sh)


# --- embedding preprocessing ------------------------------------------------

_EMB_D = "SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"


@register(
    "embedding_normalize",
    f"""
WITH e AS ({_EMB_D}),
n AS (SELECT vec_id, v, SQRT(list_dot_product(v, v)) AS nrm FROM e)
SELECT vec_id, CAST(u.i AS INT) AS pos,
       ROUND(v[CAST(u.i AS INT) + 1] /
             (CASE WHEN nrm = 0 THEN 1 ELSE nrm END), 6) AS unit_val
FROM n, UNNEST(range(0, len(v))) AS u(i)
""",
)
def q_embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization of the embedding column (extension op; map-only
    array fold + transform, functions/embeddings.l2_normalize). Output
    exploded to scalars for the cross-engine hash check."""
    emb = fan_out(spark, t(spark, sf_dir, "embeddings"))
    return embeddings.l2_normalize(emb).select(
        "vec_id", F.posexplode("unit_vec").alias("pos", "__u")
    ).select("vec_id", "pos", F.round("__u", 6).alias("unit_val"))


@register(
    "embedding_quantize",
    f"""
WITH e AS ({_EMB_D}),
s AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> ABS(x))) / 127.0 AS scale
      FROM e)
SELECT vec_id, CAST(u.i AS INT) AS pos,
       CASE WHEN scale = 0 THEN 0
            ELSE CAST(ROUND(v[CAST(u.i AS INT) + 1] / scale) AS INT) END AS q,
       ROUND(scale, 6) AS scale_r
FROM s, UNNEST(range(0, len(v))) AS u(i)
""",
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (extension op; map-only,
    functions/embeddings.quantize_int8) — the 4x storage/bandwidth cut
    before shipping vectors to an ANN index."""
    emb = fan_out(spark, t(spark, sf_dir, "embeddings"))
    return embeddings.quantize_int8(emb).select(
        "vec_id",
        F.posexplode("q_vec").alias("pos", "q"),
        F.round("scale", 6).alias("scale_r"),
    ).select("vec_id", "pos", "q", "scale_r")


@register(
    "embedding_label_centroids",
    f"""
WITH e AS ({_EMB_D})
SELECT label, CAST(u.i AS INT) AS pos,
       ROUND(AVG(v[CAST(u.i AS INT) + 1]), 6) AS centroid,
       COUNT(*) AS n_vectors
FROM e, UNNEST(range(0, len(v))) AS u(i)
GROUP BY label, CAST(u.i AS INT)
""",
)
def q_embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector / class centroids (extension op;
    functions/embeddings.label_centroids — posexplode + hash agg, the
    shuffle carries G x D partial-combined rows, never N x D raw)."""
    emb = fan_out(spark, t(spark, sf_dir, "embeddings"))
    cent = embeddings.label_centroids(emb)
    return cent.select(
        "label", "pos", F.round("centroid", 6).alias("centroid"), "n_vectors"
    )


# --- events: windowed / sessionized / JSON ----------------------------------


@register(
    "events_sliding_agg",
    """
WITH offs AS (SELECT unnest([0, 30]) AS off_min),
w AS (SELECT e.ts, e.value, e.event_type,
             DATE_TRUNC('hour', e.ts - (off_min * INTERVAL 1 MINUTE))
               + (off_min * INTERVAL 1 MINUTE) AS win_start
      FROM events e, offs)
SELECT CAST(win_start AS VARCHAR) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM w GROUP BY win_start, event_type
""",
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) event-time windows: 1 h span, 30 min hop via
    ``F.window(ts, '1 hour', '30 minutes')`` — each event lands in
    span/hop = 2 windows (Catalyst Expand, map-side) and the counts
    aggregate in ONE shuffle, identical machinery to the streaming
    form. The oracle reproduces Spark's epoch-aligned window start
    arithmetic with an explicit 2-offset unnest."""
    ev = events_df(spark, sf_dir)
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_windowed_agg",
    """
SELECT CAST(DATE_TRUNC('hour', ts) AS VARCHAR) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
""",
)
def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation — the batch form of
    the Structured Streaming job in streaming/jobs.py (same logical
    plan; readStream swaps in for read)."""
    ev = events_df(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "events_sessionize",
    f"""
WITH lagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events),
marked AS (
  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_sess
  FROM lagged),
sessions AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       CAST(MIN(ts_us) AS BIGINT) AS session_start_us,
       CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS duration_us
FROM sessions GROUP BY user_id, session_id
""",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization via lag + running sum windows (the
    batch twin of streaming session windows; partition key = user_id so
    the window shuffle scales with users, not a global sort)."""
    from pyspark.sql import Window

    ev = events_df(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.withColumn("prev_us", F.lag("ts_us").over(w)).withColumn(
        "new_sess",
        F.when(
            F.col("prev_us").isNull() | (F.col("ts_us") - F.col("prev_us") > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").cast("long").alias("session_start_us"),
        (F.max("ts_us") - F.min("ts_us")).cast("long").alias("duration_us"),
    )


@register(
    "events_json_extract",
    """
SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
       event_type,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
""",
)
def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction + bucket agg (data-plane JSON functions —
    absent in the reference (§2.12), native in Spark)."""
    ev = events_df(spark, sf_dir)
    return ev.select(
        (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket"),
        "event_type",
    ).groupBy("k_bucket", "event_type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "variant_json_stats",
    """
WITH e AS (SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k
           FROM events)
SELECT event_type,
       MIN(k) AS min_k, MAX(k) AS max_k,
       CAST(SUM(CAST(k AS BIGINT)) AS BIGINT) AS sum_k, COUNT(k) AS n_k,
       CAST(SUM(CAST(k AS BIGINT)) AS DOUBLE) / COUNT(k) AS avg_k
FROM e GROUP BY event_type
""",
)
def q_variant_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4 VARIANT: ``parse_json`` ingests
    the string ONCE into the binary variant encoding, then ``variant_get``
    does a typed path read — at scale this beats re-parsing JSON text per
    path access (events_json_extract is the string-path twin). The avg is
    computed as exact BIGINT sum / count divided in DOUBLE, so both
    engines round identically. Oracle reads the same path with DuckDB
    json_extract — VARIANT is an encoding choice, not a semantics
    change."""
    ev = events_df(spark, sf_dir)
    k = ev.select(
        "event_type",
        F.variant_get(F.parse_json("props"), "$.k", "int").alias("k"),
    )
    return k.groupBy("event_type").agg(
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum(F.col("k").cast("bigint")).alias("sum_k"),
        F.count("k").alias("n_k"),
        (F.sum(F.col("k").cast("bigint")).cast("double") / F.count("k")).alias(
            "avg_k"
        ),
    )


# --- multimodal -------------------------------------------------------------

_H_MEDIA = sql_h64("md5(text)")  # int of first 15 hex chars of the digest


_SQL_MEDIA_FEATURES = f"""
WITH m AS (
  SELECT doc_id AS media_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
         OCTET_LENGTH(encode(text)) AS n_bytes,
         md5(text) AS digest,
         CAST(CONCAT('0x', SUBSTR(md5(text), 1, 15)) AS BIGINT) AS h
  FROM documents)
SELECT media_id, kind, CAST(n_bytes AS BIGINT) AS n_bytes, digest,
       CAST(64 + h % 1920 AS INT) AS width,
       CAST(64 + (h >> 11) % 1080 AS INT) AS height,
       CAST(CASE WHEN kind IN ('audio', 'video')
                 THEN 1000 + (h >> 7) % 600000 ELSE 0 END AS INT) AS duration_ms,
       CAST(CASE WHEN kind = 'image' THEN 1
                 WHEN kind = 'video' THEN (1000 + (h >> 7) % 600000) // 40
                 ELSE 0 END AS INT) AS n_frames
FROM m
"""


@register("media_features", _SQL_MEDIA_FEATURES)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode + feature extraction through the Arrow-batched
    ``mapInPandas`` path (functions/media.py). The decode is the
    documented deterministic fake, which is what makes the Python-side
    op oracle-checkable byte-for-byte."""
    docs = docs_fanned(spark, sf_dir)
    return media.extract_features(media.synth_media(docs))


MEDIA_FIXTURE_ROOT = str(
    Path(__file__).resolve().parents[2] / ".cache" / "media_fixture"
)


@register("media_from_files", _SQL_MEDIA_FEATURES)
def q_media_from_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-file multimodal ingest: the documents table is materialized
    once per sf_dir as one binary file per row (fixture scaffolding —
    a real corpus already exists as files), then ingested with
    ``spark.read.format('binaryFile')`` into MEDIA_SCHEMA and decoded
    through the same Arrow-batched ``extract_features`` path. Shares
    media_features' oracle: payload bytes are identical, so every
    feature is too."""
    fixture = media.write_media_fixture(
        t(spark, sf_dir, "documents").select("doc_id", "text"),
        f"{MEDIA_FIXTURE_ROOT}/{sf_dir.strip('/').replace('/', '_')}",
    )
    return media.extract_features(media.read_media_files(spark, fixture))


@register(
    "media_resize",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
         text,
         CAST(CONCAT('0x', SUBSTR(md5(text), 1, 15)) AS BIGINT) AS h
  FROM documents),
dims AS (
  SELECT media_id, kind, text,
         CAST(64 + h % 1920 AS INT) AS width,
         CAST(64 + (h >> 11) % 1080 AS INT) AS height
  FROM m WHERE kind = 'image'),
scaled AS (
  SELECT *, LEAST(224, GREATEST(width, height)) AS out_long,
            GREATEST(width, height) AS long_in
  FROM dims)
SELECT media_id, kind, width, height,
       CAST(GREATEST(1, (width * out_long) // long_in) AS INT) AS out_width,
       CAST(GREATEST(1, (height * out_long) // long_in) AS INT) AS out_height,
       md5(text || '|' ||
           CAST(GREATEST(1, (width * out_long) // long_in) AS VARCHAR) || 'x' ||
           CAST(GREATEST(1, (height * out_long) // long_in) AS VARCHAR))
         AS resized_digest
FROM scaled
""",
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing (functions/media.resize_images): image rows
    filtered JVM-side, aspect-preserving integer target dims, Arrow-
    batched stub transform. Oracle recomputes the fake-decode dims and
    the (payload, out-dims) digest — the same cross-engine trick that
    makes media_features hash-checkable."""
    docs = docs_fanned(spark, sf_dir)
    return media.resize_images(media.synth_media(docs), max_side=224)


# --- language-model scoring (functions/lm.py) -------------------------------

from de_project_sprint_etl_spark.functions import lm  # noqa: E402


@register("bigram_lm_score", lm.sql_bigram_lm_score("documents"))
def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality scoring (KenLM-style perplexity
    filter reduced to an in-engine n-gram model): add-one-smoothed
    self-trained bigram model, per-doc bits-per-bigram. Training is two
    partial-combined aggs; scoring joins (doc, bigram)-TYPES against
    the model; the per-doc double sum folds an in-row sorted array so
    both engines add in the same order."""
    return lm.bigram_lm_score(docs_fanned(spark, sf_dir))


BM25_QUERY_TERMS = ("data", "model", "learning")


@register(
    "bm25_topk_docs",
    lm.sql_bm25_topk("documents", BM25_QUERY_TERMS, k=20),
)
def q_bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 retrieval for a fixed query-term bag. Per-doc
    term frequencies are in-row array filters (the corpus never
    shuffles); df/avgdl are a one-row broadcast aggregate; the score is
    a fixed-order expression so double addition is engine-identical."""
    return lm.bm25_topk(docs_fanned(spark, sf_dir), BM25_QUERY_TERMS, k=20)


PHRASE_QUERIES = ["table value", "fast merge batch"]


@register(
    "phrase_search",
    lm.sql_phrase_occurrences("documents", PHRASE_QUERIES),
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over a positional inverted index — the
    positional primitive completing the search tier (BM25 bag-of-words
    scoring, RRF fusion): posting lists (doc, term, pos) filtered to
    the query phrases' terms BEFORE the explode leaves the row (the
    touched index is O(query-term postings), never the vocabulary),
    then one equi-join per adjacency pos_{i+1} = pos_i + 1 — phrase
    match as a chain of hash joins, the standard positional-index
    evaluation (extension op; functions/lm.phrase_occurrences)."""
    return lm.phrase_occurrences(docs_fanned(spark, sf_dir), PHRASE_QUERIES)


# --- k-means clustering (functions/clustering.py) ---------------------------

from de_project_sprint_etl_spark.functions import clustering  # noqa: E402


@register("kmeans_embeddings", clustering.sql_kmeans("embeddings", k=8, iterations=2))
def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (2 Lloyd updates, k=8, deterministic lowest-id init) over
    the embeddings table — the IVF-index training step run in-engine.
    Assignment is a broadcast cross join (corpus never shuffles); the
    centroid update is the one shuffle, on (cluster, dim) cells; the
    DuckDB oracle replays the entire training run bit-identically
    (strict-order folds + sorted-fold means)."""
    emb = fan_out(spark, t(spark, sf_dir, "embeddings"))
    return clustering.kmeans(emb, k=8, iterations=2)


@register("bpe_merge_candidates", lm.sql_bpe_merge_candidates("documents", k=50))
def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training step: top-50 adjacent character-pair merge
    candidates, counted over the distinct word vocabulary weighted by
    word frequency (corpus-sized text -> vocab-sized work in the first
    partial-combined agg)."""
    return lm.bpe_merge_candidates(docs_fanned(spark, sf_dir), k=50)


@register(
    "event_journeys",
    f"""
WITH lagged AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events),
marked AS (
  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_sess
  FROM lagged),
sessions AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked),
paths AS (
  SELECT user_id, session_id,
         array_to_string(list(event_type ORDER BY ts_us, event_id)[1:3], '>') AS journey
  FROM sessions GROUP BY user_id, session_id)
SELECT journey, COUNT(*) AS n_sessions,
       CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, journey) AS INT) AS rank
FROM paths GROUP BY journey
ORDER BY n_sessions DESC, journey LIMIT 20
""",
)
def q_event_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journey mining: the top-20 session-opening event-type sequences
    (first 3 events per session). Sessions come from the same
    lag+running-sum assignment as events_sessionize (one user_id
    shuffle); the per-session path is an in-row (ts, event_id)-sorted
    collect — no second ordering shuffle — and the top-k is a
    TakeOrdered over the tiny journey-count table."""
    from pyspark.sql import Window

    ev = events_df(spark, sf_dir).select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sess = (
        ev.withColumn("prev_us", F.lag("ts_us").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_us").isNull()
                | (F.col("ts_us") - F.col("prev_us") > SESSION_GAP_US),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts_us", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
                1,
                3,
            ),
            ">",
        ).alias("journey")
    )
    counts = paths.groupBy("journey").agg(F.count(F.lit(1)).alias("n_sessions"))
    rw = Window.orderBy(F.col("n_sessions").desc(), F.col("journey").asc())
    return (
        counts.orderBy(F.col("n_sessions").desc(), F.col("journey").asc())
        .limit(20)
        .withColumn("rank", F.row_number().over(rw).cast("int"))
    )


# --- PMI bigram collocations -----------------------------------------------------

PMI_MIN_PAIR = 10


def _sql_pmi() -> str:
    toks = text.SQL_TOKENS.format(c="text")
    return f"""
WITH toked AS (SELECT {toks} AS t FROM documents),
uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c1
  FROM (SELECT UNNEST(t) AS w FROM toked) u
  WHERE LENGTH(w) > 0 GROUP BY w),
n1 AS (SELECT CAST(SUM(c1) AS BIGINT) AS n_uni FROM uni),
big AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM toked, UNNEST(CASE WHEN len(t) >= 2 THEN range(1, len(t)) ELSE [] END) AS r(i)
  WHERE LENGTH(t[i]) > 0 AND LENGTH(t[i + 1]) > 0),
pairs AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM big GROUP BY w1, w2),
n2 AS (SELECT CAST(SUM(c12) AS BIGINT) AS n_big FROM pairs)
SELECT p.w1, p.w2, p.c12,
       ROUND(LN((CAST(p.c12 AS DOUBLE) * n_uni * n_uni)
                / (CAST(n_big AS DOUBLE) * ua.c1 * ub.c1)), 6) AS pmi
FROM pairs p
JOIN uni ua ON ua.w = p.w1
JOIN uni ub ON ub.w = p.w2
CROSS JOIN n1 CROSS JOIN n2
WHERE p.c12 >= {PMI_MIN_PAIR}
"""


@register("token_pmi_bigrams", _sql_pmi())
def q_token_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information bigram collocations over the corpus
    — the word2phrase-style detector for multiword units worth fusing
    before tokenizer training: PMI = ln(p(w1,w2) / (p(w1) p(w2))) with
    unigram probabilities from occurrence counts and the pair
    probability from adjacent-bigram counts, reported for every pair
    seen >= {PMI_MIN_PAIR} times (a count floor, not a top-k — rank
    ties under ulp noise would make top-k engine-unstable, a frequency
    floor is exact).

    Scale shape: two partial-combined aggregates (the Zipf head
    collapses map-side), two vocabulary-keyed equi-joins onto the
    filtered pair list, and two 1-row broadcast totals; nothing touches
    a window or a global sort. The log's integer inputs are exact and
    the output rounds to 6, absorbing libm-vs-JVM last-ulp drift."""
    toked = docs_fanned(spark, sf_dir).select(
        text.tokens(F.col("text")).alias("__toks")
    )
    uni = (
        toked.select(F.explode("__toks").alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    )
    n1 = uni.agg(F.sum("c1").cast("bigint").alias("n_uni"))
    big = (
        toked.select(F.explode(lm._bigram_structs(F.col("__toks"))).alias("b"))
        .select("b.w1", "b.w2")
        .filter((F.length("w1") > 0) & (F.length("w2") > 0))
    )
    pairs = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    n2 = pairs.agg(F.sum("c12").cast("bigint").alias("n_big"))
    kept = pairs.filter(F.col("c12") >= PMI_MIN_PAIR)
    ua = uni.select(F.col("w").alias("w1"), F.col("c1").alias("c1a"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c1").alias("c1b"))
    return (
        kept.join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    (F.col("c12").cast("double") * F.col("n_uni") * F.col("n_uni"))
                    / (
                        F.col("n_big").cast("double")
                        * F.col("c1a")
                        * F.col("c1b")
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
