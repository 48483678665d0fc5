"""Property-based tests (hypothesis): random inputs vs pure-Python
reference implementations.

Example-based tests pin the cases we thought of; these sweep the ones
we didn't — tie timestamps, empty sides, all-duplicate keys, texts
landing exactly on chunk boundaries. Examples are kept small and few
(each example pays a Spark createDataFrame/collect round trip).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, ts) rows with deliberately tiny domains so collisions and ties
# are common rather than rare.
_probe_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=0, max_size=25
)
_build_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=0, max_size=25
)


@SETTINGS
@given(probe=_probe_rows, build=_build_rows)
def test_asof_join_matches_python_reference(spark, probe, build):
    from de_project_sprint_etl_spark.functions.asof import asof_join

    # build side must be unique per (key, ts) — the operator's contract
    build = sorted({(k, ts) for k, ts in build})
    bvals = {(k, ts): float(k * 100 + ts) for k, ts in build}

    pdf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(probe)], "rid long, k int, pts int"
    )
    bdf = spark.createDataFrame(
        [(k, ts, v) for (k, ts), v in sorted(bvals.items())],
        "k int, bts int, val double",
    )
    got = {
        r.rid: (r.bts, r.val)
        for r in asof_join(
            pdf, bdf, on=["k"], probe_ts="pts", build_ts="bts", build_cols=["val"]
        ).collect()
    }
    for i, (k, ts) in enumerate(probe):
        cands = [(bts, v) for (bk, bts), v in bvals.items() if bk == k and bts <= ts]
        want = max(cands) if cands else (None, None)
        assert got[i] == want, (i, k, ts, got[i], want)


@SETTINGS
@given(
    probe=_probe_rows,
    build=_build_rows,
    n_salts=st.integers(1, 8),
    hot=st.one_of(st.none(), st.integers(0, 5)),
)
def test_salted_join_matches_plain_join_property(spark, probe, build, n_salts, hot):
    from de_project_sprint_etl_spark.functions.skew import salted_join

    pdf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(probe)], "rid long, k int, x int"
    )
    bdf = spark.createDataFrame(
        [(k, ts) for k, ts in build], "k int, y int"
    )
    for how in ("inner", "left"):
        got = sorted(
            tuple(r)
            for r in salted_join(
                pdf, bdf, ["k"], n_salts=n_salts, how=how, hot_threshold=hot
            ).collect()
        )
        want = sorted(tuple(r) for r in pdf.join(bdf, ["k"], how).collect())
        assert got == want, (how, n_salts, hot)


@SETTINGS
@given(
    texts=st.lists(st.text(alphabet="abc ", max_size=40), min_size=1, max_size=8),
    size=st.integers(2, 12),
    overlap=st.integers(0, 6),
)
def test_chunking_reassembles_to_original(spark, texts, size, overlap):
    from de_project_sprint_etl_spark.functions.text import chunk_documents

    if overlap >= size:
        overlap = size - 1
    stride = size - overlap
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = chunk_documents(docs, size=size, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in enumerate(texts):
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        # expected chunk count
        n = len(text)
        want_chunks = max(1, -(-(max(n - overlap, 0)) // stride)) if n > 0 else 1
        assert len(chunks) == want_chunks, (text, size, overlap)
        # stitching chunk[0] + tail-past-overlap of each later chunk
        # reassembles the original text exactly
        rebuilt = ""
        for r in chunks:
            rebuilt = rebuilt[: r.chunk_start] + r.chunk_text
        assert rebuilt == text, (text, size, overlap)
        # every chunk is the substring it claims to be
        for r in chunks:
            assert r.chunk_text == text[r.chunk_start : r.chunk_start + size]


@SETTINGS
@given(texts=st.lists(st.text(alphabet="ab c.9", max_size=30), min_size=1, max_size=8))
def test_quality_signal_bounds(spark, texts):
    import math

    from de_project_sprint_etl_spark.functions.text import (
        with_repetition,
        with_token_entropy,
    )

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rep = {r.doc_id: r for r in with_repetition(docs).collect()}
    ent = {r.doc_id: r.token_entropy for r in with_token_entropy(docs).collect()}
    for i in range(len(texts)):
        assert 0.0 <= rep[i].distinct_token_ratio <= 1.0
        assert 0.0 <= rep[i].dup_trigram_frac <= 1.0
        assert ent[i] >= 0.0
        if rep[i].n_tokens > 0:
            # entropy of n tokens is at most log2(n) (+ rounding slack)
            assert ent[i] <= math.log2(rep[i].n_tokens) + 1e-6 or rep[i].n_tokens == 1


def test_cdc_apply_is_idempotent(spark):
    """Replaying the SAME changelog onto an already-updated state is a
    no-op (latest-wins with equal seqs re-selects the same rows minus
    the already-gone deletes) — the crash-retry safety property of the
    C5-style incremental flow."""
    from de_project_sprint_etl_spark.functions.cdc import apply_changes

    snap = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "k int, v string"
    )
    chg = spark.createDataFrame(
        [(i, f"u{i}", 1, "U") for i in range(0, 40, 3)]
        + [(i, None, 2, "D") for i in range(0, 40, 5)]
        + [(100 + i, f"n{i}", 1, "I") for i in range(4)],
        "k int, v string, seq long, op string",
    )
    once = apply_changes(snap, chg, keys=["k"])
    twice = apply_changes(once, chg, keys=["k"])
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])
_doc = st.lists(_word, min_size=0, max_size=14).map(" ".join)


@SETTINGS
@given(docs=st.lists(_doc, min_size=1, max_size=8))
def test_substring_profile_matches_python_reference(spark, docs):
    """positional_shingle_profile vs a brute-force Python window count
    (n=3 so short random docs still produce windows)."""
    from collections import Counter

    from de_project_sprint_etl_spark.functions.dedup import (
        positional_shingle_profile,
    )

    n = 3
    toks = {i: d.split(" ") if d else [""] for i, d in enumerate(docs)}
    wins = {
        i: [" ".join(t[j : j + n]) for j in range(len(t) - n + 1)]
        for i, t in toks.items()
    }
    counts = Counter(w for ws in wins.values() for w in ws)
    sdf = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_shingles, r.dup_shingles)
        for r in positional_shingle_profile(sdf, n=n).collect()
    }
    want = {
        i: (len(ws), sum(1 for w in ws if counts[w] > 1))
        for i, ws in wins.items()
        if ws
    }
    assert got == want, (got, want)


@SETTINGS
@given(docs=st.lists(_doc, min_size=1, max_size=8))
def test_strip_spans_matches_python_reference(spark, docs):
    from collections import Counter

    from de_project_sprint_etl_spark.functions.dedup import strip_duplicated_spans

    n = 3
    toks = {i: d.split(" ") if d else [""] for i, d in enumerate(docs)}
    wins = {
        i: [" ".join(t[j : j + n]) for j in range(len(t) - n + 1)]
        for i, t in toks.items()
    }
    counts = Counter(w for ws in wins.values() for w in ws)
    sdf = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        r.doc_id: r.text_clean
        for r in strip_duplicated_spans(sdf, n=n).collect()
    }
    for i, t in toks.items():
        dup_starts = [
            j for j, w in enumerate(wins[i]) if counts[w] > 1
        ]  # 0-based starts
        kept = [
            tok
            for p, tok in enumerate(t)
            if not any(s <= p <= s + n - 1 for s in dup_starts)
        ]
        assert got[i] == " ".join(kept), (i, t, dup_starts, got[i])


# --- oracle_canon rewrite property -------------------------------------------

_CANON_TABLES = ("orders", "lineitem", "events", "documents", "customer")
_CANON_ALIASES = (None, "x", "t1", "src", "AS x", "AS t1")
_CANON_SUFFIXES = ("", "WHERE 1 = 1", "LIMIT 3")


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(_CANON_TABLES),
            st.sampled_from(_CANON_ALIASES),
            st.sampled_from(_CANON_SUFFIXES),
        ),
        min_size=1,
        max_size=3,
    ),
    joiner=st.sampled_from(["UNION ALL", "JOIN-CHAIN"]),
)
def test_canonicalize_wraps_every_ref_and_preserves_results(data, joiner):
    """Grammar fuzz of the oracle rewrite: for random FROM/JOIN/alias/
    keyword-suffix combinations over the real tables, (a) EVERY base
    table reference gets wrapped (drift protection has no gaps), and
    (b) DuckDB results are value-identical before and after the
    rewrite (the identity property the whole gate rests on)."""
    import duckdb

    from de_project_sprint_etl_spark.plans.oracle_canon import canonicalize

    sf = "/root/testdata/sf0.001"
    if joiner == "JOIN-CHAIN" and len(data) > 1:
        # FROM t1 [a1] JOIN t2 [a2] ON 1=1 ... (suffixes dropped; the
        # ON clause exercises keyword-after-ref scanning)
        parts = []
        for i, (tbl, alias, _sfx) in enumerate(data):
            # DuckDB rejects duplicate aliases/bare refs in one FROM, so
            # join-chain refs always carry a unique synthetic alias; the
            # alias/keyword variants are exercised by the UNION branch
            # and the rewrite's own unit test
            ref = f"{tbl} j{i}"
            parts.append(ref if i == 0 else f"JOIN {ref} ON 1 = 1")
        sql = "SELECT COUNT(*) AS n FROM " + " ".join(parts)
        n_refs = len(data)
    else:
        branches = []
        for tbl, alias, sfx in data:
            ref = f"{tbl} {alias}" if alias else tbl
            branches.append(f"(SELECT COUNT(*) AS n FROM {ref} {sfx})".strip())
        sql = " UNION ALL ".join(branches)
        n_refs = len(data)

    out = canonicalize(sql)
    assert out.count("(SELECT CAST(") == n_refs, (sql, out)

    con = duckdb.connect()
    for t in _CANON_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    assert sorted(con.sql(sql).fetchall()) == sorted(con.sql(out).fetchall()), (
        sql,
        out,
    )


# --- scd2_weeks_overlap sweep line vs naive overlap ---------------------------

_intervals = st.lists(
    st.tuples(
        st.integers(0, 3),              # custkey
        st.integers(0, 1),              # priority
        st.integers(0, 30),             # valid_from day offset
        st.one_of(st.none(), st.integers(0, 40)),  # run length (None = open)
    ),
    min_size=0,
    max_size=20,
)
_obs_dates = st.lists(st.integers(0, 34), min_size=1, max_size=20)


@SETTINGS
@given(intervals=_intervals, dates=_obs_dates)
def test_scd2_weeks_overlap_sweepline_matches_naive(spark, intervals, dates):
    """The round-4 sweep-line rewrite must equal the naive per-(interval,
    week) overlap count on RANDOM interval sets and week dims — ties,
    contained intervals, open intervals, multi-interval customers,
    weeks with no overlaps, intervals outside the calendar."""
    import datetime as dt
    from unittest.mock import patch

    from pyspark.sql import Row

    from de_project_sprint_etl_spark.plans import analytics

    base = dt.date(2024, 1, 1)
    day = lambda o: base + dt.timedelta(days=o)  # noqa: E731

    # weeks dim: [min,max] observed date per 7-day bucket, period = rank
    buckets = {}
    for d in dates:
        buckets.setdefault(d // 7, []).append(d)
    weeks = [
        (day(min(v)), day(max(v)), i + 1)
        for i, (_, v) in enumerate(sorted(buckets.items()))
    ]
    weeks_df = spark.createDataFrame(
        [Row(start_date=s, end_date=e, period=p) for s, e, p in weeks]
    )
    max_end = max(e for _, e, _ in weeks)

    dim_rows = [
        Row(
            o_custkey=c,
            priority=str(p),
            valid_from=str(day(vf)),
            valid_to=None if ln is None else str(day(vf + ln)),
        )
        for c, p, vf, ln in intervals
    ]
    dim_df = spark.createDataFrame(
        dim_rows,
        "o_custkey long, priority string, valid_from string, valid_to string",
    )

    with patch.object(
        analytics, "q_scd2_customer_priority", lambda s, d: dim_df
    ), patch.object(analytics, "weeks_dim_cached", lambda s, d: weeks_df):
        got = {
            (r.period, r.priority): (r.n_versions, r.n_customers)
            for r in analytics.q_scd2_weeks_overlap(spark, "x").collect()
        }
    spark.catalog.clearCache()

    want = {}
    for s, e, p in weeks:
        per_prio = {}
        for c, pr, vf, ln in intervals:
            a = day(vf)
            b = max_end if ln is None else day(vf + ln)
            if a > b:
                continue
            if a <= e and s <= b:  # overlap with the week's [min,max]
                n, cs = per_prio.get(str(pr), (0, set()))
                cs.add(c)
                per_prio[str(pr)] = (n + 1, cs)
        for pr, (n, cs) in per_prio.items():
            want[(p, pr)] = (n, len(cs))
    assert got == want, (got, want, weeks, intervals)


# word pools small enough that docs share shingles constantly — the
# prefix/positional pruning must never lose a qualifying pair
_ng_docs = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=9),
    min_size=0,
    max_size=14,
)


@SETTINGS
@given(docs=_ng_docs, max_df=st.integers(1, 10), t=st.sampled_from([0.2, 0.3, 0.5, 0.75, 1.0, 1 / 3]))
def test_ngram_jaccard_prefix_join_matches_naive(spark, docs, max_df, t):
    """The prefix-filtered candidate join + array verification must
    produce EXACTLY the naive all-pairs answer (same pairs, same shared
    counts) for any docs, df-cut and threshold — the losslessness
    theorem (first shared sid of a qualifying pair lies in both prefixes
    and survives the positional filter) checked mechanically."""
    from de_project_sprint_etl_spark.functions import dedup

    n = 2
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    pdf = spark.createDataFrame(rows or [(0, "")], "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): (r.shared, r.n_a, r.n_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(
            pdf, n=n, min_jaccard=t, max_shingle_df=max_df
        ).collect()
    }

    # naive reference: shingle sets in python, df-cut, all pairs
    sets = {}
    for i, toks in enumerate(docs):
        sh = {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}
        sets[i] = sh
    df_cnt: dict[str, int] = {}
    for sh in sets.values():
        for s in sh:
            df_cnt[s] = df_cnt.get(s, 0) + 1
    kept = {s for s, c in df_cnt.items() if c <= max_df}
    sets = {i: sh & kept for i, sh in sets.items()}
    want = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a_, b_ = ids[x], ids[y]
            sa, sb = sets[a_], sets[b_]
            if not sa or not sb:
                continue
            shared = len(sa & sb)
            if shared == 0:
                continue
            j = round(shared / (len(sa) + len(sb) - shared), 6)
            if j >= t:
                want[(a_, b_)] = (shared, len(sa), len(sb), j)
    assert got == want, (got, want, docs, max_df, t)


def test_single_pass_normalizer_equals_two_pass_reference():
    """r6: norm_text/SQL_NORM/py_norm_text were rewritten from
    strip-then-collapse (two regex passes) to one pass replacing each
    non-alphanumeric RUN with a single space. The forms are equivalent
    by construction (both emit the [a-z0-9]+ tokens joined by single
    spaces); this pins it against the verbatim old Python twin on
    adversarial inputs."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from de_project_sprint_etl_spark.functions.text import py_norm_text

    def two_pass(s: str) -> str:  # the pre-r6 implementation, verbatim
        return re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", s.lower())).strip()

    @settings(max_examples=500, deadline=None)
    @given(st.text(max_size=60))
    def check(s):
        assert py_norm_text(s) == two_pass(s), repr(s)

    check()
    for s in ("", "  ", "a!!b", "A\t B", "héllo wörld", "a\xa0b", "??", "x1 2y"):
        assert py_norm_text(s) == two_pass(s), repr(s)
