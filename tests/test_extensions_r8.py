"""Round-8 second-wave extension ops: Pareto frontier, Gini, RFM,
KS drift, PMI collocations, mixture/epochs planning, dup-cluster
quality — each checked against an independent Python/numpy reference
or a hand fixture, never against its own oracle SQL."""

from __future__ import annotations

import math
import re
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__  # noqa: E402,F401 — populates the registry

from de_project_sprint_etl_spark.plans.registry import RAW_QUERIES  # noqa: E402
from de_project_sprint_etl_spark.plans.testdata import t  # noqa: E402

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _write_docs(tmp_path, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["src0"] * len(texts)),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))


# --- Pareto frontier ---------------------------------------------------------


def test_pareto_frontier_matches_bruteforce(spark):
    """Exact set equality with an O(n^2) Python dominance scan over the
    distinct (price, date) points at sf0.001."""
    pts = {
        (r.price, str(r.odate)): (r.n_orders, r.min_orderkey)
        for r in t(spark, SF, "orders")
        .groupBy(
            F.col("o_totalprice").alias("price"),
            F.col("o_orderdate").cast("date").alias("odate"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderkey").alias("min_orderkey"),
        )
        .collect()
    }
    keys = list(pts)
    frontier = {
        (p, d)
        for p, d in keys
        if not any(
            (p2 >= p and d2 >= d and (p2 > p or d2 > d)) for p2, d2 in keys
        )
    }
    rows = RAW_QUERIES["pareto_frontier_orders"](spark, SF).collect()
    got = {(r.price, r.odate) for r in rows}
    assert got == frontier
    for r in rows:
        assert (r.n_orders, r.min_orderkey) == pts[(r.price, r.odate)]


# --- Gini --------------------------------------------------------------------


def test_gini_matches_python_rank_formula(spark):
    per = (
        t(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
            .alias("rev")
        )
        .collect()
    )
    revs = sorted((r.rev, r.o_custkey) for r in per)
    n = len(revs)
    s_w = sum(r for r, _ in revs)
    s_iw = sum((i + 1) * r for i, (r, _) in enumerate(revs))
    expect = round(2.0 * s_iw / (n * s_w) - (n + 1.0) / n, 6)
    row = RAW_QUERIES["gini_revenue_concentration"](spark, SF).collect()[0]
    assert row.n_customers == n
    assert row.total_revenue_cents == s_w
    assert abs(row.gini - expect) < 1e-9
    assert 0.0 <= row.gini < 1.0


# --- RFM ---------------------------------------------------------------------


def _ntile(keys, tiles=4):
    """Standard SQL NTILE over an already-sorted key list: the first
    n % tiles buckets get one extra row."""
    n = len(keys)
    base, rem = divmod(n, tiles)
    out, idx = {}, 0
    for b in range(1, tiles + 1):
        size = base + (1 if b <= rem else 0)
        for _ in range(size):
            out[keys[idx]] = b
            idx += 1
    return out


def test_rfm_segments_match_python_ntile(spark):
    per = {
        r.o_custkey: (str(r.last_date), r.n_orders, r.rev)
        for r in t(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_date"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
            .alias("rev"),
        )
        .collect()
    }
    custs = list(per)
    r_t = _ntile(sorted(custs, key=lambda c: (per[c][0], c)))
    f_t = _ntile(sorted(custs, key=lambda c: (per[c][1], c)))
    m_t = _ntile(sorted(custs, key=lambda c: (per[c][2], c)))
    expect = {}
    for c in custs:
        key = (r_t[c], f_t[c], m_t[c])
        n, so, sr = expect.get(key, (0, 0, 0))
        expect[key] = (n + 1, so + per[c][1], sr + per[c][2])
    rows = RAW_QUERIES["rfm_customer_segments"](spark, SF).collect()
    got = {
        (r.r_score, r.f_score, r.m_score): (
            r.n_customers,
            r.sum_orders,
            r.sum_revenue_cents,
        )
        for r in rows
    }
    assert got == expect
    assert sum(v[0] for v in got.values()) == len(custs)


# --- KS drift ----------------------------------------------------------------


def test_ks_zero_on_identical_sides(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = [1.0, 2.0, 3.0, 4.0, 5.0] * 4
    ts = [100 for _ in range(10)] + [2_000_000_000_000_000 for _ in range(10)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(20), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * 20, pa.int64()),
            "event_type": pa.array(["a"] * 20),
            "value": pa.array(vals[:10] + vals[:10], pa.float64()),
            "props": pa.array(["{}"] * 20),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    row = RAW_QUERIES["ks_value_drift"](spark, str(tmp_path)).collect()[0]
    assert row.n_a == 10 and row.n_b == 10
    assert row.ks_stat == 0.0


def test_ks_matches_numpy_binned_ecdf(spark):
    import numpy as np

    from de_project_sprint_etl_spark.plans.governance import KS_BINS, PSI_SPLIT
    from de_project_sprint_etl_spark.plans.testdata import events_df

    ev = events_df(spark, SF01).select("ts", "value").collect()
    split = PSI_SPLIT
    a = np.array([r.value for r in ev if str(r.ts) < split])
    b = np.array([r.value for r in ev if str(r.ts) >= split])
    lo, hi = min(a.min(), b.min()), max(a.max(), b.max())
    width = (hi - lo) / KS_BINS
    bin_a = np.minimum(np.floor((a - lo) / width), KS_BINS - 1).astype(int)
    bin_b = np.minimum(np.floor((b - lo) / width), KS_BINS - 1).astype(int)
    ca = np.cumsum(np.bincount(bin_a, minlength=KS_BINS)) / len(a)
    cb = np.cumsum(np.bincount(bin_b, minlength=KS_BINS)) / len(b)
    d = np.abs(ca - cb)
    row = RAW_QUERIES["ks_value_drift"](spark, SF01).collect()[0]
    assert row.n_a == len(a) and row.n_b == len(b)
    assert abs(row.ks_stat - round(float(d.max()), 6)) < 1e-6
    assert 0.0 <= row.ks_stat <= 1.0


# --- PMI ---------------------------------------------------------------------


def test_pmi_matches_hand_computation(spark, tmp_path):
    from de_project_sprint_etl_spark.plans.llm import PMI_MIN_PAIR

    texts = ["a b " * 12, "c d " * 5 + "a b"]
    _write_docs(tmp_path, [s.strip() for s in texts])

    def toks(s):
        return [w for w in re.sub(r"[^a-z0-9]+", " ", s.lower()).split() if w]

    uni, pairs, n1, n2 = {}, {}, 0, 0
    for s in texts:
        tk = toks(s)
        for w in tk:
            uni[w] = uni.get(w, 0) + 1
            n1 += 1
        for w1, w2 in zip(tk, tk[1:]):
            pairs[(w1, w2)] = pairs.get((w1, w2), 0) + 1
            n2 += 1
    expect = {
        (w1, w2): (
            c12,
            round(math.log((c12 * n1 * n1) / (n2 * uni[w1] * uni[w2])), 6),
        )
        for (w1, w2), c12 in pairs.items()
        if c12 >= PMI_MIN_PAIR
    }
    rows = RAW_QUERIES["token_pmi_bigrams"](spark, str(tmp_path)).collect()
    got = {(r.w1, r.w2): (r.c12, r.pmi) for r in rows}
    assert set(got) == set(expect)
    for k, (c, p) in expect.items():
        assert got[k][0] == c
        assert abs(got[k][1] - p) < 1e-6


def test_pmi_real_corpus_shape(spark):
    from de_project_sprint_etl_spark.plans.llm import PMI_MIN_PAIR

    rows = RAW_QUERIES["token_pmi_bigrams"](spark, SF01).collect()
    assert rows
    assert all(r.c12 >= PMI_MIN_PAIR for r in rows)
    # PMI is bounded above by ln(n_uni^2 / n_big) at c12 = c1a = c1b;
    # just pin the gross scale to catch formula inversions
    assert all(-30 < r.pmi < 30 for r in rows)


# --- mixture / epochs plan -----------------------------------------------------


def test_mixture_epochs_plan_invariants(spark):
    from de_project_sprint_etl_spark.plans.curation import EPOCH_BUDGET_MULT

    rows = RAW_QUERIES["mixture_epochs_plan"](spark, SF01).collect()
    assert len(rows) == 20  # every source planned
    assert abs(sum(r.target_share for r in rows) - 1.0) < 1e-4
    total = sum(r.avail_tokens for r in rows)
    budget = EPOCH_BUDGET_MULT * total
    assert sum(r.target_tokens for r in rows) <= budget
    assert sum(r.target_tokens for r in rows) > budget - len(rows)  # floor slack
    for r in rows:
        assert r.target_share > 0
        assert r.epochs == round(r.target_tokens / r.avail_tokens, 6)


# --- dup-cluster quality report -------------------------------------------------


def test_dup_cluster_quality_consistent_with_groups(spark):
    rows = RAW_QUERIES["dup_cluster_quality_report"](spark, SF01).collect()
    assert rows
    for r in rows:
        assert r.group_size >= 2
        assert 0.0 <= r.avg_best_quality <= 1.0
        assert r.avg_quality_spread >= 0.0
        assert r.avg_dropped_loss >= 0.0
        # the mean dropped gap can't exceed the mean spread scaled by
        # members (loss <= spread since every dropped member is >= min)
        assert r.avg_dropped_loss <= r.avg_quality_spread + 1e-9
    # group census agrees with the registered keep-best pass: survivors
    # whose group has >1 member == number of dup groups
    kb = RAW_QUERIES["near_dedup_keep_best"](spark, SF01)
    n_dup_groups = kb.filter(F.col("group_id") != F.col("doc_id")).count()
    # keeper may BE the min-id doc (group_id == doc_id), so count via
    # the report instead: every group has exactly one keeper
    assert sum(r.n_groups for r in rows) >= n_dup_groups


# --- quality ROC-AUC -----------------------------------------------------------


def test_auc_matches_numpy_rank_auc(spark):
    import numpy as np

    scored = RAW_QUERIES["linreg_quality_train"](spark, SF).collect()
    pred = np.array([r.pred for r in scored])
    y = np.array([r.y for r in scored])
    order = np.argsort(pred, kind="mergesort")
    ranks = np.empty(len(pred))
    sp = pred[order]
    i = 0
    pos = 1.0
    while i < len(sp):
        j = i
        while j < len(sp) and sp[j] == sp[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average rank of the tie run
        i = j
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    auc = (ranks[y == 1.0].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    row = RAW_QUERIES["quality_roc_auc"](spark, SF).collect()[0]
    assert row.n_pos == n_pos and row.n_neg == n_neg
    assert abs(row.auc - round(auc, 6)) < 1e-6
    assert 0.0 <= row.auc <= 1.0


# --- Benford audit ---------------------------------------------------------------


def test_benford_matches_python(spark):
    from de_project_sprint_etl_spark.plans.governance import BENFORD_P

    prices = [
        r.o_totalprice for r in t(spark, SF, "orders").select("o_totalprice").collect()
    ]
    counts = {}
    for p in prices:
        d = int(str(int(math.floor(p * 100 + 0.5)))[0])
        counts[d] = counts.get(d, 0) + 1
    n = len(prices)
    rows = RAW_QUERIES["benford_price_audit"](spark, SF).collect()
    assert sum(r.n_obs for r in rows) == n
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.n_obs == counts[r.digit]
        exp = n * BENFORD_P[r.digit]
        assert abs(r.chi2_term - round((r.n_obs - exp) ** 2 / exp, 6)) < 1e-5
        assert r.benford_p == BENFORD_P[r.digit]


# --- compaction plan --------------------------------------------------------------


def test_compaction_plan_first_fit_invariants(spark):
    from de_project_sprint_etl_spark.plans.analytics import (
        COMPACTION_TARGET_BYTES,
    )

    rows = sorted(
        RAW_QUERIES["compaction_bin_plan"](spark, SF01).collect(),
        key=lambda r: r.day,
    )
    # replay the running-sum assignment in Python
    cum = 0
    bins = {}
    for r in rows:
        assert r.bin_id == cum // COMPACTION_TARGET_BYTES
        cum += r.part_bytes
        bins.setdefault(r.bin_id, 0)
        bins[r.bin_id] += r.part_bytes
    # bin ids are non-decreasing with day (time locality preserved)
    ids = [r.bin_id for r in rows]
    assert ids == sorted(ids)
    # every bin except possibly the last is filled past the target
    # minus its own last part (first-fit property)
    for b, total in bins.items():
        if b != max(bins):
            assert total >= COMPACTION_TARGET_BYTES - max(
                r.part_bytes for r in rows
            )


# --- dataset card ------------------------------------------------------------------


def test_dataset_card_matches_python_census(spark):
    from de_project_sprint_etl_spark.functions.text import py_norm_text

    docs = t(spark, SF, "documents").select("text", "lang").collect()
    n = len(docs)
    uniq = len({py_norm_text(r.text) for r in docs})
    langs = {}
    for r in docs:
        langs[r.lang] = langs.get(r.lang, 0) + 1
    top = sorted(langs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    row = RAW_QUERIES["dataset_card_stats"](spark, SF).collect()[0]
    assert row.n_docs == n
    assert row.n_langs == len(langs)
    assert row.top_lang == top[0]
    assert abs(row.top_lang_share - round(top[1] / n, 6)) < 1e-9
    assert abs(row.exact_dup_rate - round(1.0 - uniq / n, 6)) < 1e-9
    assert abs(row.mean_tokens_per_doc - round(row.n_tokens / n, 6)) < 1e-6
    assert 0.0 <= row.mean_quality <= 1.0


# --- dedup blocking eval -------------------------------------------------------------


def test_blocking_eval_matches_python_census(spark):
    from de_project_sprint_etl_spark.functions.text import py_norm_text
    from de_project_sprint_etl_spark.plans.llm import MUT_OFFSET

    base = {
        r.doc_id: r.text
        for r in t(spark, SF, "documents").select("doc_id", "text").collect()
    }
    corpus = dict(base)
    for did, txt in base.items():
        if did % 5 == 0:
            mut = " ".join(py_norm_text(txt).split()[2:])
            if mut:
                corpus[did + MUT_OFFSET] = mut

    def feats(txt):
        tk = py_norm_text(txt).split(" ")
        return (len(txt) // 64, len(tk) // 8, tk[0])

    fmap = {did: feats(txt) for did, txt in corpus.items()}
    n = len(corpus)
    total = n * (n - 1) // 2
    truth = [
        (did, did + MUT_OFFSET) for did in corpus if did + MUT_OFFSET in corpus
    ]
    rows = {
        r.blocking_key: r
        for r in RAW_QUERIES["dedup_blocking_eval"](spark, SF).collect()
    }
    assert set(rows) == {"len64", "tok8", "first_tok"}
    for i, key in enumerate(["len64", "tok8", "first_tok"]):
        blocks = {}
        for did in corpus:
            blocks[fmap[did][i]] = blocks.get(fmap[did][i], 0) + 1
        cand = sum(nb * (nb - 1) // 2 for nb in blocks.values())
        co = sum(1 for a, b in truth if fmap[a][i] == fmap[b][i])
        r = rows[key]
        assert r.n_blocks == len(blocks)
        assert r.candidate_pairs == cand
        assert r.n_truth == len(truth)
        assert abs(r.reduction_ratio - round(1.0 - cand / total, 6)) < 1e-9
        assert abs(r.pair_completeness - round(co / len(truth), 6)) < 1e-9


# --- ngram novelty curve -------------------------------------------------------------


def test_novelty_curve_matches_python(spark):
    from de_project_sprint_etl_spark.functions.text import py_norm_text
    from de_project_sprint_etl_spark.plans.curation import NOVELTY_BUCKETS

    docs = {
        r.doc_id: r.text
        for r in t(spark, SF, "documents").select("doc_id", "text").collect()
    }
    sh = {}
    for did, txt in docs.items():
        tk = py_norm_text(txt).split(" ")
        sh[did] = {
            " ".join(tk[i : i + 3]) for i in range(len(tk) - 2)
        } - {""}
    first = {}
    for did in sorted(sh):
        for g in sh[did]:
            first.setdefault(g, did)
    per = {
        did: (len(g), sum(1 for x in g if first[x] == did))
        for did, g in sh.items()
        if g
    }
    mn, mx = min(per), max(per)
    width = (mx - mn) // NOVELTY_BUCKETS + 1
    expect = {}
    for did, (ns, nw) in per.items():
        b = (did - mn) // width
        nd, s_, w_ = expect.get(b, (0, 0, 0))
        expect[b] = (nd + 1, s_ + ns, w_ + nw)
    rows = RAW_QUERIES["ngram_novelty_curve"](spark, SF).collect()
    got = {r.bucket: (r.n_docs, r.n_shingles, r.n_new) for r in rows}
    assert got == expect
    for r in rows:
        assert abs(r.novelty_rate - round(r.n_new / r.n_shingles, 6)) < 1e-9
    # novelty decays: the first bucket is the most novel
    first_b = min(got)
    assert rows and max(rows, key=lambda r: r.novelty_rate).bucket == first_b


# --- PCA variance ----------------------------------------------------------------------


def test_pca_variance_matches_numpy_power_iteration(spark):
    import numpy as np

    from de_project_sprint_etl_spark.plans.curation import PCA_ITERS, PCA_SCALE

    emb = t(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    X = np.array(
        [
            [math.floor(float(a) * PCA_SCALE + 0.5) for a in r.embedding]
            for r in emb
        ],
        dtype=object,  # exact python ints, like the engines' DECIMAL stage
    )
    n, d = X.shape
    A = X.T @ X
    s = X.sum(axis=0)
    M = (n * A - np.outer(s, s)).astype(np.float64)
    v = np.zeros(d)
    v[0] = 1.0
    for _ in range(PCA_ITERS):
        w = M @ v
        v = w / math.sqrt(float(w @ w))
    lam = float(v @ (M @ v))
    ratio = lam / float(np.trace(M))
    row = RAW_QUERIES["embedding_pca_variance"](spark, SF).collect()[0]
    assert row.n_vecs == n and row.dim == d
    # numpy's pairwise summation differs from the engines' sequential
    # folds only in last ulps — 1e-5 on a 6-decimal output is slack
    assert abs(row.explained_ratio - round(ratio, 6)) < 1e-5
    assert 0.0 < row.explained_ratio <= 1.0 + 1e-9
    assert row.top_dim == int(np.argmax(np.abs(v))) + 1


# --- plan-shape pins ---------------------------------------------------------------


def _plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_new_ops_plan_shapes(spark):
    """Static-plan pins for the session's ops: the 1-row/tiny frames ride
    BroadcastExchange (never a real cartesian), scans prune to the
    referenced columns, and nothing plans a CartesianProduct."""
    for name in (
        "pareto_frontier_orders",
        "gini_revenue_concentration",
        "rfm_customer_segments",
        "ks_value_drift",
        "token_pmi_bigrams",
        "mixture_epochs_plan",
        "benford_price_audit",
        "compaction_bin_plan",
        "dedup_blocking_eval",
        "ngram_novelty_curve",
        "quality_roc_auc",
        "dataset_card_stats",
    ):
        plan = _plan_of(RAW_QUERIES[name](spark, SF))
        assert "CartesianProduct" not in plan, name
    # the 1-row stats/total frames broadcast in the crossJoin-composed ops
    for name in ("ks_value_drift", "token_pmi_bigrams", "benford_price_audit"):
        plan = _plan_of(RAW_QUERIES[name](spark, SF))
        assert "BroadcastExchange" in plan, name
    # orders-grain ops read only the referenced columns (column pruning
    # reaches the scan)
    plan = _plan_of(RAW_QUERIES["benford_price_audit"](spark, SF))
    assert "o_orderkey" not in plan.split("Scan parquet")[1][:500], plan[:200]
