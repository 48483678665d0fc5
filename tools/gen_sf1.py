"""Generate a GENUINE sf1 corpus (10x the bench scale) for the
memory-cliff stress run (VERDICT r4, next-round #4).

Not a replica: every table is drawn fresh from the same distribution
family as the driver's sf0.1 fixtures (profiled in-session: key
cardinalities, date ranges, Poisson(4) lines-per-order, Exp(mean=50)
event values, 30-word document vocabulary with ~0.2% exact duplicates
and ~1% near-duplicates, 10-centroid unit-norm embeddings), so dedup /
ANN / retention queries see realistic structure instead of 8 identical
copies. Deterministic (numpy PCG64 seed 1042); output is cached at
.cache/sf1 and regenerated only if a table file is missing.

The correctness story does not depend on distribution fidelity: the
sf1 differential runs DuckDB on the SAME generated parquet, so any
distribution is a valid oracle input — fidelity only makes the
wall-times meaningful.

Usage: python tools/gen_sf1.py  →  prints the corpus dir.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "sf1"
)
SCALE = 10
N_CUST = 15_000 * SCALE
N_SUPP = 1_000 * SCALE
N_PART = 20_000 * SCALE
N_ORDERS = 150_000 * SCALE
N_EVENTS = 100_000 * SCALE
N_USERS = 1_500 * SCALE
N_DOCS = 5_000 * SCALE
N_VECS = 2_000 * SCALE

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["MEDIUM", "SMALL", "PROMO", "LARGE", "STANDARD", "ECONOMY"]
PNOUNS = ["ring", "bolt", "screw", "plate", "tube", "washer", "gear", "pin"]
PADJS = ["large", "hot", "blue", "red", "small", "dim", "cold", "pale"]
LANGS = ["en", "fr", "de", "es", "zh"]
DAY_US = 86_400_000_000


def _write(name: str, table: pa.Table) -> None:
    dst = os.path.join(OUT, f"{name}.parquet")
    pq.write_table(table, dst)
    print(f"wrote {name}: {table.num_rows} rows")


def _ts_us(days_from_epoch) -> pa.Array:
    return pa.array(
        (np.asarray(days_from_epoch, dtype=np.int64) * DAY_US),
        type=pa.timestamp("us"),
    )


def main() -> str:
    os.makedirs(OUT, exist_ok=True)
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    done = {t for t in tables if os.path.exists(os.path.join(OUT, f"{t}.parquet"))}
    # Resume is ALL-OR-NOTHING: skipping completed tables shifts the
    # single RNG stream, so a partially-regenerated corpus would have
    # e.g. lineitem shipdates drawn against fresh order dates unrelated
    # to the committed orders.parquet. A partial dir is wiped and the
    # whole corpus rebuilt from the seed — the only state that keeps
    # the documented seed-1042 determinism.
    if done and done != set(tables):
        for t in done:
            os.remove(os.path.join(OUT, f"{t}.parquet"))
        print(f"partial corpus ({len(done)}/{len(tables)} tables) wiped; rebuilding")
        done = set()
    rng = np.random.Generator(np.random.PCG64(1042))

    if "region" not in done or "nation" not in done:
        for t in ("region", "nation"):  # fixed dims, shared verbatim
            shutil.copyfile(
                os.path.join(BASE, f"{t}.parquet"),
                os.path.join(OUT, f"{t}.parquet"),
            )
            print(f"copied {t}")

    if "customer" not in done:
        keys = np.arange(N_CUST, dtype=np.int64)
        _write(
            "customer",
            pa.table(
                {
                    "c_custkey": keys,
                    "c_name": [f"Customer#{k:09d}" for k in keys],
                    "c_nationkey": rng.integers(0, 25, N_CUST).astype(np.int32),
                    "c_acctbal": np.round(
                        rng.uniform(-1000, 10_000, N_CUST), 2
                    ),
                    "c_mktsegment": rng.choice(SEGMENTS, N_CUST),
                }
            ),
        )

    if "supplier" not in done:
        keys = np.arange(N_SUPP, dtype=np.int64)
        _write(
            "supplier",
            pa.table(
                {
                    "s_suppkey": keys,
                    "s_name": [f"Supplier#{k:09d}" for k in keys],
                    "s_nationkey": rng.integers(0, 25, N_SUPP).astype(np.int32),
                    "s_acctbal": np.round(rng.uniform(-1000, 10_000, N_SUPP), 2),
                }
            ),
        )

    if "part" not in done:
        keys = np.arange(N_PART, dtype=np.int64)
        adj = rng.choice(PADJS, N_PART)
        noun = rng.choice(PNOUNS, N_PART)
        _write(
            "part",
            pa.table(
                {
                    "p_partkey": keys,
                    "p_name": [f"{a} {n}" for a, n in zip(adj, noun)],
                    "p_brand": [
                        f"Brand#{b}" for b in rng.integers(1, 26, N_PART)
                    ],
                    "p_type": rng.choice(PTYPES, N_PART),
                    "p_size": rng.integers(1, 51, N_PART).astype(np.int32),
                    "p_retailprice": np.round(
                        900.0 + (keys % 1000) * 0.1, 2
                    ),
                }
            ),
        )

    order_days = None
    if "orders" not in done or "lineitem" not in done:
        lo = (np.datetime64("1995-01-01") - np.datetime64("1970-01-01")).astype(int)
        hi = (np.datetime64("2001-08-02") - np.datetime64("1970-01-01")).astype(int)
        order_days = rng.integers(lo, hi, N_ORDERS)

    if "orders" not in done:
        _write(
            "orders",
            pa.table(
                {
                    "o_orderkey": np.arange(N_ORDERS, dtype=np.int64),
                    "o_custkey": rng.integers(0, N_CUST, N_ORDERS),
                    "o_orderstatus": rng.choice(["O", "P", "F"], N_ORDERS),
                    "o_totalprice": np.round(
                        rng.uniform(1000, 500_000, N_ORDERS), 2
                    ),
                    "o_orderdate": _ts_us(order_days),
                    "o_orderpriority": rng.choice(PRIORITIES, N_ORDERS),
                }
            ),
        )

    if "lineitem" not in done:
        n_lines = rng.poisson(4.0, N_ORDERS)
        okeys = np.repeat(np.arange(N_ORDERS, dtype=np.int64), n_lines)
        odays = np.repeat(order_days, n_lines)
        m = len(okeys)
        _write(
            "lineitem",
            pa.table(
                {
                    "l_orderkey": okeys,
                    "l_partkey": rng.integers(0, N_PART, m),
                    "l_suppkey": rng.integers(0, N_SUPP, m),
                    "l_linenumber": rng.integers(1, 8, m).astype(np.int32),
                    "l_quantity": rng.integers(1, 51, m).astype(np.float64),
                    "l_extendedprice": np.round(
                        rng.uniform(900, 105_000, m), 2
                    ),
                    "l_discount": np.round(rng.integers(0, 11, m) / 100.0, 2),
                    "l_tax": np.round(rng.integers(0, 9, m) / 100.0, 2),
                    "l_returnflag": rng.choice(["R", "N", "A"], m),
                    "l_linestatus": rng.choice(["O", "F"], m),
                    "l_shipdate": _ts_us(odays + rng.integers(1, 96, m)),
                }
            ),
        )

    if "events" not in done:
        lo = (np.datetime64("2024-01-01") - np.datetime64("1970-01-01")).astype(
            int
        ) * DAY_US
        span = 30 * DAY_US
        _write(
            "events",
            pa.table(
                {
                    "event_id": np.arange(N_EVENTS, dtype=np.int64),
                    "ts": pa.array(
                        lo + rng.integers(0, span, N_EVENTS),
                        type=pa.timestamp("us"),
                    ),
                    "user_id": rng.integers(0, N_USERS, N_EVENTS),
                    "event_type": rng.choice(
                        ["purchase", "signup", "click", "error", "view"],
                        N_EVENTS,
                    ),
                    "value": np.round(rng.exponential(50.0, N_EVENTS), 4),
                    "props": [
                        json.dumps({"k": int(k)})
                        for k in rng.integers(0, 100, N_EVENTS)
                    ],
                }
            ),
        )

    if "documents" not in done:
        lens = rng.integers(10, 101, N_DOCS)
        texts = [
            " ".join(rng.choice(VOCAB, n)) for n in lens
        ]
        # ~0.2% exact duplicates + ~1% near-duplicates (a few tokens
        # swapped for 'dup'), mirroring the driver corpus's dedup bait
        for i in rng.choice(N_DOCS, N_DOCS // 500, replace=False):
            texts[i] = texts[int(rng.integers(0, N_DOCS))]
        for i in rng.choice(N_DOCS, N_DOCS // 100, replace=False):
            src = texts[int(rng.integers(0, N_DOCS))].split()
            for j in rng.integers(0, len(src), 3):
                src[int(j)] = "dup"
            texts[i] = " ".join(src)
        langs = rng.choice(LANGS, N_DOCS, p=[0.4, 0.15, 0.15, 0.15, 0.15])
        _write(
            "documents",
            pa.table(
                {
                    "doc_id": np.arange(N_DOCS, dtype=np.int64),
                    "text": texts,
                    "lang": langs,
                    "source": [
                        f"src{s}" for s in rng.integers(0, 20, N_DOCS)
                    ],
                    "n_chars": np.array(
                        [len(t) for t in texts], dtype=np.int64
                    ),
                }
            ),
        )

    if "embeddings" not in done:
        dim, k = 64, 10
        cents = rng.normal(size=(k, dim))
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        labels = rng.integers(0, k, N_VECS)
        vecs = cents[labels] + 0.5 * rng.normal(size=(N_VECS, dim))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        _write(
            "embeddings",
            pa.table(
                {
                    "vec_id": np.arange(N_VECS, dtype=np.int64),
                    "embedding": pa.array(
                        list(vecs.astype(np.float32)),
                        type=pa.list_(pa.float32()),
                    ),
                    "label": labels.astype(np.int32),
                }
            ),
        )

    print(OUT)
    return OUT


if __name__ == "__main__":
    main()
