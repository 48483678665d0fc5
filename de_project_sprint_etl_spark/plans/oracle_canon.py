"""Drift-proofing for the DuckDB oracle side of the correctness gate.

The fixture generator has changed physical column types between rounds
(round 2: ``events.ts`` int64-nanos → parquet ``timestamp[us]``; the
driver run lost EVERY query to the resulting AnalysisException before
the scan-layer coercion in ``plans.testdata.t`` was added). The Spark
side is now drift-proof — ``t()`` casts drifted columns back to the
canonical logical schema and ``events_df()`` decodes any plausible
epoch encoding — but the oracle side was still a set of static SQL
strings that assumed the CURRENT physical types. If the generator
drifts again, DuckDB's views change type and the oracles either error
or silently disagree, zeroing the round for no engine reason.

This module rewrites every registered oracle at ``oracle_sql()`` time,
replacing each base-table reference with an inline derived table that
casts every column to the same canonical logical type the Spark scan
layer produces (mirroring ``plans.testdata._CANONICAL``). When the
fixture already matches, every cast is an identity, so the rewrite is
value-neutral — the full differential run is the proof.

``events.ts`` needs more than a cast: an epoch-encoded BIGINT cannot be
``CAST`` to TIMESTAMP in DuckDB, and the magnitude decides the unit.
The expression below is type-polymorphic via a VARCHAR round-trip
(valid for BIGINT, TIMESTAMP, TIMESTAMP_NS, and TIMESTAMPTZ inputs
alike) and applies the same magnitude bands as the Spark decode in
``plans.testdata.events_df`` — the two sides stay bit-identical for
any fixture date between 1973 and 5138 under every encoding.
"""

from __future__ import annotations

import re

# Canonical DuckDB type per column, mirroring plans.testdata._CANONICAL.
# ``embedding`` is intentionally ABSENT: float→double drift passes
# through unchanged on BOTH sides (Spark's scan layer documents why a
# float round-trip would lose precision vs DuckDB reading the file).
_CASTS: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "INTEGER", "r_name": "VARCHAR"},
    "nation": {
        "n_nationkey": "INTEGER",
        "n_name": "VARCHAR",
        "n_regionkey": "INTEGER",
    },
    "customer": {
        "c_custkey": "BIGINT",
        "c_name": "VARCHAR",
        "c_nationkey": "INTEGER",
        "c_acctbal": "DOUBLE",
        "c_mktsegment": "VARCHAR",
    },
    "supplier": {
        "s_suppkey": "BIGINT",
        "s_name": "VARCHAR",
        "s_nationkey": "INTEGER",
        "s_acctbal": "DOUBLE",
    },
    "part": {
        "p_partkey": "BIGINT",
        "p_name": "VARCHAR",
        "p_brand": "VARCHAR",
        "p_type": "VARCHAR",
        "p_size": "INTEGER",
        "p_retailprice": "DOUBLE",
    },
    "orders": {
        "o_orderkey": "BIGINT",
        "o_custkey": "BIGINT",
        "o_orderstatus": "VARCHAR",
        "o_totalprice": "DOUBLE",
        "o_orderdate": "TIMESTAMP",
        "o_orderpriority": "VARCHAR",
    },
    "lineitem": {
        "l_orderkey": "BIGINT",
        "l_partkey": "BIGINT",
        "l_suppkey": "BIGINT",
        "l_linenumber": "INTEGER",
        "l_quantity": "DOUBLE",
        "l_extendedprice": "DOUBLE",
        "l_discount": "DOUBLE",
        "l_tax": "DOUBLE",
        "l_returnflag": "VARCHAR",
        "l_linestatus": "VARCHAR",
        "l_shipdate": "TIMESTAMP",
    },
    "events": {
        "event_id": "BIGINT",
        # ts handled by _EVENTS_TS_EXPR, not a plain cast
        "user_id": "BIGINT",
        "event_type": "VARCHAR",
        "value": "DOUBLE",
        "props": "VARCHAR",
    },
    "documents": {
        "doc_id": "BIGINT",
        "text": "VARCHAR",
        "lang": "VARCHAR",
        "source": "VARCHAR",
        "n_chars": "BIGINT",
    },
    "embeddings": {"vec_id": "BIGINT", "label": "INTEGER"},
}

# Magnitude-adaptive epoch decode, identical bands to the Spark decode
# in plans.testdata.events_df (each cutoff sits between adjacent
# encodings of any date from 1973 to 5138). The VARCHAR round-trip
# makes one expression bind for every physical type DuckDB could read
# (BIGINT → the make_timestamp branch; any timestamp flavor → the
# try_cast branch; integer division floors in both engines).
_EVENTS_TS_EXPR = (
    "COALESCE(make_timestamp(CAST(CASE"
    " WHEN abs(try_cast(CAST(ts AS VARCHAR) AS BIGINT)) >= 100000000000000000"
    " THEN try_cast(CAST(ts AS VARCHAR) AS BIGINT) // 1000"
    " WHEN abs(try_cast(CAST(ts AS VARCHAR) AS BIGINT)) >= 100000000000000"
    " THEN try_cast(CAST(ts AS VARCHAR) AS BIGINT)"
    " WHEN abs(try_cast(CAST(ts AS VARCHAR) AS BIGINT)) >= 100000000000"
    " THEN try_cast(CAST(ts AS VARCHAR) AS BIGINT) * 1000"
    " ELSE try_cast(CAST(ts AS VARCHAR) AS BIGINT) * 1000000 END AS BIGINT)),"
    " try_cast(CAST(ts AS VARCHAR) AS TIMESTAMP))"
)


def _derived_table(name: str) -> str:
    cols = []
    for col, typ in _CASTS[name].items():
        cols.append(f"CAST({col} AS {typ}) AS {col}")
        if name == "events" and col == "event_id":
            cols.append(f"{_EVENTS_TS_EXPR} AS ts")
    if name == "embeddings":
        cols.insert(1, "embedding")  # pass-through, see _CASTS note
    return f"(SELECT {', '.join(cols)} FROM {name})"


_DERIVED: dict[str, str] = {name: _derived_table(name) for name in _CASTS}

# SQL keywords that can directly follow a table reference — anything in
# this set after the table name is NOT an alias. The regex below
# excludes them with a lookahead rather than matching-then-branching:
# consuming a keyword as a pseudo-alias would advance re.sub past it,
# and an unaliased ref followed by JOIN ("FROM lineitem JOIN orders")
# would leave the NEXT table with no FROM/JOIN prefix to match —
# silently unprotected (found in review; pinned by the rewrite-shapes
# test).
_NOT_ALIAS = (
    "where group order limit having join left right inner outer full "
    "cross on using union except intersect qualify window select with "
    "semi anti asof positional natural and or when then else end desc "
    "asc".split()
)

_TABLE_RE = re.compile(
    r"(?P<prefix>\b(?:FROM|JOIN)\s+|,\s*)"
    r"(?P<table>region|nation|customer|supplier|part|orders|lineitem"
    r"|events|documents|embeddings)\b(?!\s*[.(])"
    r"(?:[ \t]+(?:AS[ \t]+)?(?!(?:" + "|".join(_NOT_ALIAS) + r")\b)"
    r"(?P<alias>[A-Za-z_]\w*))?",
    re.IGNORECASE,
)


def canonicalize(sql: str) -> str:
    """Rewrite base-table references in an oracle SQL string to the
    type-canonicalizing derived tables. Identity in values when the
    fixture matches the canonical schema; drift-proof when it doesn't."""

    seen: dict[str, int] = {}

    def repl(m: re.Match) -> str:
        table = m.group("table").lower()
        alias = m.group("alias")
        if alias:
            alias_sql = f" AS {alias}"
        else:
            # fallback aliases must be UNIQUE per statement: an
            # unaliased self-join ("FROM orders JOIN orders") is valid
            # SQL, but two identical explicit aliases are not. A second
            # unaliased ref can't be target of qualified column refs in
            # valid SQL (ambiguous), so the synthetic suffix is safe.
            n = seen.get(table, 0) + 1
            seen[table] = n
            alias_sql = f" AS {table}" if n == 1 else f" AS {table}__c{n}"
        return f"{m.group('prefix')}{_DERIVED[table]}{alias_sql}"

    return _TABLE_RE.sub(repl, sql)
