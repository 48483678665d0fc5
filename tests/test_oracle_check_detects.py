"""Negative control for the differential harness itself.

tools/oracle_check.py is the correctness gate; a gate that cannot fail
proves nothing. These tests run a REAL registry query against its REAL
DuckDB oracle (the green control), then perturb one side — off-by-one
row set, renamed column, single +1 value — and assert the comparator
REPORTS each mismatch class instead of waving it through.
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pair(spark):
    """(spark_pandas, oracle_pandas) for one real registry query."""
    import __spark_entry__ as entrymod
    from de_project_sprint_etl_spark.schemas import TESTDATA_TABLES

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    name = "calendar_weeks"
    sdf = entrymod.queries()[name](spark, SF).toPandas()
    odf = con.execute(entrymod.oracle_sql()[name]).df()
    return sdf, odf


def test_green_control_passes(pair):
    from tools.oracle_check import compare_frames

    sdf, odf = pair
    v = compare_frames(sdf, odf)
    assert v == {
        "rows_match": True, "schema_match": True, "hash_match": True,
        "spark_rows": len(sdf), "oracle_rows": len(odf), "err": None,
    }


def test_detects_off_by_one_rowcount(pair):
    """The VERDICT's canonical perturbation: an off-by-one filter on
    one side (here: oracle loses its last row) must be REPORTED."""
    from tools.oracle_check import compare_frames

    sdf, odf = pair
    v = compare_frames(sdf, odf.iloc[:-1])
    assert not v["rows_match"] and not v["hash_match"]
    assert "rowcount" in v["err"]


def test_detects_renamed_column(pair):
    from tools.oracle_check import compare_frames

    sdf, odf = pair
    bad = odf.rename(columns={"period": "week_period"})
    v = compare_frames(sdf, bad)
    assert v["rows_match"] and not v["schema_match"] and not v["hash_match"]
    assert "columns" in v["err"]


def test_detects_single_value_drift(pair):
    """Same shape, one cell off by one — the hash must catch it (this
    is exactly what a wrong filter boundary or tiebreak produces)."""
    from tools.oracle_check import compare_frames

    sdf, odf = pair
    bad = odf.copy()
    bad.loc[bad.index[0], "period"] = bad.loc[bad.index[0], "period"] + 1
    v = compare_frames(sdf, bad)
    assert v["rows_match"] and v["schema_match"] and not v["hash_match"]
    assert "values differ" in v["err"]


def test_detects_swapped_rows_is_still_green(pair):
    """Order-insensitivity is part of the contract (the driver sorts
    before hashing): a row-shuffled oracle must stay green — the gate
    fails on VALUES, not on presentation order."""
    from tools.oracle_check import compare_frames

    sdf, odf = pair
    v = compare_frames(sdf, odf.iloc[::-1])
    assert v["hash_match"] and v["err"] is None
