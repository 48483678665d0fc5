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


# ---------------------------------------------------------------------------
# Vectorized frame_rows equivalence — DTYPE-STRICT semantics (r8)
#
# frame_rows canonicalizes each column at its NATIVE dtype. The r6 form
# was pinned to iterrows' common-dtype interleave, whose int→float
# upcast hid a Spark-DOUBLE-vs-DuckDB-BIGINT output mismatch from the
# local gate for two rounds (zorder_skipping_index; VERDICT r7 #2). The
# new semantics pin: per-row, per-column canon of the ORIGINAL Series
# element — integers render '5', floats '5.0', no cross-column
# contamination. The reference below is that definition, written the
# slow obvious way.
# ---------------------------------------------------------------------------


def _frame_rows_reference(df):
    """Per-column native-dtype canon, element-at-a-time (the pin)."""
    from tools.oracle_check import canon

    cols = sorted(df.columns)
    rows = [
        tuple(canon(df[c].iloc[i]) for c in cols) for i in range(len(df))
    ]
    rows.sort()
    return rows


def _tricky_frames():
    import datetime
    from decimal import Decimal

    import numpy as np
    import pandas as pd

    yield "mixed_int_float_stays_native", pd.DataFrame(
        {"i": [1, 2, 3], "f": [1.5, float("nan"), -0.0]}
    )
    yield "pure_int", pd.DataFrame({"a": [1, 2], "b": [10, -5]})
    yield "int_plus_object_no_upcast", pd.DataFrame(
        {"i": [5, 7], "s": ["x", None]}
    )
    yield "decimal_and_float", pd.DataFrame(
        {"d": [Decimal("1.230"), Decimal("-4.5")], "f": [0.0, 2.0**53]}
    )
    yield "pure_datetime", pd.DataFrame(
        {"ts": pd.to_datetime(["2020-01-01 12:34:56", "2021-06-30 00:00:00"])}
    )
    yield "datetime_plus_int_interleave", pd.DataFrame(
        {"ts": pd.to_datetime(["2020-01-01", "2021-01-01"]), "n": [1, 2]}
    )
    yield "date_objects", pd.DataFrame(
        {"d": [datetime.date(2020, 1, 1), datetime.date(2021, 2, 3)], "v": [1.0, 2.0]}
    )
    yield "bool_plus_int", pd.DataFrame(
        {"b": [True, False], "i": [7, 8]}
    )
    yield "nullable_none_nan_mix", pd.DataFrame(
        {"o": [None, "a"], "f": [float("nan"), 1.0], "i": [1, 2]}
    )
    yield "neg_zero_and_tiny", pd.DataFrame(
        {"f": [-0.0, 5e-324, -5e-324, 1e308]}
    )
    yield "int64_extremes", pd.DataFrame(
        {"i": np.array([2**63 - 1, -(2**63)], dtype=np.int64)}
    )
    yield "float32_narrow", pd.DataFrame(
        {"f": np.array([0.1, float("nan"), -0.0, 2.5], dtype=np.float32)}
    )
    yield "float32_plus_int", pd.DataFrame(
        {"f": np.array([0.1, 1.5], dtype=np.float32), "i": [1, 2]}
    )
    yield "empty_frame", pd.DataFrame({"a": pd.Series([], dtype="float64")})
    yield "single_object_decimal_nan", pd.DataFrame(
        {"o": [Decimal("0"), None, float("nan"), 3]}
    )


def test_frame_rows_matches_reference():
    from tools.oracle_check import frame_rows

    for name, df in _tricky_frames():
        assert frame_rows(df) == _frame_rows_reference(df), name


def test_detects_int_vs_float_twin_frames():
    """THE masking class (VERDICT r7): numerically-equal frames where
    one side is int64 and the other float64 must FAIL — the driver's
    typed value hash sees 755 vs 755.0. The r6 comparator's to_numpy()
    common-dtype upcast waved exactly this through for two rounds
    (zorder_skipping_index)."""
    import pandas as pd

    from tools.oracle_check import compare_frames

    sdf = pd.DataFrame({"k": [1, 2], "mn_a": [755.0, 812.0]})   # Spark DOUBLE
    odf = pd.DataFrame({"k": [1, 2], "mn_a": [755, 812]})       # DuckDB BIGINT
    v = compare_frames(sdf, odf)
    assert not v["hash_match"] and v["err"] is not None
    assert "dtype mismatch" in v["err"] and "mn_a" in v["err"]
    # and it must fail even with ZERO rows, where no value can betray it
    v0 = compare_frames(sdf.iloc[:0], odf.iloc[:0])
    assert not v0["hash_match"] and "dtype mismatch" in v0["err"]


def test_int_vs_float_in_same_frame_is_fine():
    """Strictness is CROSS-frame, per-column: a frame that mixes int
    and float COLUMNS compares green against a dtype-identical twin
    (the r6 bug was upcasting these before comparison)."""
    import pandas as pd

    from tools.oracle_check import compare_frames

    a = pd.DataFrame({"i": [5, 7], "f": [1.5, 2.5]})
    v = compare_frames(a, a.copy().iloc[::-1])
    assert v["hash_match"] and v["err"] is None


def test_canon_numpy_scalar_repr_is_version_independent():
    """ADVICE r6: canon() reprs np.float64 (a Python-float subclass)
    via float(v), so the reference path and the vectorized tolist()
    fast path agree regardless of numpy's scalar-repr style (numpy>=2
    reprs np.float64(0.1) as 'np.float64(0.1)')."""
    import numpy as np

    from tools.oracle_check import canon

    assert canon(np.float64(0.1)) == repr(0.1) == "0.1"
    assert canon(np.float64(-0.0)) == "0.0"
    assert canon(np.float64("nan")) == "NaN"
    assert canon(np.float64(2.0**53 + 2)) == repr(float(2**53 + 2))


def test_frame_rows_hypothesis_mixed(spark):
    """Property: random mixed-dtype frames canonicalize identically."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tools.oracle_check import frame_rows

    import pandas as pd

    @settings(max_examples=150, deadline=None)
    @given(
        ints=st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=8),
        floats=st.lists(
            st.floats(allow_infinity=True, allow_nan=True, width=64),
            min_size=1,
            max_size=8,
        ),
        strs=st.lists(
            st.one_of(st.none(), st.text(max_size=6)), min_size=1, max_size=8
        ),
        drop_strs=st.booleans(),
    )
    def check(ints, floats, strs, drop_strs):
        n = min(len(ints), len(floats), len(strs))
        data = {"i": ints[:n], "f": floats[:n]}
        if not drop_strs:
            data["s"] = strs[:n]
        df = pd.DataFrame(data)
        assert frame_rows(df) == _frame_rows_reference(df)

    check()


def test_detects_decimal_vs_int_twin_frames():
    """The residual masking hole (r8 review): Spark DECIMAL outputs ship
    as object-of-Decimal, which a kind-only dtype check skips — and
    canon(Decimal('755'))=='755'==str(755) hashes equal. The family
    classifier must resolve object columns by element and FAIL
    decimal-vs-int (and decimal-vs-float) pairs."""
    from decimal import Decimal

    import pandas as pd

    from tools.oracle_check import compare_frames

    sdf = pd.DataFrame({"k": [1, 2], "v": [Decimal("755"), Decimal("812")]})
    odf = pd.DataFrame({"k": [1, 2], "v": [755, 812]})
    v = compare_frames(sdf, odf)
    assert not v["hash_match"] and "dtype mismatch" in v["err"]
    odf_f = pd.DataFrame({"k": [1, 2], "v": [755.0, 812.0]})
    v2 = compare_frames(sdf, odf_f)
    assert not v2["hash_match"] and "dtype mismatch" in v2["err"]
    # decimal vs decimal stays green (canon normalizes scale)
    v3 = compare_frames(sdf, sdf.copy().iloc[::-1])
    assert v3["hash_match"] and v3["err"] is None
