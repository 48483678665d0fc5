"""Local mirror of the driver's DuckDB-oracle differential check.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
against the same sf directory, then compares row count, column names, and
exact values order-insensitively (columns sorted by name, rows sorted by
stringified values — strict: any value difference fails, since the driver
hashes values).

Usage: python tools/oracle_check.py [--json OUT.json] [sf_dir] [query ...]

The default session uses 8 shuffle partitions — sized for the sf0.01
gate fixtures where per-partition state-store/agg overhead dominates.
For sf>=1 corpora set ORACLE_CHECK_PLAIN_SESSION=1 (local[32], 32
shuffle partitions): the iterative graph queries OOM a 24g driver when
their per-partition hash state is folded 4x wider.

With ``--json`` every per-query verdict is also written as a JSON
artifact in the driver's CORRECTNESS format (rows/schema/hash matches +
row counts per query) so a full-registry differential can be committed
and audited instead of re-run on trust (FULLDIFF_r{N}.json).
"""

from __future__ import annotations

import math
import os
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from de_project_sprint_etl_spark.schemas import TESTDATA_TABLES  # noqa: E402
from de_project_sprint_etl_spark.session import get_spark  # noqa: E402


def canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            # IEEE -0.0 == 0.0 but repr() keeps the sign; engines
            # legitimately differ on the sign of a rounded-to-zero
            # result (DuckDB keeps -0.0, Spark's ROUND drops it)
            return "0.0"
        # float(v) first: np.float64 IS a Python-float subclass, and
        # numpy>=2 reprs its scalars as 'np.float64(0.1)' while the
        # vectorized fast path reprs plain floats from tolist() —
        # normalizing keeps both paths numpy-version-independent
        # (value-exact: float() of a float64 scalar is the identity)
        return repr(float(v))
    if isinstance(v, Decimal):
        return str(v.normalize())
    return str(v)


def _canon_column(series) -> list[str]:
    """Canonicalize one column AT ITS NATIVE DTYPE, dtype-dispatched.

    The float/int fast paths inline exactly what ``canon`` does for
    those types; everything else (object arrays holding Decimal / str /
    Timestamp / None / stray numpy scalars, datetime64 → Timestamp via
    ``.tolist()``) goes element-wise through ``canon`` itself so the
    two paths cannot drift.
    """
    kind = series.dtype.kind
    if kind == "f":
        if series.dtype.itemsize < 8:
            # float32 etc: tolist() would WIDEN to Python float and
            # repr the widened double ('0.10000000149011612') — iterate
            # the narrow numpy scalars through canon instead ('0.1')
            return [canon(v) for v in series.to_numpy()]
        out = []
        for v in series.tolist():  # Python floats, exact for float64
            if v != v:
                out.append("NaN")
            elif v == 0.0:
                out.append("0.0")
            else:
                out.append(repr(v))
        return out
    if kind in "iu":
        return [str(v) for v in series.tolist()]
    return [canon(v) for v in series.tolist()]


def frame_rows(df) -> list[tuple]:
    # Vectorized canonicalization, DTYPE-STRICT (r8, VERDICT r7 #2).
    # Each column is canonicalized from the frame's OWN Series at its
    # native dtype — never through a common-dtype interleave. The r6
    # form went through df[cols].to_numpy(), whose common-dtype upcast
    # turned a mixed int+float frame's integers into floats on BOTH
    # sides before canon — so a Spark DOUBLE column against a DuckDB
    # BIGINT column hashed equal locally while the driver's typed value
    # hash saw 755 vs 755.0 and stayed red (zorder_skipping_index, red
    # r6+r7). Per-column native canon mirrors the driver: an int column
    # renders '755', a float column '755.0', and the pair fails here
    # exactly when it fails there. Column-vectorized, so the r6 perf win
    # over iterrows (6M-row sf1 comparisons in seconds) is kept.
    cols = sorted(df.columns)
    if len(df) == 0:
        return []
    canon_cols = [_canon_column(df[c]) for c in cols]
    rows = list(zip(*canon_cols))
    rows.sort()
    return rows


# dtype-kind → comparison family: integer and float are DISTINCT on
# purpose (the driver's value hash is typed); bool folds into its own
# family; datetime64 of any unit/tz one family. Object columns are
# classified by their first non-null ELEMENT (Spark's toPandas ships
# DecimalType as object-of-Decimal and DateType as object-of-date —
# leaving those unclassified was a residual masking hole for e.g. a
# Spark DECIMAL column against a DuckDB BIGINT oracle, the zorder class
# through a different dtype).
_KIND_FAMILY = {
    "i": "int", "u": "int", "f": "float", "b": "bool",
    "M": "datetime", "m": "timedelta",
}


def _column_family(series) -> str | None:
    """Comparison family of one column; None = unclassifiable (empty or
    all-null object column — nothing for a value hash to see either)."""
    kind = series.dtype.kind
    if kind in _KIND_FAMILY:
        return _KIND_FAMILY[kind]
    import datetime

    for v in series:
        if v is None:
            continue
        if isinstance(v, Decimal):
            return "decimal"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            if v != v:  # NaN placeholder in an object column — skip
                continue
            return "float"
        if isinstance(v, datetime.datetime):  # Timestamp subclasses this
            return "datetime"
        if isinstance(v, datetime.date):
            return "date"
        if isinstance(v, str):
            return "str"
        return "object"  # arrays/maps/bytes — value canon handles
    return None


def dtype_mismatches(sdf, odf) -> list[str]:
    """Per-column dtype-FAMILY mismatches between the two frames
    (shared columns only; schema diffs are reported separately).
    int-vs-float is the driver-red class the r6 comparator masked;
    any cross-family pair is reported — decimal/date families resolved
    from object-column elements — including on zero-row frames where
    no value exists to betray it (zero-row object columns stay
    unclassifiable and are skipped)."""
    bad = []
    for c in sorted(set(sdf.columns) & set(odf.columns)):
        fs = _column_family(sdf[c])
        fo = _column_family(odf[c])
        if fs is None or fo is None or "object" in (fs, fo):
            continue
        if fs != fo:
            bad.append(
                f"{c}: spark={sdf[c].dtype}/{fs} duckdb={odf[c].dtype}/{fo}"
            )
    return bad


def compare_frames(sdf, odf) -> dict:
    """The differential verdict for one (spark, oracle) pandas pair —
    the exact rules main() applies per query, factored out so the
    harness itself is testable (a comparator that cannot fail is no
    gate; tests/test_oracle_check_detects.py perturbs real queries and
    asserts each mismatch class is REPORTED)."""
    problems = []
    rows_match = len(sdf) == len(odf)
    schema_match = sorted(sdf.columns) == sorted(odf.columns)
    hash_match = False
    if not rows_match:
        problems.append(f"rowcount spark={len(sdf)} duckdb={len(odf)}")
    if not schema_match:
        problems.append(
            f"columns spark={sorted(sdf.columns)} duckdb={sorted(odf.columns)}"
        )
    dt_bad = dtype_mismatches(sdf, odf)
    if dt_bad:
        problems.append("dtype mismatch: " + ", ".join(dt_bad))
    if not problems:
        srows, orows = frame_rows(sdf), frame_rows(odf)
        hash_match = srows == orows
        if not hash_match:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            sset, oset = set(srows), set(orows)
            problems.append(
                f"values differ: {len(sset - oset)} spark-only / "
                f"{len(oset - sset)} duckdb-only; first diffs: {diff}"
            )
    return {
        "rows_match": rows_match, "schema_match": schema_match,
        "hash_match": hash_match, "spark_rows": len(sdf),
        "oracle_rows": len(odf),
        "err": "; ".join(problems)[:500] if problems else None,
    }


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results: dict[str, dict] = {}

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    if os.environ.get("ORACLE_CHECK_PLAIN_SESSION"):
        # driver-equivalent plain session: the external driver builds its
        # own SparkSession with none of session.py's confs, so values
        # must not depend on them (scan-layer settings like the UTC
        # session zone are applied per-scan in plans/testdata.t)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.driver.memory", "24g")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark(shuffle_partitions=8)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"spark error: {e}"[:500],
            }
            print(f"FAIL  {name}: spark error: {e}")
            continue
        print(f"...   {name}: spark done {len(sdf)} rows "
              f"[{time.time()-t0:.1f}s]", flush=True)
        if name not in oracles:
            results[name] = {
                "rows_match": len(sdf) >= 0, "schema_match": None,
                "hash_match": None, "spark_rows": len(sdf),
                "oracle_rows": None, "err": None,
                "check": "rows_only (no SQL-expressible oracle)",
            }
            print(f"SKIP  {name}: no oracle (rows-only) — {len(sdf)} rows "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(sdf),
                "oracle_rows": None, "err": f"duckdb error: {e}"[:500],
            }
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        results[name] = compare_frames(sdf, odf)
        if results[name]["err"]:
            failures.append(name)
            print(f"FAIL  {name}: " + results[name]["err"])
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    if json_out:
        import json

        payload = {
            "sf_dir": sf_dir,
            "n_queries": len(results),
            "n_failed": len(failures),
            "failed": failures,
            "results": results,
        }
        with open(json_out, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"wrote {json_out} ({len(results)} queries)")

    print()
    if failures:
        print(f"{len(failures)} FAILED: {failures}")
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
