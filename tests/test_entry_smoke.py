"""Drift defense: every registered query must ANALYZE against the
current fixtures.

Round 2 post-mortem: the driver regenerated the testdata between rounds
and `events.parquet`'s `ts` column changed physical type (int64 nanos ->
timestamp[us]); every query touching events then died in ANALYSIS
(`AnalysisException` on `ts DIV 1000`) during the driver's correctness
run — an entire round of red for a break that plan analysis alone would
have caught locally. This module is that local tripwire:

- `test_all_queries_analyze`: build every `queries()` plan against
  sf0.001 and force analysis (`df.schema`). Pure driver-side work, no
  jobs — ~cheap even for 80+ queries — and catches type-mismatch /
  missing-column / unresolvable-expression drift in-round.
- `test_representative_queries_execute`: one query per base-table decode
  path actually EXECUTES (runtime scan errors, e.g. parquet rebase or
  nanos rejection, only surface at execution).
- `test_oracle_keys_subset`: every oracle key must have a query (an
  orphan oracle would crash the driver's loop).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

_QUERIES = entry_mod.queries()

# one per distinct base-table/decode path:
#   events (adaptive ts decode), documents (+mutant corpus), embeddings
#   (array column), orders+lineitem (relational core), full star join,
#   media (binary synthesis), binaryFile source
_REPRESENTATIVE = [
    "events_windowed_agg",
    "text_quality",
    "exact_dedup",
    "ann_bruteforce_topk",
    "status_counts",
    "tpch_q5_local_supplier_volume",
    "media_features",
    "media_from_files",
    "calendar_dim",
]


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_all_queries_analyze(spark, name):
    df = _QUERIES[name](spark, SF)
    assert df.schema.fields, f"{name} produced an empty schema"


@pytest.mark.parametrize("name", _REPRESENTATIVE)
def test_representative_queries_execute(spark, name):
    assert name in _QUERIES, f"representative query {name} not registered"
    # limit(1) keeps the job tiny while still forcing a real scan+exec
    _QUERIES[name](spark, SF).limit(1).collect()


def test_oracle_keys_subset():
    orphans = set(entry_mod.oracle_sql()) - set(_QUERIES)
    assert not orphans, f"oracle entries without queries: {orphans}"
