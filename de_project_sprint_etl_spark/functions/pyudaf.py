"""Pandas GROUPED_AGG UDF tier (the aggregate escape hatch).

The engine's Python escape hatches are deliberately enumerated, one per
extension point, each pinned against an engine-native or SQL oracle:
``mapInPandas`` (media), cogrouped ``applyInPandas`` (user activity),
``applyInPandasWithState`` (streaming state), a ``@udtf`` (chunker) —
and this one: a grouped-aggregate pandas UDF for order statistics that
have no Catalyst aggregate (trimmed mean). Arrow ships each group's
column once; the UDF returns one scalar per group.

Cross-engine determinism: the UDF aggregates INTEGER CENTS (exact sum,
no float-accumulation-order dependence) and performs exactly one double
division at the end — the same discipline as the cents/micros streaming
state — so DuckDB replaying sort→trim→sum→divide produces the identical
bits.

Scale shape: a grouped-agg pandas UDF is a full shuffle of the value
column to its group (no partial aggregation — the price of an arbitrary
Python aggregate). Use it when the aggregate genuinely has no algebraic
decomposition; the registered query's groups are O(statuses), so each
group's value vector is the bounded unit of work.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

TRIM_FRAC = 0.1


@F.pandas_udf("double")
def _trimmed_mean_cents(cents: pd.Series) -> float:
    """10%-trimmed mean over exact integer cents: sort, drop
    floor(n·0.1) from each tail, integer-sum the middle, divide once."""
    v = cents.dropna().sort_values().to_numpy()
    n = len(v)
    if n == 0:
        return None
    k = int(n * TRIM_FRAC)
    mid = v[k : n - k] if n - 2 * k > 0 else v
    return float(int(mid.sum()) / len(mid))


def trimmed_mean_price(col: Column | str) -> Column:
    """Aggregate column: 10%-trimmed mean of a monetary double column,
    exact-cents arithmetic inside (see module docstring)."""
    cents = F.floor(
        (F.col(col) if isinstance(col, str) else col) * 100 + 0.5
    ).cast("bigint")
    return _trimmed_mean_cents(cents) / 100.0
