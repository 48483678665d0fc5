"""Scale guards for deliberately-global operations.

A handful of operators use an UNPARTITIONED window on purpose — the
week-dim period numbering (one row per calendar week) and the exact
equi-depth histogram (a total order is the definition of exact
equi-depth). Those are safe only while the window's input stays small,
and the safety argument used to live in docstrings alone. These helpers
promote it into an executable bound: the window value is wrapped in a
row_number ceiling check that ``raise_error``s AT EXECUTION the moment
the input exceeds the bound, naming the scale-path alternative.

The guard is plan-side only — no extra job, no eager count, zero cost
on the happy path (one comparison per row inside the same window sort
the operator already pays for) — so guarded operators keep their exact
plan shape and values on every in-bound input.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, functions as F

#: One row per observed calendar week: 100k weeks ≈ 1,900 years of
#: data. Anything past this is a bug (e.g. week-truncation fed raw
#: timestamps), not a real corpus.
WEEK_DIM_BOUND = 100_000

#: Exact equi-depth = a global total sort; a single sort partition
#: handles ~10M skinny rows comfortably. Past that, exact order
#: statistics are the wrong tool.
EQUIDEPTH_BOUND = 10_000_000


def bounded_global_window(
    value: Column,
    order_window: Window,
    bound: int,
    what: str,
    alternative: str,
) -> Column:
    """Return ``value`` (a window expression over the unpartitioned
    ``order_window``), guarded: any row ranked past ``bound`` raises
    with the operator name and its named scale alternative instead of
    silently funnelling an unbounded stream through one partition."""
    rn = F.row_number().over(order_window)
    msg = (
        f"{what}: unpartitioned-window input exceeded {bound} rows; "
        f"use {alternative}"
    )
    return F.when(rn <= F.lit(bound), value).otherwise(
        F.raise_error(F.lit(msg))
    )
