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

from pyspark.sql import Column, DataFrame, Window, functions as F

#: One row per observed calendar week: 100k weeks ≈ 1,900 years of
#: data. Anything past this is a bug (e.g. week-truncation fed raw
#: timestamps), not a real corpus.
WEEK_DIM_BOUND = 100_000

#: Exact equi-depth = a global total sort; a single sort partition
#: handles ~10M skinny rows comfortably. Past that, exact order
#: statistics are the wrong tool.
EQUIDEPTH_BOUND = 10_000_000

#: Dense contiguous sequence ids (nextval parity) need a global order —
#: the dims they number are thousands of rows. Same single-partition
#: ceiling as exact equi-depth; a fact table hitting this wants
#: ``with_unique_id`` (partition-local, no coordination) instead.
SEQUENCE_BOUND = 10_000_000


def _parse_size_bytes(v: str) -> int:
    """Parse a Spark size conf value ('10485760', '10MB', '1g', '-1') —
    the full JVM suffix set, 'p'/'pb' included (ADVICE r7)."""
    s = v.strip().lower()
    for suffix, mult in (
        ("kb", 1 << 10), ("k", 1 << 10),
        ("mb", 1 << 20), ("m", 1 << 20),
        ("gb", 1 << 30), ("g", 1 << 30),
        ("tb", 1 << 40), ("t", 1 << 40),
        ("pb", 1 << 50), ("p", 1 << 50),
        ("b", 1),
    ):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * mult)
    return int(s)


def gated_broadcast(
    df: DataFrame,
    what: str,
    bytes_per_row: int = 64,
    threshold_bytes: int | None = None,
) -> DataFrame:
    """Broadcast-hint ``df`` only if it measurably fits the session's
    ``spark.sql.autoBroadcastJoinThreshold``; past it (or when the
    threshold is -1/disabled) return ``df`` unhinted so the join plans
    as a plain shuffle join.

    An UNCONDITIONAL ``F.broadcast`` encodes the assumption "this side
    is small" forever — correct for a low-dup-rate corpus, an
    executor-OOM when 30–50% of a 100 TB web crawl are near-dup members
    and the dup-group table is itself corpus-scale.

    Cost model (ADVICE r7): the measurement is a
    ``limit(max_rows + 1).count()``. LocalLimit canNOT early-exit below
    an exchange, and the gated frames here (MinHash pairs → connected
    components) carry several shuffles — so the gate necessarily
    EXECUTES the pipeline once. To avoid paying that dominant cost
    twice (once for the count, again when the consumer joins the
    frame), ``df`` is persisted through ``cached_generation`` first:
    the gate count materializes the cache and the downstream join reads
    it back, one execution total, with the house generation lifecycle —
    at most one live cache per (session, tag), the previous generation
    unpersisted when the same tag is re-invoked. There is no release
    hook after the consumer's single scan (lazy plans have no
    "consumed" callback), so the last generation per tag stays
    resident until the next invocation or session end: bounded at one
    MEMORY_AND_DISK frame per call site (three near-dedup tags today),
    evictable to disk under executor memory pressure. This deliberately
    fires a driver-side action at plan-construction time — the price of
    an accurate size decision; callers are the near-dedup builders
    whose drop-set is consumed immediately after.
    ``bytes_per_row`` is the estimated in-memory row footprint used to
    convert the byte threshold into the row cap (default 64: two longs
    + row overhead, the dedup (id, group_id) shape)."""
    from de_project_sprint_etl_spark.functions.caching import cached_generation

    spark = df.sparkSession
    if threshold_bytes is None:
        raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        threshold_bytes = _parse_size_bytes(raw)
    if threshold_bytes < 0:
        return df
    max_rows = max(1, threshold_bytes // bytes_per_row)
    gated = cached_generation(spark, f"gated_broadcast:{what}", df)
    if gated.limit(max_rows + 1).count() <= max_rows:
        return F.broadcast(gated)
    return gated


def assert_below(col: Column, bound: int, what: str) -> Column:
    """Pass ``col`` through unchanged while it is ``< bound``; raise at
    execution otherwise. Plan-side (one comparison per row, no extra
    job) — used where a derived corpus shifts ids by a constant offset
    (synthetic mutants/continuations): a natural id at or past the
    offset would silently COLLIDE with a shifted id, and because both
    engines share the constant the oracle differential cannot see the
    corruption (ADVICE r7) — so the assumption fails loudly instead."""
    msg = (
        f"{what}: id >= {bound} would collide with the synthetic-id "
        f"offset; raise the offset or derive it from max(id)"
    )
    return F.when(col < F.lit(bound), col).otherwise(
        F.raise_error(F.lit(msg))
    )


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
