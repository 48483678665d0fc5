"""Generation-managed persist for multiply-scanned query intermediates.

Query builders cache frames their returned — still lazy — plan scans
several times. A bare ``persist()`` leaks one CacheManager entry per
invocation in a long-lived session (ADVICE r4); eager
``localCheckpoint`` fixes the leak but truncates to a stats-less
LogicalRDD scanned row-wise outside whole-stage codegen and the
columnar cache — measured 4x on the scd2 sweeps (4.8 s -> 19.7 s warm
at sf0.1). This helper keeps the real InMemoryRelation and bounds the
leak instead: at most ONE cached generation per (session, tag), the
previous generation unpersisted when the tag is re-invoked. A caller
still holding a plan over the evicted generation stays correct — it
just recomputes.

Use it for frames with window/join fanout; cheap low-fanout frames can
keep eager ``localCheckpoint`` (same lifecycle, no measured penalty).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: last persisted generation per (session id, tag) — the session object
#: is stored alongside so an id()-reuse after the old session is GC'd
#: can never alias a new session onto a dead session's entry (ADVICE r5)
_GENERATIONS: dict[tuple[int, str], tuple[object, DataFrame]] = {}


def cached_generation(spark, tag: str, df: DataFrame) -> DataFrame:
    """persist ``df``, unpersisting the previous generation for this
    (session, tag) first. See module docstring for the why.

    Single-live-session contract (ADVICE r5): entries from any OTHER
    session are evicted on insert — a stopped-and-replaced session's
    JVM-side cache died with its context, so holding its DataFrames
    here only retained dead plan objects (and the session they pin)
    forever. ``unpersist`` on an evicted entry is best-effort: it
    raises on a stopped context, which is exactly the already-freed
    case.
    """
    for k, (sess, pdf) in list(_GENERATIONS.items()):
        if sess is not spark:
            _GENERATIONS.pop(k, None)
            try:
                pdf.unpersist()
            except Exception:  # noqa: BLE001 — stopped context
                pass
    key = (id(spark), tag)
    prev = _GENERATIONS.pop(key, None)
    if prev is not None and prev[0] is spark:
        prev[1].unpersist()
    out = df.persist()
    _GENERATIONS[key] = (spark, out)
    return out
