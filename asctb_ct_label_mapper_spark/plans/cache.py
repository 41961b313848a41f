"""Session-scoped persist pool (VERDICT r6 #9 — cache hygiene).

Several registry queries persist an intermediate around multiple
consumers (q11/q15/q20's scalar-threshold reuse, q21's eager fact-fact
late set, incremental dedup's band/candidate frames). The persisted frame
must OUTLIVE the query function — the caller materializes the returned
lazy plan against it — so a ``try/finally`` inside the function would
unpersist before first use. The pool makes release deterministic without
breaking laziness:

- ``pooled_persist(df)`` persists and registers the frame;
- every registry query drains the pool ON ENTRY (wired into the
  ``@query`` decorator), releasing the PREVIOUS query's entries.

A long-lived session that runs registry queries therefore holds at most
one query's persisted intermediates at a time, instead of accumulating
every persist it ever planned; harnesses that want zero residue call
``drain_persist_pool()`` after materializing (bench/correctness already
``clearCache()``, which the pool is consistent with — unpersisting an
already-cleared frame is a no-op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_POOL: list[DataFrame] = []

# Backstop for callers that never hit a registry-query entry (direct
# operator calls from tests or user pipelines): the pool is FIFO-bounded,
# so the Nth+1 persist releases the oldest entry instead of accumulating
# cached RDDs forever. Unpersisting early is always safe — a consumer of
# an evicted frame just recomputes its plan. No single registry query
# pools anywhere near this many frames, so drain-on-entry behavior is
# unchanged.
_MAX_POOL = 32


def pooled_persist(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` and register it for release at the next registry
    query entry (or an explicit ``drain_persist_pool()``; sessions that
    never enter a registry query are bounded by FIFO eviction)."""
    # already-cached frames pass through untouched: composites hand
    # persisted frames to operators that defensively pooled_persist
    # their inputs (graph_family_report → degree_distribution), and
    # re-persisting would only warn and double-register — the original
    # registrant keeps release responsibility
    if df.is_cached:
        return df
    df = df.persist(level) if level is not None else df.persist()
    _POOL.append(df)
    while len(_POOL) > _MAX_POOL:
        try:
            _POOL.pop(0).unpersist()
        except Exception:  # noqa: BLE001 - session may already be stopped
            pass
    return df


def drain_persist_pool() -> int:
    """Unpersist every pooled frame; returns how many were released."""
    n = len(_POOL)
    for df in _POOL:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 - session may already be stopped
            pass
    _POOL.clear()
    return n
