"""Library-owned persist tracking (cache-hygiene contract).

Several operators persist iteration-invariant intermediates (LSH
signature tables, co-purchase edge lists, prefix-filter token tables)
because the RETURNED plan reads them from multiple branches — the
in-session equivalent of writing an intermediate table in a real
100 TB run.  Those caches must outlive the operator call (the consumer
executes the plan later), so the operator cannot unpersist them itself.

Ownership contract: every library persist is registered here via
:func:`track`; a consumer that composes several queries in one session
calls :func:`release_all` after materializing each result.  ``bench.py``
and the hygiene pytest sweep do exactly that; the driver runs one query
per process, where JVM teardown is the release.  LRU block eviction
bounds the damage for consumers that never call it.

``localCheckpoint`` blocks are deliberately OUT of scope: they ARE the
data of the result frame that references them (no lineage survives to
recompute from — unpersisting one breaks later reads of the result), so
their lifetime is the result's lifetime and Spark's ContextCleaner
reclaims them on garbage collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Strong references on purpose: the operator's own local reference dies
# when it returns, but the persisted blocks live JVM-side until someone
# unpersists — a weakref would be dead exactly when release_all() needs
# it. The list holds tiny Python wrappers (never data) and is cleared on
# every release.
_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register a persisted DataFrame for :func:`release_all` cleanup."""
    _TRACKED.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked DataFrame; returns the count released.

    Safe to call at any time: releasing an already-unpersisted frame is a
    no-op, and plans that re-read a released intermediate recompute it
    instead of failing.
    """
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    _TRACKED.clear()
    return n
