"""Session-wide tracked persistence for operator-internal tables.

Operators that materialize an intermediate (dedup signature tables, the
range-partitioned relation behind ``sort.global_rank``) persist it through
``persist_tracked`` so a long-lived session running the whole query catalog
(the driver does) can release the previous query's caches instead of
accumulating cached blocks until LRU eviction competes with shuffle memory.

``registry.register``'s dispatch wrapper calls ``release_caches()`` before
EVERY query build: by then the previous query's result has been collected,
so its caches are dead weight. Bounded invariant: at most one query's
caches are live at any time. (Unpersist is always safe — a caller that
executes an older DataFrame afterwards just recomputes.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE_CACHES: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE_CACHES.append(df)
    return df


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for release."""
    _LIVE_CACHES.append(df)
    return df


def release_caches() -> None:
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist()
