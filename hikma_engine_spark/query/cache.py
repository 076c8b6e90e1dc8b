"""Query-result TTL cache (reference: in-memory API cache keyed by
(type, query, filters) with TTL, src/api/controllers/search-controller.ts:245-266).

Spark mapping: the cache stores the PERSISTED DataFrame (``.persist()``
— Spark materializes it on first action and serves subsequent actions
from executor block storage, the engine-level analog of CACHE TABLE);
eviction unpersists. Keys are the deterministic (search_type, query,
sorted filters) tuple, exactly the reference's key shape.

Driver-side bookkeeping only holds keys + timestamps — never rows — so
the cache is as scale-safe as Spark's own storage layer (executor
memory/disk, LRU-evicted by the block manager under pressure).
"""

from __future__ import annotations

import time
import weakref
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame

# live caches, so Pipeline write/swap points can invalidate them all:
# a persisted entry whose next action recomputes against swapped parquet
# dirs would serve stale rows within TTL (or hit FileNotFoundException
# if the referenced dir was replaced mid-lifetime)
_ACTIVE_CACHES: "weakref.WeakSet[QueryCache]" = weakref.WeakSet()


def invalidate_all() -> None:
    """Invalidate every live QueryCache. Called by Pipeline.run /
    run_incremental at their write/swap points (same moment they call
    spark.catalog.clearCache())."""
    for c in list(_ACTIVE_CACHES):
        c.invalidate()


def cache_key(search_type: str, query: str, filters: dict | None = None) -> tuple:
    """Deterministic key: type + query + sorted filter items
    (reference key: `${type}:${query}:${JSON.stringify(filters)}`)."""
    items = tuple(sorted((str(k), str(v)) for k, v in (filters or {}).items()))
    return (search_type, query, items)


@dataclass
class _Entry:
    df: DataFrame
    created: float


@dataclass(eq=False)  # identity hash — required for the WeakSet registry
class QueryCache:
    """TTL + max-entry bounded cache of persisted DataFrames.

    ``get_or_compute`` returns (df, cached_flag) — the flag mirrors the
    reference's ``cached`` response field.
    """

    ttl_sec: float = 300.0
    max_entries: int = 64
    clock: Callable[[], float] = time.monotonic
    _store: dict = field(default_factory=dict)
    hits: int = 0
    misses: int = 0

    def __post_init__(self) -> None:
        _ACTIVE_CACHES.add(self)

    def get_or_compute(
        self,
        search_type: str,
        query: str,
        compute: Callable[[], DataFrame],
        filters: dict | None = None,
    ) -> tuple[DataFrame, bool]:
        key = cache_key(search_type, query, filters)
        now = self.clock()
        entry = self._store.get(key)
        if entry is not None and now - entry.created <= self.ttl_sec:
            self.hits += 1
            return entry.df, True
        if entry is not None:  # expired
            self._evict(key)
        self.misses += 1
        df = compute().persist()
        self._store[key] = _Entry(df=df, created=now)
        self._trim(now)
        return df, False

    def _evict(self, key: tuple) -> None:
        entry = self._store.pop(key, None)
        if entry is not None:
            try:
                entry.df.unpersist()
            except Exception:
                pass

    def _trim(self, now: float) -> None:
        # drop expired first, then oldest beyond max_entries
        for key in [
            k for k, e in self._store.items() if now - e.created > self.ttl_sec
        ]:
            self._evict(key)
        while len(self._store) > self.max_entries:
            oldest = min(self._store, key=lambda k: self._store[k].created)
            self._evict(oldest)

    def invalidate(self) -> None:
        for key in list(self._store):
            self._evict(key)
