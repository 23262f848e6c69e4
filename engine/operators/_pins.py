"""Tracked persist() handles for multi-consumer intermediates.

Several kernels (MinHash/SimHash banding, hyperplane LSH, triangle
adjacency, Jaccard shingles) persist an intermediate that feeds 3-4
downstream subplans — without the pin Spark re-executes the whole upstream
once per branch (exchange reuse dedupes only the shuffle, not the
aggregation above it; measured ~2-4× on the full pipelines).

persist() registers the plan in the session CacheManager, which holds a
strong reference until an explicit unpersist — the ContextCleaner does NOT
free it when the result plan is dropped. In a long-lived session every
pinned call would therefore accumulate MEMORY_AND_DISK cache forever. This
module makes every pin releasable:

- `pin(df)`: persist + register in every active `pin_scope` on this thread
  AND in the process-wide registry.
- `pin_scope()`: context manager; on exit, unpersists (blocking=False)
  every frame pinned inside the scope. Use around a query's terminal action
  when the session outlives the query (benchmarks, services, notebooks):

      with pin_scope():
          n = minhash_lsh_dedupe_pairs(docs).count()
      # shingle/signature cache blocks are freed here

  Results must be fully materialized (count/collect/write) inside the
  scope: after exit, re-computation falls back to the unpersisted plan —
  still correct, just no longer cached.
- `release_all_pins()`: unpersist everything ever pinned and not yet
  released (for sessions that didn't use scopes).
"""

from __future__ import annotations

import threading

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_tls = threading.local()
_global_lock = threading.Lock()
_global_pins: list[DataFrame] = []


def _scopes() -> list:
    if not hasattr(_tls, "scopes"):
        _tls.scopes = []
    return _tls.scopes


def pin(df: DataFrame) -> DataFrame:
    """Persist (memory-and-disk) and track for later release."""
    df.persist(StorageLevel.MEMORY_AND_DISK)
    for scope in _scopes():
        scope._dfs.append(df)
    with _global_lock:
        _global_pins.append(df)
    return df


def _release(df: DataFrame) -> None:
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass  # session already stopped
    with _global_lock:
        try:
            _global_pins.remove(df)
        except ValueError:
            pass  # already released by another scope / release_all_pins


class pin_scope:
    """Unpersist every frame pinned (on this thread) inside the scope."""

    def __enter__(self):
        self._dfs: list[DataFrame] = []
        _scopes().append(self)
        return self

    def __exit__(self, *exc):
        _scopes().remove(self)
        for df in self._dfs:
            _release(df)
        self._dfs = []
        return False


def release_all_pins() -> int:
    """Unpersist every tracked pin not yet released; returns the count."""
    with _global_lock:
        pins = list(_global_pins)
    for df in pins:
        _release(df)
    return len(pins)
