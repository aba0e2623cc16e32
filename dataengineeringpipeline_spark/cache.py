"""Session-scoped tracking for operator-internal persists.

Several operators persist a shared subtree (shingle sets, MinHash
signatures, LSH signatures, the exact ANN baseline) because multiple
branches of one query plan consume it. The persisted frame has to
outlive the function call — the caller's action is what populates and
reads the cache — so the operator cannot unpersist it itself. Left
alone, those caches accumulate in executor memory across queries in a
long-lived session (MEMORY_AND_DISK eviction is the only backstop).

:func:`tracked_persist` registers every such persist in a module-level
list; :func:`release_caches` unpersists everything tracked. Call it
after consuming an operator's result (bench.py does, between queries);
a long-lived service would call it on its query boundary. At 100 TB the
right shape is different anyway: materialize signatures to a lake table
once per corpus snapshot instead of caching per query.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df`` and register it for :func:`release_caches`."""
    df = df.persist(level)
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked frame; returns how many were released.

    Safe to call repeatedly and with results still un-consumed — an
    unpersisted frame recomputes instead of failing.
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped: nothing to release
            pass
    return n
