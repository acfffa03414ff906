"""Small shared helpers (no Spark job side effects)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def persist_once(df: DataFrame) -> DataFrame:
    """``df.persist()`` unless the plan is already in the CacheManager.

    Several query compositions persist the same prelude plan (e.g. the
    filtered token sequences feed both ``evolution_graph`` and
    ``detect_event_stream`` within one bench session). Re-persisting an
    already-cached plan is a no-op that logs
    ``CacheManager: Asked to cache already cached data`` per call;
    checking first keeps the existing cache entry (and its contents)
    and keeps logs clean. ``storageLevel`` performs the same
    plan-identity lookup the CacheManager itself uses.
    """
    lvl = df.storageLevel
    if lvl.useMemory or lvl.useDisk or lvl.useOffHeap:
        return df
    return df.persist()
