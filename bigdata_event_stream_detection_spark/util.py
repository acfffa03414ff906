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


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition an under-split scan up to cluster
    parallelism BEFORE a data-amplifying stage (shingle/token explode).

    Spark's input parallelism comes from file splits, and parquet only
    splits at row-group boundaries: a single-row-group file is ONE task
    no matter what ``maxPartitionBytes`` says, which serializes a
    CPU-heavy explode on one core while the rest of the cluster idles
    (measured: the whole minhash wall at sf0.1 was a one-task shingle
    explode). At warehouse scale scans have thousands of splits, so the
    guard makes this a structural no-op there; it fires only in the
    under-split regime (small files, bootstrap loads), where the
    exchange it inserts moves the SMALL pre-explosion input once.
    AQE can coalesce an over-partitioned stage but never splits an
    under-partitioned scan — this is the missing half.
    """
    sess = df.sparkSession
    if target is None:
        target = sess.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def pin_partitions(df: DataFrame, *keys: str, n: int | None = None) -> DataFrame:
    """Hash-partition on ``keys`` with an EXPLICIT partition count, so
    the following per-group kernel stage keeps its parallelism.

    AQE's partition coalescing targets BYTES (64 MB post-shuffle), but
    an ``applyInPandas`` kernel stage is CPU-bound on tiny bytes: a few
    MB of token arrays carry seconds of EM/Baum-Welch per group, and
    coalescing serializes the whole stage onto one task (measured:
    detect_events' fused stage = 1 task, 3.6 s wall for 1.8 s of
    kernel CPU that parallelizes to ~0.2 s). A ``repartition(n, keys)``
    with an explicit count is exempt from coalescing (Spark honors
    user-specified numPartitions), and its hash partitioning satisfies
    the downstream groupBy's ClusteredDistribution, so this adds NO
    extra exchange — it just pins the one that was already there.

    ``n`` defaults to the session's ``spark.sql.shuffle.partitions``
    (sized to cores locally; set by the job on a cluster).
    """
    if n is None:
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *keys)
