"""Sequences-table readers/writers: Iceberg in production, icelite or
plain parquet here.

The north rule targets an Iceberg table of pre-tokenized sequences
``(doc_id string, tokens array<int32>, n_tok int32, source string)``.
This sandbox has no Iceberg runtime jars, so the adapters below take a
``fmt`` argument: ``"iceberg"`` issues the real catalog reads/writes
(``spark.read.format("iceberg").load(table)`` / ``readStream`` with
Iceberg's incremental-scan streaming source) and works unchanged on a
cluster whose session has an Iceberg catalog configured; ``"parquet"``
(the default here) has identical dataframe-level semantics — the file
source keeps the same exactly-once manifest + checkpoint contract the
engine's sinks rely on.

Nothing else in the engine knows the storage format: every operator
takes a DataFrame, so swapping ``fmt`` is the entire migration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.engine import SEQUENCE_SCHEMA


def has_iceberg(spark: SparkSession) -> bool:
    """True when the session can load Iceberg's DataSource (runtime
    jars + a configured catalog)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_sequences(
    spark: SparkSession,
    table: str,
    fmt: str = "parquet",
) -> DataFrame:
    """Batch read of the sequences table.

    ``table`` is a catalog identifier for Iceberg (``db.sequences``) or
    a path for parquet. Column pruning and predicate pushdown reach the
    scan in both formats (Iceberg additionally prunes by partition /
    file-level min-max stats).
    """
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(table)
    if fmt == "icelite":
        from . import icelite
        return icelite.read_table(spark, table)
    if fmt == "parquet":
        return spark.read.schema(SEQUENCE_SCHEMA).parquet(table)
    raise ValueError(f"unknown fmt {fmt!r}")


def read_sequences_stream(
    spark: SparkSession,
    table: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    stream_from_timestamp_ms: int | None = None,
) -> DataFrame:
    """Streaming read of the sequences table.

    Iceberg: incremental snapshot scan (each micro-batch reads newly
    committed snapshots; offsets in the checkpoint make it resumable —
    the production source of the north rule). Parquet: file-manifest
    source with the same exactly-once/resume contract.
    """
    if fmt == "iceberg":
        reader = spark.readStream.format("iceberg")
        if stream_from_timestamp_ms is not None:
            reader = reader.option("stream-from-timestamp",
                                   str(stream_from_timestamp_ms))
        if max_files_per_trigger is not None:
            reader = reader.option("streaming-max-files-per-micro-batch",
                                   str(max_files_per_trigger))
        return reader.load(table)
    if fmt == "icelite":
        # snapshot-incremental scan over the local table format —
        # offsets are snapshot ids in the checkpoint (icelite_source.py)
        from .icelite_source import IceliteDataSource
        spark.dataSource.register(IceliteDataSource)
        return spark.readStream.format("icelite").load(table)
    if fmt == "parquet":
        reader = spark.readStream.schema(SEQUENCE_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger",
                                   str(max_files_per_trigger))
        return reader.parquet(table)
    raise ValueError(f"unknown fmt {fmt!r}")


def write_events(
    events: DataFrame,
    table: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = ("window_start",),
    mode: str = "append",
) -> None:
    """Batch write of event rows, partitioned by window for pruning.

    Iceberg gives ACID appends + hidden partitioning; the parquet path
    writes the same directory layout via ``partitionBy``.
    """
    if fmt == "iceberg":
        # writeTo().partitionedBy takes Column expressions, not names
        writer = (events.writeTo(table).using("iceberg")
                  .partitionedBy(*[F.col(c) for c in partition_by]))
        if mode == "overwrite":
            writer.createOrReplace()
        elif events.sparkSession.catalog.tableExists(table):
            events.writeTo(table).append()
        else:
            writer.create()
        return
    if fmt == "icelite":
        # ACID append/overwrite; snapshot stats give window_start
        # file pruning instead of directory partitioning
        from . import icelite
        try:
            icelite.current_snapshot_id(table)
        except FileNotFoundError:
            icelite.create_table(table, events.schema)
        if mode == "overwrite":
            icelite.overwrite(events, table)
        else:
            icelite.append(events, table)
        return
    if fmt == "parquet":
        events.write.mode(mode).partitionBy(*partition_by).parquet(table)
        return
    raise ValueError(f"unknown fmt {fmt!r}")


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: tuple[str, ...] = ("doc_id",),
    sort_cols: tuple[str, ...] = (),
    fmt: str = "parquet",
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed write: pay the shuffle ONCE at write time so every later
    join / aggregation on the bucket key is exchange-free.

    At 100 TB this is the difference between re-shuffling the corpus on
    every doc_id join (dedup clusters x sequences, quality scores x
    packing assignments, decoded events x metadata) and never shuffling
    it again: two tables bucketed by the same key and bucket count
    sort-merge-join with NO Exchange on either side, and a groupBy on
    the bucket key aggregates in place (the bucketed scan already
    reports hashpartitioning(key, n)). The reference hand-tuned
    ``repartition(numBlocks)`` per job (EmAlgo.java:115) — bucketing
    moves that decision into the table layout where every job inherits
    it.

    Iceberg: a hidden ``bucket(N, col)`` partition transform; joins
    become storage-partitioned joins when the session sets
    ``spark.sql.sources.v2.bucketing.enabled=true``. Parquet: a native
    datasource bucketed table (``bucketBy`` + ``saveAsTable``;
    ``path`` makes it external). ``sort_cols`` additionally sorts
    within each bucket file so merge joins skip the sort.
    """
    if fmt == "iceberg":
        (df.writeTo(table).using("iceberg")
         .partitionedBy(*[F.bucket(buckets, c) for c in bucket_cols])
         .createOrReplace())
        return
    if fmt == "parquet":
        writer = (df.write.format("parquet").mode(mode)
                  .bucketBy(buckets, *bucket_cols))
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        if path is not None:
            writer = writer.option("path", path)
        writer.saveAsTable(table)
        return
    raise ValueError(f"unknown fmt {fmt!r}")


def read_bucketed(
    spark: SparkSession, table: str, fmt: str = "parquet"
) -> DataFrame:
    """Read a bucketed table WITH its bucketing metadata (a plain
    ``read.parquet`` on the files would lose it and re-shuffle)."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(table)
    if fmt == "parquet":
        return spark.table(table)
    raise ValueError(f"unknown fmt {fmt!r}")
