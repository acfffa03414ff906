"""Table maintenance: small-file compaction (+ optional clustering).

A streaming sink that commits every trigger leaves thousands of
KB-sized parquet files per partition; at 100 TB the scan then pays a
task per file and the namenode/object-store pays a listing per file —
compaction is routine maintenance, not an optimization. Iceberg has
this built in (``rewrite_data_files``); this module is the same
operation for plain parquet directories, sized from the actual file
manifest rather than guessed.

``cluster_by`` additionally range-partitions + sorts the rewrite so
each output file owns a disjoint key range — parquet min/max row-group
stats then prune file scans for key-predicate queries (the poor
man's Z-order for a single key).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API — works
    on local paths, HDFS, and s3a:// alike (no driver-side os.walk)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 << 20,
    cluster_by: tuple[str, ...] = (),
    mode: str = "error",
) -> DataFrame:
    """Rewrite the parquet directory ``src`` into ``dst`` with
    ~``target_file_bytes`` files.

    Without ``cluster_by`` the rewrite is a shuffle-free ``coalesce``
    (tasks concatenate input splits). With ``cluster_by`` it pays one
    range shuffle to make output files key-disjoint and sorted.
    Returns the compacted DataFrame (lazily re-read from ``dst``).
    """
    df = spark.read.parquet(src)
    n_files = max(1, math.ceil(dir_bytes(spark, src) / target_file_bytes))
    if cluster_by:
        out = (df.repartitionByRange(n_files, *cluster_by)
               .sortWithinPartitions(*cluster_by))
    else:
        out = df.coalesce(n_files)
    out.write.mode(mode).parquet(dst)
    return spark.read.parquet(dst)
