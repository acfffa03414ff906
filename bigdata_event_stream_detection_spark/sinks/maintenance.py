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
from pyspark.sql import functions as F


def _zorder_key(df: DataFrame, cols: tuple[str, ...],
                bits: int = 8):
    """Interleaved-bit Z-order key over ``cols`` (the Delta/Iceberg
    OPTIMIZE ZORDER layout, as a plain Column expression).

    Each column maps to a ``bits``-bit surrogate by min-max scaling
    (one 1-row agg collect), then the surrogates bit-interleave into
    one integer whose range order is the Z-curve: sorting by it gives
    every output file a HYPER-RECTANGLE of the key space, so parquet
    min/max row-group stats prune scans for predicates on ANY of the
    columns, not just the leading one. Min-max binning is exact for
    roughly-uniform keys (ids, hashes, timestamps); heavily skewed
    keys want a quantile surrogate — documented trade, same curve.
    """
    stats = df.agg(*[f for c in cols for f in
                     (F.min(c).alias(f"_lo_{c}"),
                      F.max(c).alias(f"_hi_{c}"))]).collect()[0]
    levels = (1 << bits) - 1
    surrogates = []
    for c in cols:
        lo = float(stats[f"_lo_{c}"])
        hi = float(stats[f"_hi_{c}"])
        span = (hi - lo) or 1.0
        surrogates.append(
            F.least(F.lit(levels), F.floor(
                (F.col(c).cast("double") - F.lit(lo))
                / F.lit(span) * levels).cast("long")))
    key = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, s in enumerate(surrogates):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * n + (n - 1 - i))
    return key


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
    zorder_by: tuple[str, ...] = (),
    mode: str = "error",
) -> DataFrame:
    """Rewrite the parquet directory ``src`` into ``dst`` with
    ~``target_file_bytes`` files.

    Without ``cluster_by``/``zorder_by`` the rewrite is a shuffle-free
    ``coalesce`` (tasks concatenate input splits). ``cluster_by`` pays
    one range shuffle to make output files disjoint + sorted on ONE
    key prefix; ``zorder_by`` pays the same single shuffle but on the
    interleaved-bit Z-curve key, so min/max pruning works for
    predicates on EVERY listed column (multi-dimensional layout — the
    parquet analog of Iceberg/Delta OPTIMIZE ZORDER). The two are
    mutually exclusive. Returns the compacted DataFrame (lazily
    re-read from ``dst``).
    """
    if cluster_by and zorder_by:
        raise ValueError("cluster_by and zorder_by are mutually exclusive")
    df = spark.read.parquet(src)
    n_files = max(1, math.ceil(dir_bytes(spark, src) / target_file_bytes))
    if zorder_by:
        zk = _zorder_key(df, tuple(zorder_by))
        out = (df.withColumn("_zk", zk)
               .repartitionByRange(n_files, "_zk")
               .sortWithinPartitions("_zk")
               .drop("_zk"))
    elif cluster_by:
        out = (df.repartitionByRange(n_files, *cluster_by)
               .sortWithinPartitions(*cluster_by))
    else:
        out = df.coalesce(n_files)
    out.write.mode(mode).parquet(dst)
    return spark.read.parquet(dst)
