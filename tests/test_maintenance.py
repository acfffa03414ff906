"""Small-file compaction (sinks/maintenance.py)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.sinks.maintenance import (
    compact_parquet,
    dir_bytes,
)


def _parquet_files(path):
    return sorted(glob.glob(f"{path}/*.parquet"))


def test_compact_merges_small_files(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("v"))
    df.repartition(32).write.parquet(src)
    assert len(_parquet_files(src)) == 32

    total = dir_bytes(spark, src)
    assert total > 0
    # target half the directory per file -> exactly 2 output files
    out = compact_parquet(spark, src, dst,
                          target_file_bytes=(total + 1) // 2)
    assert len(_parquet_files(dst)) == 2
    assert out.count() == 4000
    assert (sorted(r["doc_id"] for r in out.collect())
            == list(range(4000)))


def test_compact_clustered_files_own_disjoint_key_ranges(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("v"))
    df.repartition(32).write.parquet(src)

    total = dir_bytes(spark, src)
    compact_parquet(spark, src, dst, target_file_bytes=(total + 3) // 4,
                    cluster_by=("doc_id",))
    files = _parquet_files(dst)
    assert 1 < len(files) <= 5
    spans = []
    for f in files:
        r = spark.read.parquet(f).agg(
            F.min("doc_id"), F.max("doc_id")).collect()[0]
        spans.append((r[0], r[1]))
    spans.sort()
    # disjoint, totally ordered ranges => min/max row-group stats prune
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    import pytest

    src = str(tmp_path / "src")
    zdst, cdst = str(tmp_path / "zdst"), str(tmp_path / "cdst")
    # 100x100 grid in (x, y): every file of a GOOD 2-D layout owns a
    # tile; a single-key layout owns an x-stripe spanning all of y
    n = 100
    df = spark.range(0, n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y"))
    df.repartition(16).write.parquet(src)
    total = dir_bytes(spark, src)
    per_file = (total + 15) // 16

    compact_parquet(spark, src, zdst, target_file_bytes=per_file,
                    zorder_by=("x", "y"))
    compact_parquet(spark, src, cdst, target_file_bytes=per_file,
                    cluster_by=("x",))

    def mean_span(path, col):
        spans = (spark.read.parquet(path)
                 .withColumn("_f", F.input_file_name())
                 .groupBy("_f")
                 .agg((F.max(col) - F.min(col)).alias("s"))
                 .agg(F.avg("s")).collect()[0][0])
        return float(spans)

    # the x-clustered control: x narrow, y spans the world
    assert mean_span(cdst, "y") > 0.9 * (n - 1)
    # z-order: BOTH dimensions bounded well below the full range
    assert mean_span(zdst, "x") < 0.5 * (n - 1)
    assert mean_span(zdst, "y") < 0.5 * (n - 1)
    # content preserved
    assert (spark.read.parquet(zdst).count() == n * n)
    assert (spark.read.parquet(zdst).agg(F.sum("x"), F.sum("y")).collect()
            == df.agg(F.sum("x"), F.sum("y")).collect())

    with pytest.raises(ValueError):
        compact_parquet(spark, src, str(tmp_path / "bad"),
                        cluster_by=("x",), zorder_by=("y",))
