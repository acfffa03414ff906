"""Table-to-table CDC mirroring: icelite CDC stream -> apply-changes
sink. After every drain the mirror's live view equals the source's
live rows, exactly-once under replay and across new source commits.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.sources.icelite import (
    append,
    compact_files,
    create_table,
    delete_where,
    merge_into,
    snapshots,
)
from bigdata_event_stream_detection_spark.sources.icelite_source import (
    IceliteDataSource,
    available_now_drain,
)
from bigdata_event_stream_detection_spark.streaming.icelite_sink import (
    compact_cdc_delta,
    read_cdc_snapshot,
    start_cdc_mirror,
)


def _df(spark):
    return spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g"),
        (F.col("id") * 1.0).alias("v"))


def _same_rows(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@pytest.fixture()
def mirror_env(spark, tmp_path):
    spark.dataSource.register(IceliteDataSource)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    df = _df(spark)
    create_table(src, df.schema)
    append(df.filter("k < 50").repartition(2), src)
    append(df.filter("k >= 50").repartition(2), src)

    def drain():
        return available_now_drain(
            lambda: start_cdc_mirror(spark, src, dst, ckpt, key_col="k"),
            src)

    return src, dst, drain


def _live(spark, src):
    from bigdata_event_stream_detection_spark.sources.icelite import (
        read_table,
    )

    return read_table(spark, src).select("k", "g", "v")


def test_mirror_tracks_source(spark, mirror_env):
    src, dst, drain = mirror_env
    drain()
    got = read_cdc_snapshot(spark, dst).select("k", "g", "v")
    assert _same_rows(got, _live(spark, src))

    # updates + deletes + fresh keys flow through merge-on-read
    upd = (_df(spark).filter("k % 10 = 0")
           .withColumn("v", F.col("v") + 1000)
           .withColumn("is_delete", F.col("k") % 20 == 0)
           .unionByName(_df(spark).filter("k = 7").select(
               (F.col("k") + 500).alias("k"), "g", "v",
               F.lit(False).alias("is_delete"))))
    merge_into(spark, src, upd, key="k", delete_col="is_delete",
               strategy="merge-on-read")
    delete_where(spark, src, [("g", "=", 3)], strategy="merge-on-read")
    drain()
    got = read_cdc_snapshot(spark, dst).select("k", "g", "v")
    assert _same_rows(got, _live(spark, src))

    # replay no-op: nothing new -> no new target snapshots
    n = len(snapshots(dst))
    drain()
    assert len(snapshots(dst)) == n
    assert _same_rows(read_cdc_snapshot(spark, dst).select("k", "g", "v"),
                      _live(spark, src))


def test_mirror_survives_target_compaction(spark, mirror_env):
    src, dst, drain = mirror_env
    drain()
    merge_into(spark, src,
               _df(spark).filter("k < 5")
               .withColumn("v", F.col("v") + 9)
               .withColumn("is_delete", F.lit(False)),
               key="k", delete_col="is_delete", strategy="merge-on-read")
    drain()
    compact_cdc_delta(spark, dst)
    assert _same_rows(read_cdc_snapshot(spark, dst).select("k", "g", "v"),
                      _live(spark, src))
    # new changes still flow after maintenance
    delete_where(spark, src, [("k", "<", 3)], strategy="merge-on-read")
    drain()
    assert _same_rows(read_cdc_snapshot(spark, dst).select("k", "g", "v"),
                      _live(spark, src))


def test_mirror_skips_source_compaction(spark, mirror_env):
    src, dst, drain = mirror_env
    drain()
    before = read_cdc_snapshot(spark, dst).select("k", "g", "v")
    compact_files(spark, src, target_mb=1)
    drain()
    after = read_cdc_snapshot(spark, dst).select("k", "g", "v")
    assert _same_rows(before, after)
    assert _same_rows(after, _live(spark, src))
