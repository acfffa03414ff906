"""Continuous MV maintenance (streaming/mv.py).

Invariants: after draining the maintenance stream, the view equals
the direct aggregation of the source's current rows (same oracle as
the batch-refresh tests); replays — including a deleted checkpoint —
commit NOTHING (the applied-snapshot watermark is the replay wall,
independent of the checkpoint); replace-type source commits (COW
merge) are caught by the op guard and fall back to the net batch
refresh; compaction results in at most a watermark advance.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from bigdata_event_stream_detection_spark.sources.icelite import (
    append,
    compact_files,
    create_table,
    merge_into,
    read_table,
    snapshots,
)
from bigdata_event_stream_detection_spark.sources.icelite_mv import (
    create_materialized_view,
    read_materialized_view,
)
from bigdata_event_stream_detection_spark.sources.icelite_source import (
    available_now_drain,
)
from bigdata_event_stream_detection_spark.streaming.mv import (
    start_mv_maintenance,
)

SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("grp", StringType()),
    StructField("x", LongType()),
])

MEASURES = {"n": ("count", None), "sum_x": ("sum", "x")}


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), F.col("id") % 3).alias("grp"),
        (F.col("id") * 7).alias("x"))


def _direct(spark, path):
    return {r["grp"]: (r["n"], r["sum_x"])
            for r in read_table(spark, path).groupBy("grp")
            .agg(F.count("*").alias("n"),
                 F.sum("x").alias("sum_x")).collect()}


def _view(spark, mv):
    return {r["grp"]: (r["n"], r["sum_x"])
            for r in read_materialized_view(spark, mv).collect()}


@pytest.fixture()
def setup(spark, tmp_path):
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    create_table(src, SCHEMA)
    append(_rows(spark, 0, 120), src)
    create_materialized_view(spark, src, mv, ["grp"], MEASURES)
    return src, mv, ckpt


def _drain(spark, src, mv, ckpt):
    available_now_drain(
        lambda: start_mv_maintenance(spark, mv, ckpt), src,
        timeout_s=120)


def test_stream_tracks_appends_and_mor_deletes(spark, setup):
    src, mv, ckpt = setup
    append(_rows(spark, 120, 240), src)
    _drain(spark, src, mv, ckpt)
    assert _view(spark, mv) == _direct(spark, src)
    # MOR merge: upserts + deletes stream as exact change rows
    mrg = (_rows(spark, 60, 180)
           .withColumn("x", F.col("x") + 1000)
           .withColumn("is_delete", F.col("k") % 4 == 0))
    merge_into(spark, src, mrg, key="k", delete_col="is_delete",
               strategy="merge-on-read")
    _drain(spark, src, mv, ckpt)
    assert _view(spark, mv) == _direct(spark, src)


def test_replay_after_checkpoint_loss_commits_nothing(spark, setup):
    src, mv, ckpt = setup
    append(_rows(spark, 120, 200), src)
    _drain(spark, src, mv, ckpt)
    want = _view(spark, mv)
    n_snaps = len(snapshots(mv))
    shutil.rmtree(ckpt)  # full checkpoint loss: stream replans from
    _drain(spark, src, mv, ckpt)  # the earliest retained snapshot
    assert _view(spark, mv) == want
    assert len(snapshots(mv)) == n_snaps  # zero commits on replay


def test_cow_merge_falls_back_to_net_refresh(spark, setup):
    src, mv, ckpt = setup
    _drain(spark, src, mv, ckpt)
    mrg = (_rows(spark, 0, 90)
           .withColumn("x", F.col("x") + 5)
           .withColumn("is_delete", F.col("k") % 9 == 0))
    merge_into(spark, src, mrg, key="k", delete_col="is_delete")
    append(_rows(spark, 240, 300), src)  # mixed range: replace + append
    _drain(spark, src, mv, ckpt)
    assert _view(spark, mv) == _direct(spark, src)


def test_append_then_cow_merge_single_drain(spark, setup):
    """Replace-type commit AFTER an append in the SAME trigger range:
    the batch carries only the append's rows, so a rows-bounded
    replace check would miss the trailing COW merge and leave the
    view stale forever.  The guard must cover the planned range."""
    src, mv, ckpt = setup
    _drain(spark, src, mv, ckpt)
    append(_rows(spark, 240, 300), src)  # row-producing commit first
    mrg = (_rows(spark, 0, 90)
           .withColumn("x", F.col("x") + 5)
           .withColumn("is_delete", F.col("k") % 9 == 0))
    merge_into(spark, src, mrg, key="k", delete_col="is_delete")
    _drain(spark, src, mv, ckpt)  # ONE drain over append -> merge
    assert _view(spark, mv) == _direct(spark, src)
    # and the stream stays consistent afterwards (no double-apply)
    append(_rows(spark, 300, 330), src)
    _drain(spark, src, mv, ckpt)
    assert _view(spark, mv) == _direct(spark, src)


def test_stream_maintains_filtered_view(spark, tmp_path):
    src = str(tmp_path / "fsrc")
    mv = str(tmp_path / "fmv")
    ckpt = str(tmp_path / "fckpt")
    create_table(src, SCHEMA)
    append(_rows(spark, 0, 100), src)
    create_materialized_view(spark, src, mv, ["grp"], MEASURES,
                             filter_sql="x < 500")
    # MOR merge bumps x for a slice: those rows LEAVE the predicate
    # through the stream's delta path
    mrg = (_rows(spark, 30, 90)
           .withColumn("x", F.col("x") + 1000)
           .withColumn("is_delete", F.col("k") % 6 == 0))
    merge_into(spark, src, mrg, key="k", delete_col="is_delete",
               strategy="merge-on-read")
    append(_rows(spark, 100, 140), src)
    _drain(spark, src, mv, ckpt)
    want = {r["grp"]: (r["n"], r["sum_x"])
            for r in read_table(spark, src).filter("x < 500")
            .groupBy("grp").agg(F.count("*").alias("n"),
                                F.sum("x").alias("sum_x")).collect()}
    assert _view(spark, mv) == want


def test_compaction_is_content_noop(spark, setup):
    src, mv, ckpt = setup
    append(_rows(spark, 120, 160), src)
    _drain(spark, src, mv, ckpt)
    want = _view(spark, mv)
    compact_files(spark, src, n_files=1, small_mb=10_000)
    _drain(spark, src, mv, ckpt)
    assert _view(spark, mv) == want == _direct(spark, src)
