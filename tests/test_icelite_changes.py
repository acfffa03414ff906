"""Changelog (CDF) scans: batch ``table_changes`` and the streaming
``.option("mode", "cdc")`` source.

Semantics under test (Iceberg changelog-scan parity, by behavior):

* appends -> inserts; merge-on-read merge -> inserts + exact deletes
  (an update = delete(old) + insert(new)); MOR positional delete ->
  deletes of the rows that were LIVE in the parent (overlapping
  re-deletes are not double-reported); COW rewrites -> exact net
  multiset diff under ``replace_mode='net'``; compaction and
  metadata-only commits emit nothing.
* The apply property: from-state + inserts - deletes == to-state
  (multiset equality), for every scanned range.
* The streaming CDC source emits the SAME change rows incrementally,
  exactly-once across drain/restart.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.sources.icelite import (
    add_columns,
    append,
    compact_files,
    create_table,
    delete_where,
    merge_into,
    overwrite,
    read_table,
)
from bigdata_event_stream_detection_spark.sources.icelite_changes import (
    table_changes,
)


def _base(spark):
    return spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g"),
        (F.col("id") * 1.0).alias("v"))


def _multiset_equal(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@pytest.fixture()
def history(spark, tmp_path):
    """A table with one commit of every change-producing kind.

    1 create | 2,3 append | 4 merge-mor (update k%10, delete k%20,
    insert k+200 for k%25) | 5 MOR delete g==3 | 6 MOR delete g>=3
    (overlaps 5) | 7 COW delete k in [90,99] | 8 compact.
    """
    df = _base(spark)
    tbl = str(tmp_path / "t")
    create_table(tbl, df.schema)
    append(df.filter("k < 50").repartition(2), tbl)
    append(df.filter("k >= 50").repartition(2), tbl)
    src = (df.filter("k % 10 = 0").withColumn("v", F.col("v") + 1000)
           .withColumn("is_delete", F.col("k") % 20 == 0)
           .unionByName(df.filter("k % 25 = 0").select(
               (F.col("k") + 200).alias("k"), "g", "v",
               F.lit(False).alias("is_delete"))))
    merge_into(spark, tbl, src, key="k", delete_col="is_delete",
               strategy="merge-on-read")
    delete_where(spark, tbl, [("g", "=", 3)], strategy="merge-on-read")
    delete_where(spark, tbl, [("g", ">=", 3)], strategy="merge-on-read")
    delete_where(spark, tbl, [("k", "between", (90, 99))],
                 strategy="copy-on-write")
    compact_files(spark, tbl, target_mb=1)
    return tbl


def test_change_counts_per_snapshot(spark, history):
    ch = table_changes(spark, history)
    rows = {(r["_commit_snapshot_id"], r["_change_type"]): r["count"]
            for r in ch.groupBy("_commit_snapshot_id", "_change_type")
            .count().collect()}
    assert rows[(2, "insert")] == 50 and rows[(3, "insert")] == 50
    # merge-mor: 5 kept upserts + 4 new keys inserted; 10 old versions
    # of the source keys present in the parent deleted
    assert rows[(4, "insert")] == 9 and rows[(4, "delete")] == 10
    # g==3 live rows (k%5==3, none touched by the merge)
    assert rows[(5, "delete")] == 20
    # overlap: g>=3 re-deletes g==3 (already dead, NOT re-reported)
    # and kills the 20 live g==4 rows
    assert rows[(6, "delete")] == 20
    # COW delete of k in [90,99]: only still-live rows count
    assert rows[(7, "delete")] == len(
        [k for k in range(90, 100) if k % 5 not in (3, 4)])
    # compaction emits nothing
    assert not any(sid == 8 for sid, _ in rows)


def test_apply_property_and_concat(spark, history):
    ch = table_changes(spark, history)
    ins = ch.filter("_change_type = 'insert'").select("k", "g", "v")
    dele = ch.filter("_change_type = 'delete'").select("k", "g", "v")
    now = read_table(spark, history).select("k", "g", "v")
    assert _multiset_equal(ins.exceptAll(dele), now)
    # range concatenation: (1,5] ∪ (5,8] == (1,8]
    a = table_changes(spark, history, 1, 5).drop("_change_ordinal")
    b = table_changes(spark, history, 5, 8).drop("_change_ordinal")
    full = table_changes(spark, history, 1, 8).drop("_change_ordinal")
    assert _multiset_equal(a.unionByName(b), full)


def test_update_is_delete_plus_insert(spark, history):
    ch = table_changes(spark, history, 3, 4)
    k0 = ch.filter("k = 10").select("_change_type", "v").collect()
    got = {(r["_change_type"], r["v"]) for r in k0}
    assert got == {("delete", 10.0), ("insert", 1010.0)}
    # a delete_col row emits only the delete
    k20 = ch.filter("k = 20").collect()
    assert [r["_change_type"] for r in k20] == ["delete"]
    # a brand-new key emits only the insert
    k200 = ch.filter("k = 200").collect()
    assert [r["_change_type"] for r in k200] == ["insert"]


def test_replace_modes(spark, history):
    with pytest.raises(ValueError, match="rewrite"):
        table_changes(spark, history, replace_mode="raise")
    skipped = table_changes(spark, history, replace_mode="skip")
    assert skipped.filter("_commit_snapshot_id = 7").count() == 0
    # net mode on an overwrite: exact diff
    df = _base(spark)
    ow = df.filter("k < 10").withColumn("v", F.col("v") + 7)
    overwrite(ow, history)
    ch = table_changes(spark, history, 8, 9)
    assert ch.filter("_change_type = 'insert'").count() == 10
    # everything live at snap 8 deleted
    before = read_table(spark, history, version=8)
    assert (ch.filter("_change_type = 'delete'").count()
            == before.count())


def test_schema_evolution_null_fills(spark, tmp_path):
    from pyspark.sql.types import StringType, StructField, StructType

    df = _base(spark)
    tbl = str(tmp_path / "t")
    create_table(tbl, df.schema)
    append(df.filter("k < 10"), tbl)
    add_columns(tbl, StructType([StructField("tag", StringType())]))
    append(df.filter("k >= 90").withColumn("tag", F.lit("new")), tbl)
    ch = table_changes(spark, tbl)
    assert "tag" in ch.columns
    old = ch.filter("k < 10").select("tag").distinct().collect()
    assert [r["tag"] for r in old] == [None]
    assert ch.filter("k >= 90 and tag = 'new'").count() == 10


def test_expired_parent_raises_cleanly(spark, tmp_path):
    from bigdata_event_stream_detection_spark.sources.icelite import (
        expire_snapshots,
    )

    df = _base(spark)
    tbl = str(tmp_path / "t")
    create_table(tbl, df.schema)
    append(df.filter("k < 50"), tbl)
    append(df.filter("k >= 50"), tbl)
    expire_snapshots(tbl, keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        table_changes(spark, tbl, from_version=1)
    # the retained range still scans (from the earliest retained)
    assert table_changes(spark, tbl).count() == 0  # snap 3 kept, no new


@pytest.fixture()
def cdc_stream_env(spark, tmp_path):
    from bigdata_event_stream_detection_spark.sources.icelite_source import (
        IceliteDataSource,
    )

    spark.dataSource.register(IceliteDataSource)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def start(tbl):
        def _go():
            s = (spark.readStream.format("icelite")
                 .option("mode", "cdc")
                 .option("skip-replace-snapshots", "true").load(tbl))
            return (s.writeStream.format("parquet")
                    .option("path", out)
                    .option("checkpointLocation", ckpt)
                    .trigger(processingTime="1 seconds").start())
        return _go

    return start, out


def test_cdc_stream_matches_batch(spark, history, cdc_stream_env):
    from bigdata_event_stream_detection_spark.sources.icelite_source import (
        available_now_drain,
    )

    start, out = cdc_stream_env
    available_now_drain(start(history), history)
    got = spark.read.parquet(out).drop("_change_ordinal")
    want = table_changes(spark, history, replace_mode="skip") \
        .drop("_change_ordinal")
    assert _multiset_equal(got, want)

    # a new MOR merge flows through resume as delete(old)+insert(new)
    src = (_base(spark).filter("k = 1")
           .withColumn("v", F.col("v") + 5)
           .withColumn("is_delete", F.lit(False)))
    merge_into(spark, history, src, key="k", delete_col="is_delete",
               strategy="merge-on-read")
    available_now_drain(start(history), history)
    got2 = spark.read.parquet(out).drop("_change_ordinal")
    new = got2.exceptAll(got)
    assert new.count() == 2
    assert ({r["_change_type"] for r in new.collect()}
            == {"insert", "delete"})

    # replay no-op: a third drain with no commits emits nothing
    available_now_drain(start(history), history)
    assert spark.read.parquet(out).count() == got2.count()


def test_cdc_stream_raises_on_cow_without_skip(spark, tmp_path):
    from bigdata_event_stream_detection_spark.sources.icelite_source import (
        IceliteDataSource,
        available_now_drain,
    )

    spark.dataSource.register(IceliteDataSource)
    df = _base(spark)
    tbl = str(tmp_path / "t")
    create_table(tbl, df.schema)
    append(df, tbl)
    delete_where(spark, tbl, [("k", "<", 10)], strategy="copy-on-write")

    def _go():
        s = (spark.readStream.format("icelite").option("mode", "cdc")
             .load(tbl))
        return (s.writeStream.format("parquet")
                .option("path", str(tmp_path / "o"))
                .option("checkpointLocation", str(tmp_path / "c"))
                .trigger(processingTime="1 seconds").start())

    with pytest.raises(Exception, match="rewrite"):
        available_now_drain(_go, tbl, timeout_s=60)


def test_rollback_restores_state_and_diffs(spark, tmp_path):
    from bigdata_event_stream_detection_spark.sources.icelite import (
        create_tag,
        rollback_to,
        snapshots,
    )

    df = _base(spark)
    tbl = str(tmp_path / "t")
    create_table(tbl, df.schema)
    append(df.filter("k < 50"), tbl)                       # snap 2
    create_tag(tbl, "good")
    append(df.filter("k >= 50"), tbl)                      # snap 3 (bad)
    delete_where(spark, tbl, [("k", "<", 10)],
                 strategy="merge-on-read")                 # snap 4 (bad)
    rollback_to(tbl, tag="good")                           # snap 5
    got = read_table(spark, tbl)
    want = read_table(spark, tbl, version=2)
    assert _multiset_equal(got.select("k", "g", "v"),
                           want.select("k", "g", "v"))
    assert got.count() == 50
    # history preserved: the bad commits still time-travel
    assert read_table(spark, tbl, version=4).count() == 90
    assert [s["operation"] for s in snapshots(tbl)][-1] == "rollback"

    # changelog net diff of the rollback: un-inserts the bad append,
    # restores the MOR-deleted rows
    ch = table_changes(spark, tbl, 4, 5)
    by = {r["_change_type"]: r["count"]
          for r in ch.groupBy("_change_type").count().collect()}
    assert by.get("delete", 0) == 50   # the k>=50 rows leave
    assert by.get("insert", 0) == 10   # the MOR-deleted k<10 rows return

    # apply property across the whole history including the rollback
    full = table_changes(spark, tbl)
    ins = full.filter("_change_type = 'insert'").select("k", "g", "v")
    dele = full.filter("_change_type = 'delete'").select("k", "g", "v")
    assert _multiset_equal(ins.exceptAll(dele),
                           got.select("k", "g", "v"))

    # appends continue cleanly after a rollback
    append(df.filter("k >= 90"), tbl)
    assert read_table(spark, tbl).count() == 60


def test_rollback_is_replace_type_for_streams(spark, tmp_path):
    from bigdata_event_stream_detection_spark.sources.icelite import (
        rollback_to,
    )
    from bigdata_event_stream_detection_spark.sources.icelite_source import (
        IceliteDataSource,
        available_now_drain,
    )

    spark.dataSource.register(IceliteDataSource)
    df = _base(spark)
    tbl = str(tmp_path / "t")
    create_table(tbl, df.schema)
    append(df.filter("k < 50"), tbl)
    append(df.filter("k >= 50"), tbl)
    rollback_to(tbl, snapshot_id=2)

    def _go():
        s = (spark.readStream.format("icelite")
             .option("mode", "cdc").load(tbl))
        return (s.writeStream.format("parquet")
                .option("path", str(tmp_path / "o"))
                .option("checkpointLocation", str(tmp_path / "c"))
                .trigger(processingTime="1 seconds").start())

    with pytest.raises(Exception, match="rewrite"):
        available_now_drain(_go, tbl, timeout_s=60)


def test_changes_span_rename_of_live_eq_key(spark, tmp_path):
    """r5: the eq-delete key can be renamed while delete files are
    live; a changes scan spanning the rename must still resolve every
    mor-delete task's key (entries carry the key's field id) and the
    apply property must hold in the post-rename schema."""
    from bigdata_event_stream_detection_spark.sources.icelite import (
        rename_column,
    )

    df = _base(spark)
    tbl = str(tmp_path / "t")
    create_table(tbl, df.schema)
    append(df.repartition(2), tbl)
    # live eq deletes under the OLD name
    src = (df.filter("k % 10 = 0").withColumn("v", F.col("v") + 1000)
           .withColumn("is_delete", F.col("k") % 20 == 0))
    merge_into(spark, tbl, src, key="k", delete_col="is_delete",
               strategy="merge-on-read")
    rename_column(tbl, "k", "key")  # deletes stay live
    # more MOR work under the NEW name, intersecting the old deletes
    src2 = (spark.range(5, 40, 5).select(
        F.col("id").alias("key"), (F.col("id") % 5).alias("g"),
        F.lit(-2.0).alias("v"), (F.col("id") % 15 == 0).alias("dead")))
    merge_into(spark, tbl, src2, key="key", delete_col="dead",
               strategy="merge-on-read")
    ch = table_changes(spark, tbl)
    assert "key" in ch.columns and "k" not in ch.columns
    ins = ch.filter("_change_type = 'insert'").select("key", "g", "v")
    dele = ch.filter("_change_type = 'delete'").select("key", "g", "v")
    now = read_table(spark, tbl).select("key", "g", "v")
    assert _multiset_equal(ins.exceptAll(dele), now)


def test_cdc_stream_plans_renamed_live_eq_key(spark, tmp_path,
                                              cdc_stream_env):
    """Streaming twin of the rename-with-live-deletes scan: the stream
    starts AFTER the key rename, so every mor-delete task for the
    pre-rename commits must resolve its key through the entry's kid
    stamp into the post-rename schema."""
    from bigdata_event_stream_detection_spark.sources.icelite import (
        rename_column,
    )
    from bigdata_event_stream_detection_spark.sources.icelite_source import (
        available_now_drain,
    )

    df = _base(spark)
    tbl = str(tmp_path / "t")
    create_table(tbl, df.schema)
    append(df.repartition(2), tbl)
    src = (df.filter("k % 10 = 0").withColumn("v", F.col("v") + 1000)
           .withColumn("is_delete", F.col("k") % 20 == 0))
    merge_into(spark, tbl, src, key="k", delete_col="is_delete",
               strategy="merge-on-read")
    rename_column(tbl, "k", "key")  # live eq deletes under old name
    start, out = cdc_stream_env
    available_now_drain(start(tbl), tbl)
    got = spark.read.parquet(out).drop("_change_ordinal")
    assert "key" in got.columns and "k" not in got.columns
    want = table_changes(spark, tbl, replace_mode="skip") \
        .drop("_change_ordinal")
    assert _multiset_equal(got, want)
    ins = got.filter("_change_type = 'insert'").select("key", "g", "v")
    dele = got.filter("_change_type = 'delete'").select("key", "g", "v")
    now = read_table(spark, tbl).select("key", "g", "v")
    assert _multiset_equal(ins.exceptAll(dele), now)
