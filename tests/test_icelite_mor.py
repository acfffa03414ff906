"""Merge-on-read deletes (Iceberg v2 semantics) for icelite.

The invariants are physical as well as value-level, mirroring
tests/test_icelite.py's copy-on-write asserts from the other side:
a merge-on-read commit must leave EVERY pre-existing data file
byte-identical AND still referenced (no rewrite happened), while the
read converges to the same rows a copy-on-write rewrite produces.
Sequence numbers carry the ordering: an equality delete kills only
strictly-older files, so a commit's own inserts — and any later
re-insert of a deleted key — survive.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from bigdata_event_stream_detection_spark.sources import icelite
from bigdata_event_stream_detection_spark.sources.icelite import (
    append,
    compact_files,
    create_table,
    delete_where,
    expire_snapshots,
    merge_into,
    read_table,
    remove_dangling_deletes,
    set_properties,
    snapshots,
    table_files,
    table_properties,
)

SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("v", StringType()),
])


def _rows(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit(tag), F.col("id")).alias("v"))


def _content(spark, path):
    return {(r["k"], r["v"]) for r in read_table(spark, path).collect()}


def _file_state(path):
    return {e["path"]: (os.path.getsize(os.path.join(path, e["path"])),
                        os.path.getmtime(os.path.join(path, e["path"])))
            for e in table_files(path)}


def test_mor_merge_upsert_delete_and_reinsert(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(path, SCHEMA)
    append(_rows(spark, 0, 10), path)
    before = _file_state(path)

    src = (_rows(spark, 3, 6, tag="upd")
           .withColumn("is_del", F.lit(False))
           .unionByName(_rows(spark, 7, 8)
                        .withColumn("is_del", F.lit(True))))
    merge_into(spark, path, src, key="k", delete_col="is_del",
               strategy="merge-on-read")

    got = dict(_content(spark, path))
    assert set(got) == {0, 1, 2, 3, 4, 5, 6, 8, 9}
    assert got[3] == "upd3" and got[4] == "upd4"
    assert got[0] == "a0" and got[9] == "a9"

    # no data file was rewritten: every pre-merge file is still
    # referenced, byte-identical on disk
    after = _file_state(path)
    assert all(after.get(p) == st for p, st in before.items())
    assert snapshots(path)[-1]["operation"] == "merge-mor"
    assert snapshots(path)[-1]["summary"]["added_delete_files"] == 1

    # re-insert of the deleted key AFTER the delete survives (its file
    # seq is greater than the equality delete's)
    merge_into(spark, path,
               _rows(spark, 7, 8, tag="back").withColumn(
                   "is_del", F.lit(False)),
               key="k", delete_col="is_del", strategy="merge-on-read")
    got2 = dict(_content(spark, path))
    assert got2[7] == "back7"
    assert len(got2) == 10


def test_mor_merge_matches_cow_merge(spark, tmp_path):
    p_mor, p_cow = str(tmp_path / "mor"), str(tmp_path / "cow")
    for p in (p_mor, p_cow):
        create_table(p, SCHEMA)
        append(_rows(spark, 0, 200).repartition(4), p)
    src = (_rows(spark, 50, 120, tag="u")
           .withColumn("is_del", (F.col("k") % 10) == 0)
           .unionByName(_rows(spark, 500, 520, tag="ins")
                        .withColumn("is_del", F.lit(False))))
    merge_into(spark, p_mor, src, key="k", delete_col="is_del",
               strategy="merge-on-read")
    merge_into(spark, p_cow, src, key="k", delete_col="is_del")
    assert _content(spark, p_mor) == _content(spark, p_cow)


def test_mor_merge_rejects_precedence_and_null_keys(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(path, SCHEMA)
    append(_rows(spark, 0, 5), path)
    with pytest.raises(ValueError, match="precedence"):
        merge_into(spark, path, _rows(spark, 0, 1), key="k",
                   precedence=("v",), strategy="merge-on-read")
    bad = spark.createDataFrame([(None, "x")], SCHEMA)
    with pytest.raises(ValueError, match="null"):
        merge_into(spark, path, bad, key="k", strategy="merge-on-read")


def test_delete_where_mor_vs_cow_parity(spark, tmp_path):
    p_mor, p_cow = str(tmp_path / "mor"), str(tmp_path / "cow")
    for p in (p_mor, p_cow):
        create_table(p, SCHEMA)
        append(_rows(spark, 0, 300).repartitionByRange(4, "k"), p)
    where = [("k", "between", (40, 260))]
    before = _file_state(p_mor)
    assert delete_where(spark, p_mor, where) is not None
    assert delete_where(spark, p_cow, where,
                        strategy="copy-on-write") is not None
    assert _content(spark, p_mor) == _content(spark, p_cow)
    assert {k for k, _ in _content(spark, p_mor)} == (
        set(range(0, 40)) | set(range(261, 300)))
    # MOR: zero data files touched; COW: the overlapping files replaced
    assert _file_state(p_mor) == before
    assert snapshots(p_mor)[-1]["summary"]["added_delete_files"] >= 1
    assert snapshots(p_cow)[-1]["summary"]["removed_files"] >= 1
    # a predicate no file can match is a planning-time no-op
    assert delete_where(spark, p_mor, [("k", ">", 10_000)]) is None


def test_delete_where_after_mor_merge_composes(spark, tmp_path):
    # pending equality deletes + positional deletes + a COW rewrite
    # all composing on one table
    path = str(tmp_path / "t")
    create_table(path, SCHEMA)
    append(_rows(spark, 0, 100), path)
    merge_into(spark, path,
               _rows(spark, 10, 20, tag="u").withColumn(
                   "is_del", F.col("k") == 15),
               key="k", delete_col="is_del", strategy="merge-on-read")
    delete_where(spark, path, [("k", "between", (90, 99))])
    want = ({(k, f"a{k}") for k in range(100)
             if k < 10 or (20 <= k < 90)}
            | {(k, f"u{k}") for k in range(10, 20) if k != 15})
    assert _content(spark, path) == want
    # the COW rewrite (delete_where copy-on-write over everything)
    # folds both delete kinds in and must not resurrect anything
    delete_where(spark, path, [("k", "<", 5)], strategy="copy-on-write")
    want = {t for t in want if t[0] >= 5}
    assert _content(spark, path) == want


def test_compact_folds_deletes_and_dangling_cleanup(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(path, SCHEMA)
    append(_rows(spark, 0, 100).repartition(4), path)
    merge_into(spark, path,
               _rows(spark, 0, 30, tag="u").withColumn(
                   "is_del", F.col("k") < 10),
               key="k", delete_col="is_del", strategy="merge-on-read")
    delete_where(spark, path, [("k", "between", (95, 99))])
    want = _content(spark, path)
    assert {k for k, _ in want} == set(range(10, 95))

    # full rewrite folds every delete in; the snapshot drops them
    sid = compact_files(spark, path, small_mb=10_000)
    assert sid is not None
    snap = icelite._load_snapshot(path, sid)
    assert snap["delete_manifests"] == []
    assert _content(spark, path) == want
    assert remove_dangling_deletes(path) is None  # nothing left


def test_partial_compact_keeps_applicable_deletes(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(path, SCHEMA)
    append(_rows(spark, 0, 50).coalesce(1), path)     # small file
    append(_rows(spark, 50, 100).coalesce(1), path)   # small file
    # a big third append that partial compaction will skip
    append(_rows(spark, 100, 5000).coalesce(1), path,
           parquet_block_bytes=1 << 20)
    delete_where(spark, path, [("k", "between", (40, 60))])
    delete_where(spark, path, [("k", "between", (200, 210))])
    want = _content(spark, path)

    sizes = sorted(e["bytes"] for e in table_files(path))
    small_mb = (sizes[1] + 1) / (1 << 20)  # rewrite the two small files
    sid = compact_files(spark, path, small_mb=small_mb, target_mb=1)
    assert sid is not None
    snap = icelite._load_snapshot(path, sid)
    assert snap["delete_manifests"]  # partial: deletes carried
    assert _content(spark, path) == want

    # the delete covering only the rewritten files is now dangling;
    # the one referencing the surviving big file must stay
    res = remove_dangling_deletes(path)
    assert res == {"dropped": 1}
    assert _content(spark, path) == want
    assert icelite._snapshot_delete_entries(
        path, icelite._load_snapshot(
            path, icelite.current_snapshot_id(path)))


def test_expire_keeps_live_delete_files(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(path, SCHEMA)
    append(_rows(spark, 0, 100), path)
    delete_where(spark, path, [("k", "<", 20)])
    append(_rows(spark, 100, 120), path)
    want = _content(spark, path)
    expire_snapshots(path, keep_last=1)
    assert _content(spark, path) == want  # delete files survived expiry
    # and a delete file owned ONLY by expired snapshots is reclaimed
    # once a full compaction supersedes it
    compact_files(spark, path, small_mb=10_000)
    expire_snapshots(path, keep_last=1)
    assert _content(spark, path) == want
    data_files = os.listdir(os.path.join(path, "data"))
    assert not any(n.startswith("d-") for n in data_files)


def test_properties_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(path, SCHEMA, properties={"owner": "besd", "x": "1"})
    assert table_properties(path) == {"owner": "besd", "x": "1"}
    set_properties(path, {"x": None, "y": "2"})
    assert table_properties(path) == {"owner": "besd", "y": "2"}
    append(_rows(spark, 0, 3), path)  # carried across data commits
    assert table_properties(path) == {"owner": "besd", "y": "2"}


def test_seq_stamping_and_legacy_default(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(path, SCHEMA)
    append(_rows(spark, 0, 10), path)          # snapshot 2
    append(_rows(spark, 10, 20), path)         # snapshot 3
    seqs = sorted({e["seq"] for e in table_files(path)})
    assert seqs == [2, 3]
    assert icelite._entry_seq({"path": "x"}) == 0  # pre-MOR entries


def test_streaming_source_rejects_then_skips_mor_commits(spark, tmp_path):
    """MOR commits are not representable as appends: the incremental
    scan fails on them by default (Iceberg's contract) and skips them
    under skip-replace-snapshots — appended rows still flow."""
    from pyspark.errors.exceptions.base import PySparkException

    from bigdata_event_stream_detection_spark.sources.icelite_source import (
        IceliteDataSource,
    )

    spark.dataSource.register(IceliteDataSource)
    path = str(tmp_path / "t")
    create_table(path, SCHEMA)
    append(_rows(spark, 0, 20), path)
    delete_where(spark, path, [("k", "<", 5)])
    append(_rows(spark, 20, 30), path)

    def start(skip):
        reader = spark.readStream.format("icelite")
        if skip:
            reader = reader.option("skip-replace-snapshots", "true")
        return (reader.load(path).writeStream.format("parquet")
                .option("path", str(tmp_path / f"out{skip}"))
                .option("checkpointLocation", str(tmp_path / f"ck{skip}"))
                .trigger(availableNow=True).start())

    q = start(skip=False)
    with pytest.raises(Exception) as ei:
        q.awaitTermination(300)
    assert "append-only" in str(ei.value) or isinstance(
        ei.value, PySparkException)

    q2 = start(skip=True)
    q2.awaitTermination(300)
    # appended rows only; the positional delete is not re-emitted
    assert spark.read.parquet(str(tmp_path / "outTrue")).count() == 30


def test_delta_cdc_sink_parity_replay_and_compaction(spark, tmp_path):
    """mode='delta': O(batch) appends per trigger, read-time
    latest-wins resolution, replay exactly-once, and compaction that
    carries the replay stamps forward."""
    import time

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampType

    from bigdata_event_stream_detection_spark.operators.cdc import (
        latest_snapshot,
    )
    from bigdata_event_stream_detection_spark.streaming.icelite_sink import (
        _stream_id,
        compact_cdc_delta,
        last_committed_batch,
        read_cdc_snapshot,
        start_apply_changes_icelite,
    )

    changelog_schema = StructType([
        StructField("user_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
        StructField("op", StringType()),
        StructField("event_type", StringType()),
        StructField("value", StringType()),
    ])
    arrow_schema = pa.schema([
        ("user_id", pa.string()), ("ts", pa.timestamp("us")),
        ("event_id", pa.int64()), ("op", pa.string()),
        ("event_type", pa.string()), ("value", pa.string()),
    ])
    rng = np.random.default_rng(21)
    n = 300
    pdf = pd.DataFrame({
        "user_id": [f"u{int(k)}" for k in rng.integers(0, 25, n)],
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "op": rng.choice(["I", "U", "U", "D"], n),
        "event_type": rng.choice(["a", "b"], n),
        "value": [f"v{int(x)}" for x in rng.integers(0, 1000, n)],
    })
    d = str(tmp_path / "cl")
    os.makedirs(d)
    t0 = time.time()
    for i, (name, sl) in enumerate(
            [("c1.parquet", slice(0, 150)), ("c2.parquet", slice(150, n))]):
        f = os.path.join(d, name)
        pq.write_table(pa.Table.from_pandas(
            pdf.iloc[sl], schema=arrow_schema, preserve_index=False), f)
        os.utime(f, (t0 + i, t0 + i))
    tbl = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (spark.readStream.schema(changelog_schema)
                  .option("maxFilesPerTrigger", "1").parquet(d))
        q = start_apply_changes_icelite(
            stream, tbl, ckpt, available_now=True, mode="delta")
        q.awaitTermination(300)

    run()
    assert table_properties(tbl)["cdc.mode"] == "delta"
    ops = [s["operation"] for s in snapshots(tbl)]
    assert ops == ["create", "append", "append"]  # O(batch): no merges

    def batch_expected(frame):
        return (latest_snapshot(
            spark.createDataFrame(frame, changelog_schema),
            attrs=["event_type", "value"])
            .select("user_id", "event_type", "value", "last_ts", "last_id")
            .orderBy("user_id").toPandas().reset_index(drop=True))

    def got():
        return (read_cdc_snapshot(spark, tbl)
                .select("user_id", "event_type", "value",
                        "last_ts", "last_id")
                .orderBy("user_id").toPandas().reset_index(drop=True))

    pd.testing.assert_frame_equal(got(), batch_expected(pdf))

    # restart on the same checkpoint: pure no-op
    n_snaps = len(snapshots(tbl))
    run()
    assert len(snapshots(tbl)) == n_snaps

    # compaction folds to one row per key, carries the replay stamps,
    # and the view is unchanged
    sid = _stream_id(ckpt)
    assert last_committed_batch(tbl, sid) == 1
    compact_cdc_delta(spark, tbl)
    pd.testing.assert_frame_equal(got(), batch_expected(pdf))
    expire_snapshots(tbl, keep_last=1)
    assert last_committed_batch(tbl, sid) == 1  # stamp survived expiry

    # replays hit the wall even after compaction+expiry; new data flows
    n_after_expire = len(snapshots(tbl))
    run()
    assert len(snapshots(tbl)) == n_after_expire
    more = pdf.iloc[:40].copy()
    more["event_id"] += 10_000
    more["ts"] += pd.to_timedelta(20_000, "s")
    more["value"] = "NEW"
    f = os.path.join(d, "c3.parquet")
    pq.write_table(pa.Table.from_pandas(
        more, schema=arrow_schema, preserve_index=False), f)
    os.utime(f, (t0 + 2, t0 + 2))
    run()
    full = pd.concat([pdf, more], ignore_index=True)
    pd.testing.assert_frame_equal(got(), batch_expected(full))
