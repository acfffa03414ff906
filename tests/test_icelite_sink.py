"""Exactly-once streaming sinks into icelite tables.

The invariants mirror tests/test_cdc.py's bucket-store suite plus the
table format's own: a replayed micro-batch must leave BOTH the table
content AND the snapshot count unchanged (the batch-id stamp in the
snapshot summary is the idempotence token), and the CDC merge must
converge to batch ``latest_snapshot`` regardless of trigger order
(precedence = (last_ts, last_id)).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from bigdata_event_stream_detection_spark.operators.cdc import (
    latest_snapshot,
)
from bigdata_event_stream_detection_spark.sources.icelite import (
    append,
    create_table,
    merge_into,
    read_table,
    snapshots,
)
from bigdata_event_stream_detection_spark.streaming.icelite_sink import (
    _stream_id,
    last_committed_batch,
    read_cdc_snapshot,
    start_append_sink,
    start_apply_changes_icelite,
)

CHANGELOG_SCHEMA = StructType([
    StructField("user_id", StringType()),
    StructField("ts", TimestampType()),
    StructField("event_id", LongType()),
    StructField("op", StringType()),
    StructField("event_type", StringType()),
    StructField("value", StringType()),
])

ARROW_SCHEMA = pa.schema([
    ("user_id", pa.string()),
    ("ts", pa.timestamp("us")),
    ("event_id", pa.int64()),
    ("op", pa.string()),
    ("event_type", pa.string()),
    ("value", pa.string()),
])


def _changelog(seed: int, n: int = 300, keys: int = 25) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "user_id": [f"u{int(k)}" for k in rng.integers(0, keys, n)],
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "op": rng.choice(["I", "U", "U", "U", "D"], n),
        "event_type": rng.choice(["a", "b", "c"], n),
        # string values: exact equality, no float-sum concerns
        "value": [f"v{int(x)}" for x in rng.integers(0, 1000, n)],
    })


def _write_chunk(pdf, d, name, mtime):
    f = os.path.join(d, name)
    pq.write_table(pa.Table.from_pandas(pdf, schema=ARROW_SCHEMA,
                                        preserve_index=False), f)
    os.utime(f, (mtime, mtime))


def test_append_sink_exactly_once(spark, tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    pdf = _changelog(3)
    t0 = time.time()
    _write_chunk(pdf.iloc[:150], d, "c1.parquet", t0)
    _write_chunk(pdf.iloc[150:], d, "c2.parquet", t0 + 1)
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (spark.readStream.schema(CHANGELOG_SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(d))
        q = start_append_sink(stream, tbl, ckpt, available_now=True)
        q.awaitTermination(300)

    run()
    assert read_table(spark, tbl).count() == 300
    n_snaps = len(snapshots(tbl))
    assert n_snaps == 3  # create + 2 micro-batch appends

    # restart, no new data: content AND history unchanged
    run()
    assert read_table(spark, tbl).count() == 300
    assert len(snapshots(tbl)) == n_snaps

    # simulate a genuine replay: the table commit landed but the
    # checkpoint's commit log did not -> Spark re-runs the last batch
    # under the SAME persisted query id; the stamp makes it a no-op.
    # (A checkpoint COPY sidesteps Spark's same-path commit-log cache;
    # the query id travels inside it, so the replay key is unchanged.)
    import shutil

    ckpt2 = str(tmp_path / "ckpt-replay")
    shutil.copytree(ckpt, ckpt2)
    os.unlink(os.path.join(ckpt2, "commits", "1"))
    crc = os.path.join(ckpt2, "commits", ".1.crc")
    if os.path.exists(crc):  # stale checksum blocks the re-write
        os.unlink(crc)
    assert _stream_id(ckpt2) == _stream_id(ckpt)

    stream = (spark.readStream.schema(CHANGELOG_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(d))
    q = start_append_sink(stream, tbl, ckpt2, available_now=True)
    q.awaitTermination(300)
    assert read_table(spark, tbl).count() == 300
    assert len(snapshots(tbl)) == n_snaps
    assert last_committed_batch(tbl, _stream_id(ckpt)) == 1

    # new data still flows after the replay wall
    more = _changelog(4, n=60)
    more["event_id"] += 1_000
    _write_chunk(more, d, "c3.parquet", t0 + 2)
    run()
    assert read_table(spark, tbl).count() == 360


def test_fresh_checkpoint_is_a_fresh_stream_not_a_silent_drop(spark,
                                                              tmp_path):
    """A checkpoint deleted and recreated at the same PATH must get a
    fresh replay key (the query id Spark persists inside the
    checkpoint), so the new stream's batch 0 is INGESTED — keying the
    stamps on the path hash alone made the old stream's max batch id a
    wall that silently dropped everything the new stream read."""
    import shutil

    d = str(tmp_path / "in")
    os.makedirs(d)
    _write_chunk(_changelog(7, n=100), d, "c1.parquet", time.time())
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (spark.readStream.schema(CHANGELOG_SCHEMA).parquet(d))
        q = start_append_sink(stream, tbl, ckpt, available_now=True)
        q.awaitTermination(300)

    run()
    assert read_table(spark, tbl).count() == 100
    sid1 = _stream_id(ckpt)

    shutil.rmtree(ckpt)  # fresh checkpoint at the SAME path
    run()
    sid2 = _stream_id(ckpt)
    assert sid2 != sid1  # new persisted query id -> new replay key
    # the fresh stream re-reads the input; rows land (duplicates are
    # the honest outcome of discarding a checkpoint — never data loss)
    assert read_table(spark, tbl).count() == 200
    assert last_committed_batch(tbl, sid1) == 0
    assert last_committed_batch(tbl, sid2) == 0


def test_apply_changes_icelite_matches_batch(spark, tmp_path):
    pdf = _changelog(5)
    d = str(tmp_path / "cl")
    os.makedirs(d)
    t0 = time.time()
    _write_chunk(pdf.iloc[:150], d, "c1.parquet", t0)
    _write_chunk(pdf.iloc[150:], d, "c2.parquet", t0 + 1)
    tbl = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (spark.readStream.schema(CHANGELOG_SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(d))
        q = start_apply_changes_icelite(
            stream, tbl, ckpt, available_now=True)
        q.awaitTermination(300)

    def batch_expected(frame):
        return (latest_snapshot(
            spark.createDataFrame(frame, CHANGELOG_SCHEMA),
            attrs=["event_type", "value"])
            .select("user_id", "event_type", "value",
                    "last_ts", "last_id")
            .orderBy("user_id").toPandas().reset_index(drop=True))

    run()
    got = (read_cdc_snapshot(spark, tbl)
           .select("user_id", "event_type", "value",
                   "last_ts", "last_id")
           .orderBy("user_id").toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(got, batch_expected(pdf))
    n_snaps = len(snapshots(tbl))

    # restart on the same checkpoint: pure no-op (content + history)
    run()
    assert len(snapshots(tbl)) == n_snaps

    # incremental third chunk converges to the full-batch answer
    more = _changelog(6, n=80)
    more["event_id"] += 1_000
    _write_chunk(more, d, "c3.parquet", t0 + 2)
    run()
    full = pd.concat([pdf, more], ignore_index=True)
    got3 = (read_cdc_snapshot(spark, tbl)
            .select("user_id", "event_type", "value",
                    "last_ts", "last_id")
            .orderBy("user_id").toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(got3, batch_expected(full))

    # time travel: the store AS OF the pre-third-chunk snapshot still
    # equals the two-chunk batch answer (CDC audit trail)
    old = (read_cdc_snapshot(spark, tbl, version=n_snaps)
           .select("user_id", "event_type", "value",
                   "last_ts", "last_id")
           .orderBy("user_id").toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(old, batch_expected(pdf))


def test_apply_changes_icelite_tombstone_beats_late_update(spark,
                                                           tmp_path):
    d = str(tmp_path / "cl2")
    os.makedirs(d)
    t0 = time.time()
    ts = pd.to_datetime("2024-01-01")

    def row(uid, sec, eid, op, et="a", v="v1"):
        return {"user_id": uid, "ts": ts + pd.to_timedelta(sec, "s"),
                "event_id": eid, "op": op, "event_type": et, "value": v}

    # chunk 1: insert at t=100, delete at t=200
    _write_chunk(pd.DataFrame([row("u1", 100, 1, "I"),
                               row("u1", 200, 2, "D")]),
                 d, "c1.parquet", t0)
    # chunk 2 arrives later but carries an OLDER update (t=150): the
    # tombstone row must keep winning the precedence merge
    _write_chunk(pd.DataFrame([row("u1", 150, 3, "U", v="LATE")]),
                 d, "c2.parquet", t0 + 1)
    tbl = str(tmp_path / "store2")

    stream = (spark.readStream.schema(CHANGELOG_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(d))
    q = start_apply_changes_icelite(
        stream, tbl, str(tmp_path / "ck2"), available_now=True)
    q.awaitTermination(300)

    assert read_cdc_snapshot(spark, tbl).count() == 0
    dead = read_table(spark, tbl)  # tombstone retained as a data row
    assert dead.count() == 1
    assert dead.first()["op"] == "D"


def test_apply_changes_bucketed_table_touches_only_batch_buckets(
        spark, tmp_path):
    """APPLY CHANGES into a bucket-partitioned store: trigger 2 only
    rewrites files in the buckets its keys hash to — every other file
    survives byte-identical (the uniform-key planning lever: stats
    ranges all overlap, bucket membership is exact)."""
    from bigdata_event_stream_detection_spark.sources.icelite import (
        _transform_value,
        table_files,
        table_partition_spec,
        table_schema,
    )

    d = str(tmp_path / "clb")
    os.makedirs(d)
    t0 = time.time()
    pdf = _changelog(11, n=200, keys=40)
    # chunk 2 touches exactly two keys
    late = _changelog(12, n=20, keys=40)
    late["user_id"] = np.where(np.arange(20) % 2 == 0, "u3", "u17")
    late["event_id"] += 10_000
    late["ts"] += pd.to_timedelta(20_000, "s")  # strictly newer
    _write_chunk(pdf, d, "c1.parquet", t0)
    _write_chunk(late, d, "c2.parquet", t0 + 1)
    tbl = str(tmp_path / "storeb")

    stream = (spark.readStream.schema(CHANGELOG_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(d))
    q = start_apply_changes_icelite(
        stream, tbl, str(tmp_path / "ckb"), available_now=True,
        partition_spec=[("user_id", "bucket", 8)])
    q.awaitTermination(300)

    spec = table_partition_spec(tbl)
    assert spec and spec[0]["name"] == "user_id_bucket8"
    schema = table_schema(tbl)
    touched = {_transform_value(spec[0], k, schema) for k in ("u3", "u17")}

    # trigger-1 files outside the touched buckets survived trigger 2
    # byte-identical (same path still referenced, same size+mtime)
    hist = snapshots(tbl)
    merge_snaps = [s["snapshot_id"] for s in hist
                   if s["operation"] == "merge"]
    assert len(merge_snaps) == 2
    t1_files = {e["path"]: e for e in table_files(tbl,
                                                  version=merge_snaps[0])}
    t2_files = {e["path"] for e in table_files(tbl)}
    untouched = [p for p, e in t1_files.items()
                 if e["partition"]["user_id_bucket8"] not in touched]
    assert untouched and all(p in t2_files for p in untouched)

    # and the content equals the batch recomputation
    full = pd.concat([pdf, late], ignore_index=True)
    want = (latest_snapshot(
        spark.createDataFrame(full, CHANGELOG_SCHEMA),
        attrs=["event_type", "value"])
        .select("user_id", "event_type", "value", "last_ts", "last_id")
        .orderBy("user_id").toPandas().reset_index(drop=True))
    got = (read_cdc_snapshot(spark, tbl)
           .select("user_id", "event_type", "value", "last_ts", "last_id")
           .orderBy("user_id").toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_merge_precedence_older_source_loses(spark, tmp_path):
    # unit-level: precedence merge keeps the newer TARGET row
    tbl = str(tmp_path / "t")
    schema = StructType([
        StructField("k", LongType()),
        StructField("v", StringType()),
        StructField("last_ts", LongType()),
        StructField("last_id", LongType()),
    ])
    create_table(tbl, schema)
    rows = spark.createDataFrame(
        [(1, "new", 200, 2), (2, "keep", 50, 1)], schema)
    append(rows, tbl)
    src = spark.createDataFrame(
        [(1, "old", 100, 3),     # older ts: loses to stored (1,"new")
         (2, "fresh", 60, 2),    # newer ts: wins
         (3, "ins", 10, 4)],     # unmatched: inserts
        schema)
    merge_into(spark, tbl, src, key="k", precedence=("last_ts", "last_id"))
    got = {r["k"]: r["v"] for r in read_table(spark, tbl).collect()}
    assert got == {1: "new", 2: "fresh", 3: "ins"}


def test_merge_precedence_tie_goes_to_source(spark, tmp_path):
    tbl = str(tmp_path / "t2")
    schema = StructType([
        StructField("k", LongType()),
        StructField("v", StringType()),
        StructField("last_ts", LongType()),
    ])
    create_table(tbl, schema)
    append(spark.createDataFrame([(1, "target", 100)], schema), tbl)
    merge_into(spark, tbl,
               spark.createDataFrame([(1, "source", 100)], schema),
               key="k", precedence=("last_ts",))
    assert read_table(spark, tbl).first()["v"] == "source"
