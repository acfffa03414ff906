"""CDC changelog application: latest-wins snapshot, SCD2 history, and
the streaming APPLY CHANGES bucket store.

Batch operators are checked against an independent pandas recompute on
seeded random changelogs; the streaming store must byte-match the
batch `latest_snapshot` of the full changelog and be idempotent under
restart (same checkpoint, no new files => store unchanged).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.operators.cdc import (
    events_as_changelog,
    latest_snapshot,
    scd2_history,
)
from bigdata_event_stream_detection_spark.streaming.cdc import (
    read_snapshot,
    start_apply_changes_sink,
)

CHANGELOG_SCHEMA = (
    "user_id string, ts timestamp, event_id long, op string,"
    " event_type string, value double"
)


def _random_changelog(seed: int, n: int = 400, keys: int = 40):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "user_id": [f"u{int(k)}" for k in rng.integers(0, keys, n)],
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "op": rng.choice(["I", "U", "U", "U", "D"], n),
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": np.round(rng.uniform(0, 100, n), 2),
    })


def _pandas_latest(pdf: pd.DataFrame) -> pd.DataFrame:
    s = pdf.sort_values(["user_id", "ts", "event_id"])
    last = s.groupby("user_id", as_index=False).tail(1)
    return last[last["op"] != "D"].reset_index(drop=True)


def test_latest_snapshot_matches_bruteforce(spark):
    pdf = _random_changelog(7)
    df = spark.createDataFrame(pdf, CHANGELOG_SCHEMA)
    got = (latest_snapshot(df).orderBy("user_id")
           .toPandas().reset_index(drop=True))
    exp = _pandas_latest(pdf).sort_values("user_id").reset_index(drop=True)
    assert list(got["user_id"]) == list(exp["user_id"])
    assert list(got["last_id"]) == list(exp["event_id"])
    assert list(got["event_type"]) == list(exp["event_type"])
    assert np.allclose(got["value"], exp["value"])


def test_latest_snapshot_excludes_deleted_keys(spark):
    pdf = pd.DataFrame({
        "user_id": ["k1", "k1", "k2"],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-01"]),
        "event_id": [0, 1, 2],
        "op": ["I", "D", "I"],
        "event_type": ["a", "a", "b"],
        "value": [1.0, 2.0, 3.0],
    })
    got = latest_snapshot(
        spark.createDataFrame(pdf, CHANGELOG_SCHEMA)).toPandas()
    assert set(got["user_id"]) == {"k2"}


def test_latest_snapshot_plan_partial_agg_single_exchange(spark):
    import io
    from contextlib import redirect_stdout

    df = spark.createDataFrame(_random_changelog(3), CHANGELOG_SCHEMA)
    buf = io.StringIO()
    with redirect_stdout(buf):
        latest_snapshot(df).explain("formatted")
    plan = buf.getvalue()
    # map-side partial max_by reduces each partition to its distinct
    # keys BEFORE the one key exchange; no window/row_number fallback
    import re

    assert "partial_max_by" in plan
    # formatted explain mentions each node twice (tree + detail block):
    # count detail blocks only
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Window" not in plan


def test_scd2_intervals_fixture(spark):
    pdf = pd.DataFrame({
        "user_id": ["k"] * 4,
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02",
                              "2024-01-03", "2024-01-04"]),
        "event_id": [0, 1, 2, 3],
        "op": ["I", "U", "D", "I"],       # insert, update, delete, re-insert
        "event_type": ["a", "b", "b", "c"],
        "value": [1.0, 2.0, 0.0, 4.0],
    })
    got = (scd2_history(spark.createDataFrame(pdf, CHANGELOG_SCHEMA))
           .orderBy("version").toPandas())
    # delete emits no row but closes v2 and leaves a version gap
    assert list(got["version"]) == [1, 2, 4]
    assert got.loc[0, "valid_to"] == pd.Timestamp("2024-01-02")
    assert got.loc[1, "valid_to"] == pd.Timestamp("2024-01-03")
    assert pd.isna(got.loc[2, "valid_to"])
    assert list(got["is_current"]) == [False, False, True]
    assert got.loc[2, "event_type"] == "c"


def test_scd2_properties_random(spark):
    pdf = _random_changelog(11, n=600, keys=30)
    got = scd2_history(
        spark.createDataFrame(pdf, CHANGELOG_SCHEMA)).toPandas()
    for _, g in got.groupby("user_id"):
        g = g.sort_values("version")
        # at most one open (current) version per key, and only the last
        open_rows = g["valid_to"].isna()
        assert open_rows.sum() <= 1
        if open_rows.any():
            assert open_rows.iloc[-1]
        closed = g.dropna(subset=["valid_to"])
        assert (closed["valid_from"] <= closed["valid_to"]).all()
        # intervals are chained: each valid_to >= the next valid_from
        # is impossible (next change starts at or after this close)
        nxt = g["valid_from"].shift(-1).dropna()
        assert (g["valid_to"].iloc[:-1].fillna(pd.Timestamp.max)
                >= g["valid_from"].iloc[:-1]).all()
        assert (nxt.values >= g["valid_from"].iloc[:-1].values).all()
    # every non-delete change appears exactly once
    assert len(got) == int((pdf["op"] != "D").sum())


def test_scd2_matches_latest_snapshot_current_rows(spark):
    pdf = _random_changelog(23)
    df = spark.createDataFrame(pdf, CHANGELOG_SCHEMA)
    snap = latest_snapshot(df).select("user_id", "last_id").toPandas()
    cur = (scd2_history(df).filter("is_current")
           .select("user_id", "change_id").toPandas())
    assert (dict(zip(snap["user_id"], snap["last_id"]))
            == dict(zip(cur["user_id"], cur["change_id"])))


def test_events_as_changelog_query_shapes(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cl = events_as_changelog(ev)
    snap = latest_snapshot(cl, attrs=["event_type", "value"])
    # deleted (error-last) users absent; everyone else exactly once
    assert snap.count() == snap.select("user_id").distinct().count()
    last = (cl.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("user_id")
            .orderBy(F.desc("ts"), F.desc("event_id"))))
        .filter("rn = 1"))
    live = last.filter("op <> 'D'").count()
    assert snap.count() == live


ARROW_SCHEMA = pa.schema([
    ("user_id", pa.string()),
    ("ts", pa.timestamp("us")),
    ("event_id", pa.int64()),
    ("op", pa.string()),
    ("event_type", pa.string()),
    ("value", pa.float64()),
])


def _write_chunk(pdf, d, name, mtime):
    f = os.path.join(d, name)
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=ARROW_SCHEMA,
                             preserve_index=False), f)
    os.utime(f, (mtime, mtime))


def test_apply_changes_stream_matches_batch(spark, tmp_path):
    pdf = _random_changelog(5, n=300, keys=25)
    d = str(tmp_path / "cl")
    os.makedirs(d)
    t0 = time.time()
    _write_chunk(pdf.iloc[:150], d, "c1.parquet", t0)
    _write_chunk(pdf.iloc[150:], d, "c2.parquet", t0 + 1)
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (spark.readStream.schema(CHANGELOG_SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(d))
        q = start_apply_changes_sink(
            stream, store, ckpt, n_buckets=4, available_now=True)
        q.awaitTermination(300)

    run()
    got = (read_snapshot(spark, store)
           .orderBy("user_id").toPandas().reset_index(drop=True))
    exp = (latest_snapshot(
        spark.createDataFrame(pdf, CHANGELOG_SCHEMA),
        attrs=["event_type", "value"])
        .select(*got.columns)
        .orderBy("user_id").toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)

    # restart on the same checkpoint with no new data: store unchanged
    run()
    again = (read_snapshot(spark, store)
             .orderBy("user_id").toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(again, exp)

    # late third chunk updates incrementally and still matches batch
    more = _random_changelog(6, n=80, keys=25)
    more["event_id"] += 1_000
    _write_chunk(more, d, "c3.parquet", t0 + 2)
    run()
    full = pd.concat([pdf, more], ignore_index=True)
    got3 = (read_snapshot(spark, store)
            .orderBy("user_id").toPandas().reset_index(drop=True))
    exp3 = (latest_snapshot(
        spark.createDataFrame(full, CHANGELOG_SCHEMA),
        attrs=["event_type", "value"])
        .select(*got3.columns)
        .orderBy("user_id").toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(got3, exp3)


def test_apply_changes_tombstone_beats_late_update(spark, tmp_path):
    d = str(tmp_path / "cl2")
    os.makedirs(d)
    t0 = time.time()
    # batch 1 carries the DELETE (event-time 10:00)
    _write_chunk(pd.DataFrame({
        "user_id": ["k1"], "ts": pd.to_datetime(["2024-01-01 10:00"]),
        "event_id": [5], "op": ["D"], "event_type": ["a"],
        "value": [0.0]}), d, "c1.parquet", t0)
    # batch 2 delivers an OLDER update late (event-time 09:00)
    _write_chunk(pd.DataFrame({
        "user_id": ["k1"], "ts": pd.to_datetime(["2024-01-01 09:00"]),
        "event_id": [3], "op": ["U"], "event_type": ["a"],
        "value": [1.0]}), d, "c2.parquet", t0 + 1)
    store = str(tmp_path / "store2")
    stream = (spark.readStream.schema(CHANGELOG_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(d))
    q = start_apply_changes_sink(
        stream, store, str(tmp_path / "ckpt2"), n_buckets=2,
        available_now=True)
    q.awaitTermination(300)
    # the kept tombstone wins: the key stays deleted
    assert read_snapshot(spark, store).count() == 0


def test_apply_changes_rewrites_only_touched_buckets(spark, tmp_path):
    """The merge loop's scale claim, asserted physically: a micro-batch
    whose keys hash into ONE bucket leaves every other bucket's files
    byte-identical on disk (same path, size, mtime) — per-trigger work
    is proportional to touched buckets, not store size."""
    from pyspark.sql import functions as F

    n_buckets = 8
    # find two keys in DIFFERENT buckets of the same hash space the
    # sink uses (pmod(xxhash64(key), n_buckets))
    probe = spark.createDataFrame(
        [(f"k{i}",) for i in range(40)], "user_id string").select(
        "user_id",
        F.pmod(F.xxhash64("user_id"), F.lit(n_buckets))
        .cast("int").alias("b")).collect()
    by_bucket = {}
    for r in probe:
        by_bucket.setdefault(r["b"], []).append(r["user_id"])
    (b1, keys1), (b2, keys2) = sorted(by_bucket.items())[:2]

    d = str(tmp_path / "cl"); os.makedirs(d)
    t0 = time.time()

    def chunk(keys, ids_from, ts):
        return pd.DataFrame({
            "user_id": keys,
            "ts": pd.to_datetime([ts] * len(keys)),
            "event_id": np.arange(ids_from, ids_from + len(keys),
                                  dtype=np.int64),
            "op": ["U"] * len(keys),
            "event_type": ["a"] * len(keys),
            "value": [1.0] * len(keys)})

    # batch 1 populates both buckets; batch 2 touches ONLY bucket b2
    _write_chunk(chunk(keys1 + keys2, 0, "2024-01-01 10:00"),
                 d, "c1.parquet", t0)
    _write_chunk(chunk(keys2, 100, "2024-01-01 11:00"),
                 d, "c2.parquet", t0 + 1)
    store = str(tmp_path / "store")
    stream = (spark.readStream.schema(CHANGELOG_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(d))
    q = start_apply_changes_sink(
        stream, store, str(tmp_path / "ckpt"), n_buckets=n_buckets,
        available_now=True)
    q.awaitTermination(300)

    def bucket_files(b):
        dd = os.path.join(store, f"bucket={b}")
        return {f: (os.path.getmtime(os.path.join(dd, f)),
                    os.path.getsize(os.path.join(dd, f)))
                for f in os.listdir(dd) if f.endswith(".parquet")}

    files_b1 = bucket_files(b1)
    files_b2 = bucket_files(b2)
    assert files_b1 and files_b2

    # batch 3: update bucket b2 keys again via a restart
    _write_chunk(chunk(keys2, 200, "2024-01-01 12:00"),
                 d, "c3.parquet", t0 + 2)
    q = start_apply_changes_sink(
        (spark.readStream.schema(CHANGELOG_SCHEMA)
         .option("maxFilesPerTrigger", "1").parquet(d)),
        store, str(tmp_path / "ckpt"), n_buckets=n_buckets,
        available_now=True)
    q.awaitTermination(300)

    assert bucket_files(b1) == files_b1      # untouched bucket intact
    assert bucket_files(b2) != files_b2      # touched bucket rewritten
    # and the data is right: b2 keys carry the batch-3 ids
    snap = read_snapshot(spark, store).toPandas()
    got = dict(zip(snap["user_id"], snap["last_id"]))
    assert all(got[k] >= 200 for k in keys2)
    assert all(got[k] < 100 for k in keys1)


def test_apply_changes_delta_mode_matches_batch(spark, tmp_path):
    """Delta (merge-on-read) mode: snapshot equals batch latest_snapshot
    with compaction firing mid-stream, restart is a no-op, and a late
    chunk applies incrementally."""
    import pytest

    pdf = _random_changelog(15, n=300, keys=25)
    d = str(tmp_path / "cl")
    os.makedirs(d)
    t0 = time.time()
    for i, lo in enumerate(range(0, 300, 60)):
        _write_chunk(pdf.iloc[lo:lo + 60], d, f"c{i}.parquet", t0 + i)
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (spark.readStream.schema(CHANGELOG_SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(d))
        q = start_apply_changes_sink(
            stream, store, ckpt, n_buckets=4, available_now=True,
            mode="delta", compact_every=2)
        q.awaitTermination(300)

    run()
    # compaction ran: a base exists, and outstanding deltas < compact_every
    assert os.path.isdir(os.path.join(store, "base"))
    got = (read_snapshot(spark, store)
           .orderBy("user_id").toPandas().reset_index(drop=True))
    exp = (latest_snapshot(
        spark.createDataFrame(pdf, CHANGELOG_SCHEMA),
        attrs=["event_type", "value"])
        .select(*got.columns)
        .orderBy("user_id").toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)

    # restart, no new data: unchanged
    run()
    again = (read_snapshot(spark, store)
             .orderBy("user_id").toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(again, exp)

    # late chunk applies incrementally
    more = _random_changelog(16, n=80, keys=25)
    more["event_id"] += 1_000
    _write_chunk(more, d, "late.parquet", t0 + 99)
    run()
    full = pd.concat([pdf, more], ignore_index=True)
    got3 = (read_snapshot(spark, store)
            .orderBy("user_id").toPandas().reset_index(drop=True))
    exp3 = (latest_snapshot(
        spark.createDataFrame(full, CHANGELOG_SCHEMA),
        attrs=["event_type", "value"])
        .select(*got3.columns)
        .orderBy("user_id").toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(got3, exp3)

    # resuming with a different bucket count or mode must refuse
    stream = (spark.readStream.schema(CHANGELOG_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(d))
    with pytest.raises(ValueError, match="n_buckets"):
        start_apply_changes_sink(stream, store, ckpt, n_buckets=8,
                                 mode="delta", available_now=True)
    with pytest.raises(ValueError, match="n_buckets"):
        start_apply_changes_sink(stream, store, ckpt, n_buckets=4,
                                 mode="merge", available_now=True)


def test_delta_trigger_writes_batch_sized_not_store_sized(spark, tmp_path):
    """The uniform-key worst case, asserted physically: with every
    trigger touching EVERY bucket, a delta-mode trigger leaves the base
    byte-identical on disk and writes only a batch-sized delta — write
    volume follows batch size, not store size (merge mode rewrites all
    touched buckets, i.e. the whole store, each trigger)."""
    keys = [f"u{i}" for i in range(200)]   # 200 keys over 4 buckets
    d = str(tmp_path / "cl")
    os.makedirs(d)
    t0 = time.time()

    def chunk(ids_from, n, ts):
        ks = keys if n >= len(keys) else keys[:n]
        return pd.DataFrame({
            "user_id": ks,
            "ts": pd.to_datetime([ts] * len(ks)),
            "event_id": np.arange(ids_from, ids_from + len(ks),
                                  dtype=np.int64),
            "op": ["U"] * len(ks),
            "event_type": ["a"] * len(ks),
            "value": [1.0] * len(ks)})

    # two big chunks populate the store and trigger compaction (base)
    _write_chunk(chunk(0, 200, "2024-01-01 10:00"), d, "c1.parquet", t0)
    _write_chunk(chunk(200, 200, "2024-01-01 11:00"), d, "c2.parquet",
                 t0 + 1)
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (spark.readStream.schema(CHANGELOG_SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(d))
        q = start_apply_changes_sink(
            stream, store, ckpt, n_buckets=4, available_now=True,
            mode="delta", compact_every=2)
        q.awaitTermination(300)

    run()
    base = os.path.join(store, "base")
    assert os.path.isdir(base)

    def tree_files(root):
        out = {}
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    out[p] = (os.path.getmtime(p), os.path.getsize(p))
        return out

    base_before = tree_files(base)
    delta_before = tree_files(os.path.join(store, "delta"))
    assert base_before
    assert not delta_before    # both deltas folded into base

    # a tiny uniform-key trigger (touches all 4 buckets)
    _write_chunk(chunk(400, 8, "2024-01-01 12:00"), d, "c3.parquet",
                 t0 + 2)
    run()
    # base untouched byte-for-byte; only a batch-sized delta appeared
    assert tree_files(base) == base_before
    delta_after = tree_files(os.path.join(store, "delta"))
    assert delta_after
    assert sum(sz for _, sz in delta_after.values()) < \
        sum(sz for _, sz in base_before.values())
    # snapshot reflects the delta rows without compaction
    snap = read_snapshot(spark, store).toPandas()
    got = dict(zip(snap["user_id"], snap["last_id"]))
    for i, k in enumerate(keys[:8]):
        assert got[k] == 400 + i
    for k in keys[8:]:
        assert got[k] < 400
