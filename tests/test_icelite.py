"""icelite table format: ACID commits, time travel, pruning, MERGE,
maintenance, and the snapshot-incremental streaming source.

Each test builds its own table under tmp_path; data is deterministic
(spark.range-derived). The physical asserts mirror the CDC family's:
untouched files must stay byte-identical on disk after MERGE — the
copy-on-write contract, not just a value-level check.
"""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bigdata_event_stream_detection_spark.sources import icelite
from bigdata_event_stream_detection_spark.sources.icelite import (
    CommitConflict,
    add_columns,
    append,
    compact_files,
    create_table,
    current_snapshot_id,
    expire_snapshots,
    merge_into,
    read_table,
    snapshots,
    table_files,
)
from bigdata_event_stream_detection_spark.sources.icelite_source import (
    IceliteDataSource,
)

SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("v", StringType()),
    StructField("src", StringType()),
])


def _rows(spark, lo, hi, src="a"):
    return (spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        F.lit(src).alias("src")))


@pytest.fixture()
def tbl(tmp_path, spark):
    path = str(tmp_path / "t")
    create_table(path, SCHEMA)
    return path


def test_create_append_read_roundtrip(spark, tbl):
    append(_rows(spark, 0, 100), tbl)
    append(_rows(spark, 100, 150, src="b"), tbl)
    df = read_table(spark, tbl)
    assert df.schema == SCHEMA
    assert df.count() == 150
    assert df.agg(F.sum("k")).first()[0] == sum(range(150))
    ops = [s["operation"] for s in snapshots(tbl)]
    assert ops == ["create", "append", "append"]


def test_time_travel_by_version_and_timestamp(spark, tbl):
    import time

    v1 = append(_rows(spark, 0, 10), tbl)
    time.sleep(0.01)
    v2 = append(_rows(spark, 10, 30), tbl)
    assert read_table(spark, tbl, version=v1).count() == 10
    assert read_table(spark, tbl, version=v2).count() == 30
    ts1 = [s for s in snapshots(tbl) if s["snapshot_id"] == v1][0][
        "timestamp_ms"]
    assert read_table(spark, tbl, as_of_ms=ts1).count() == 10


def test_concurrent_appends_both_commit(spark, tbl):
    # two committers race on the same parent: os.link arbitration makes
    # one retry — both batches land, history stays linear
    barrier = threading.Barrier(2)
    errs = []

    def worker(lo, hi):
        try:
            barrier.wait()
            append(_rows(spark, lo, hi), tbl)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(0, 50)),
          threading.Thread(target=worker, args=(50, 80))]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    assert read_table(spark, tbl).count() == 80
    ids = [s["snapshot_id"] for s in snapshots(tbl)]
    assert ids == [1, 2, 3]


def test_commit_conflict_raises(tbl):
    snap = icelite._load_snapshot(tbl, current_snapshot_id(tbl))
    with pytest.raises(CommitConflict):
        icelite._commit_snapshot(tbl, snap)  # id already taken


def test_stats_pruning_skips_files(spark, tbl):
    # one append, range-partitioned: 4 files with disjoint k ranges
    append(_rows(spark, 0, 4000).repartitionByRange(4, "k"), tbl)
    all_files = table_files(tbl)
    assert len(all_files) == 4
    pruned = table_files(tbl, where=[("k", "between", (1000, 1500))])
    assert 1 <= len(pruned) < 4
    df = read_table(spark, tbl, where=[("k", "between", (1000, 1500))])
    assert len(df.inputFiles()) == len(pruned)
    assert df.count() == 501
    # equality + open-range ops
    assert len(table_files(tbl, where=[("k", "=", 3999)])) == 1
    assert len(table_files(tbl, where=[("k", ">", 3999)])) == 0
    assert read_table(spark, tbl, where=[("k", "<", 10)]).count() == 10


def _file_sig(tbl, rel):
    st = os.stat(os.path.join(tbl, rel))
    return (st.st_size, st.st_mtime_ns, st.st_ino)


def test_merge_into_cow_and_untouched_files(spark, tbl):
    append(_rows(spark, 0, 4000).repartitionByRange(4, "k"), tbl)
    before = {e["path"]: _file_sig(tbl, e["path"]) for e in table_files(tbl)}

    # updates confined to k<1000 (one file's range), plus inserts and
    # one delete
    src = (spark.range(0, 500).select(
        F.col("id").alias("k"),
        F.lit("UPDATED").alias("v"),
        F.lit("m").alias("src"),
        F.lit(False).alias("is_delete"))
        .union(spark.range(5000, 5100).select(
            F.col("id"), F.lit("NEW"), F.lit("m"), F.lit(False)))
        .union(spark.range(700, 701).select(
            F.col("id"), F.lit("x"), F.lit("m"), F.lit(True))))
    merge_into(spark, tbl, src, key="k", delete_col="is_delete")

    df = read_table(spark, tbl)
    assert df.count() == 4000 + 100 - 1
    assert df.filter(F.col("v") == "UPDATED").count() == 500
    assert df.filter(F.col("k") == 700).count() == 0
    assert df.filter(F.col("k") >= 5000).count() == 100
    # rows outside the touched range are untouched in VALUE...
    assert df.filter((F.col("k") >= 1000) & (F.col("k") < 4000)
                     & (F.col("v") != F.concat(F.lit("v"), F.col("k")))
                     ).count() == 0
    # ...and their FILES are untouched on disk (copy-on-write): every
    # pre-merge file whose range excludes the source keys is carried by
    # reference, byte-identical
    after_paths = {e["path"] for e in table_files(tbl)}
    carried = set(before) & after_paths
    assert len(carried) >= 2  # at least the middle-range files survive
    for rel in carried:
        assert _file_sig(tbl, rel) == before[rel]
    assert snapshots(tbl)[-1]["operation"] == "merge"
    # time travel still sees the pre-merge table
    assert read_table(spark, tbl, version=2).count() == 4000


def test_concurrent_merges_one_wins_one_conflicts(spark, tbl):
    # replace-type commits must NOT auto-retry over a changed file set:
    # exactly one of two racing merges commits, the other raises
    append(_rows(spark, 0, 1000).repartitionByRange(2, "k"), tbl)
    barrier = threading.Barrier(2)
    results = []

    def worker(tag):
        src = spark.createDataFrame(
            [(5, f"m-{tag}", "m")], SCHEMA)
        try:
            barrier.wait()
            merge_into(spark, tbl, src, key="k")
            results.append(("ok", tag))
        except CommitConflict:
            results.append(("conflict", tag))

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    outcomes = sorted(r[0] for r in results)
    assert outcomes == ["conflict", "ok"]
    # the winner's row is in; the table is consistent
    winner = [tag for ok, tag in results if ok == "ok"][0]
    assert (read_table(spark, tbl).filter(F.col("k") == 5)
            .first()["v"] == f"m-{winner}")
    assert read_table(spark, tbl).count() == 1000


def test_merge_into_empty_table_inserts(spark, tbl):
    merge_into(spark, tbl, _rows(spark, 0, 10), key="k")
    assert read_table(spark, tbl).count() == 10


def test_schema_evolution_add_column(spark, tbl):
    append(_rows(spark, 0, 10), tbl)
    add_columns(tbl, StructType([StructField("score", IntegerType())]))
    new = _rows(spark, 10, 20).withColumn("score", F.lit(7))
    append(new, tbl)
    df = read_table(spark, tbl)
    assert df.count() == 20
    assert df.filter(F.col("score").isNull()).count() == 10
    assert df.filter(F.col("score") == 7).count() == 10
    with pytest.raises(ValueError):
        add_columns(tbl, StructType([StructField("k", LongType())]))


def test_compact_preserves_rows_and_history(spark, tbl):
    for i in range(4):
        append(_rows(spark, i * 10, (i + 1) * 10).coalesce(1), tbl)
    pre_files = len(table_files(tbl))
    pre_version = current_snapshot_id(tbl)
    sid = compact_files(spark, tbl, target_mb=64)
    assert sid is not None
    assert read_table(spark, tbl).count() == 40
    assert len(table_files(tbl)) < pre_files
    assert snapshots(tbl)[-1]["operation"] == "compact"
    # pre-compact version still readable (files carried until expiry)
    assert read_table(spark, tbl, version=pre_version).count() == 40


def test_write_events_icelite_roundtrip(spark, tmp_path):
    from bigdata_event_stream_detection_spark.sources.tables import (
        write_events,
    )

    tblp = str(tmp_path / "ev")
    df = _rows(spark, 0, 40)
    write_events(df, tblp, fmt="icelite")          # creates + appends
    write_events(_rows(spark, 40, 60), tblp, fmt="icelite")
    assert read_table(spark, tblp).count() == 60
    write_events(df, tblp, fmt="icelite", mode="overwrite")
    assert read_table(spark, tblp).count() == 40
    assert snapshots(tblp)[-1]["operation"] == "overwrite"


def test_compact_cluster_by_improves_pruning(spark, tbl):
    # round-robin partitions: every file spans the whole key range, so
    # footer stats cannot prune anything...
    append(_rows(spark, 0, 4000).repartition(4), tbl)
    band = [("k", "between", (100, 200))]
    assert len(table_files(tbl, where=band)) == 4
    # ...until a clustering compaction makes files key-disjoint
    sid = compact_files(spark, tbl, cluster_by=("k",), n_files=4)
    assert sid is not None
    assert len(table_files(tbl)) == 4
    assert len(table_files(tbl, where=band)) < 4
    assert read_table(spark, tbl, where=band).count() == 101
    assert read_table(spark, tbl).count() == 4000


def test_compact_zorder_prunes_both_columns(spark, tmp_path):
    schema = StructType([
        StructField("x", LongType()),
        StructField("y", LongType()),
    ])
    tbl = str(tmp_path / "z")
    create_table(tbl, schema)
    append(spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"))
        .repartition(4), tbl)
    assert len(table_files(tbl, where=[("x", "between", (0, 15))])) == 4
    compact_files(spark, tbl, zorder_by=("x", "y"), n_files=4)
    # Z-curve tiles: a narrow band on EITHER column prunes files
    assert len(table_files(tbl, where=[("x", "between", (0, 15))])) < 4
    assert len(table_files(tbl, where=[("y", "between", (0, 15))])) < 4
    assert read_table(spark, tbl).count() == 4096
    with pytest.raises(ValueError):
        compact_files(spark, tbl, cluster_by=("x",), zorder_by=("y",))


def test_expire_snapshots_reclaims_files(spark, tbl):
    for i in range(3):
        append(_rows(spark, i * 10, (i + 1) * 10).coalesce(1), tbl)
    compact_files(spark, tbl, target_mb=64)
    removed = expire_snapshots(tbl, keep_last=1)
    assert removed["snapshots"] >= 3 and removed["data_files"] >= 2
    assert read_table(spark, tbl).count() == 30
    live = {e["path"] for e in table_files(tbl)}
    on_disk = {f"data/{n}" for n in os.listdir(os.path.join(tbl, "data"))}
    assert on_disk == live  # no orphans
    with pytest.raises(FileNotFoundError):
        read_table(spark, tbl, version=2)


def test_expire_snapshots_age_retention(spark, tbl):
    for i in range(4):
        append(_rows(spark, i * 10, (i + 1) * 10).coalesce(1), tbl)
    # horizon BEFORE every commit: all snapshots are inside the
    # retention window -> nothing expires despite keep_last=1
    t0 = snapshots(tbl)[0]["timestamp_ms"]
    removed = expire_snapshots(tbl, keep_last=1, older_than_ms=t0)
    assert removed == {"snapshots": 0, "manifests": 0, "data_files": 0}
    assert read_table(spark, tbl, version=3).count() == 20
    # horizon AFTER every commit: only keep_last survives
    last = snapshots(tbl)[-1]["timestamp_ms"]
    removed = expire_snapshots(tbl, keep_last=1,
                               older_than_ms=last + 1)
    assert removed["snapshots"] == 4
    assert read_table(spark, tbl).count() == 40


# ---------------------------------------------------------------------------
# Python Data Source: batch + snapshot-incremental streaming


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(IceliteDataSource)
    return True


def test_batch_datasource_matches_read_table(spark, tbl, registered):
    append(_rows(spark, 0, 123), tbl)
    v1 = current_snapshot_id(tbl)
    append(_rows(spark, 123, 200), tbl)
    df = spark.read.format("icelite").load(tbl)
    assert df.count() == 200
    assert df.schema == SCHEMA
    assert (df.agg(F.sum("k")).first()[0]
            == read_table(spark, tbl).agg(F.sum("k")).first()[0])
    old = spark.read.format("icelite").option("version", v1).load(tbl)
    assert old.count() == 123


def test_streaming_incremental_exactly_once(spark, tbl, registered,
                                            tmp_path):
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    append(_rows(spark, 0, 50), tbl)

    def run_once():
        q = (spark.readStream.format("icelite").load(tbl)
             .writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(sink).count() == 50

    append(_rows(spark, 50, 80), tbl)
    append(_rows(spark, 80, 90), tbl)
    run_once()
    out = spark.read.parquet(sink)
    # resume read ONLY the two new snapshots: no duplicates, no misses
    assert out.count() == 90
    assert out.select("k").distinct().count() == 90

    run_once()  # no new snapshots -> no new rows
    assert spark.read.parquet(sink).count() == 90


def test_streaming_sequences_arrow_types(spark, tiny_sequences, tmp_path,
                                         registered):
    # the real payload shape: token array<int> + event_time timestamp
    # must survive the worker-side Arrow cast byte-exactly
    from bigdata_event_stream_detection_spark.sources.tables import (
        read_sequences_stream,
    )

    path = str(tmp_path / "seq")
    create_table(path, tiny_sequences.schema)
    append(tiny_sequences, path)

    sink = str(tmp_path / "seqsink")
    q = (read_sequences_stream(spark, path, fmt="icelite")
         .writeStream.format("parquet")
         .option("path", sink)
         .option("checkpointLocation", str(tmp_path / "seqckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    def digest(df):
        h = F.xxhash64("doc_id", "tokens", "n_tok", "source",
                       "event_time").cast("decimal(38,0)")
        return df.select(F.sum(h).alias("h"),
                         F.count("*").alias("n")).first()

    assert digest(spark.read.parquet(sink)) == digest(tiny_sequences)


def test_row_group_split_partitions(spark, tbl, registered):
    # a big data file must not become one Python task: the manifest
    # records row_groups and readers emit one partition per group
    from bigdata_event_stream_detection_spark.sources.icelite_source import (
        IceliteBatchReader,
        _entry_partitions,
    )

    append(_rows(spark, 0, 50_000).coalesce(1), tbl,
           parquet_block_bytes=64 * 1024)
    entries = table_files(tbl)
    assert len(entries) == 1 and entries[0]["row_groups"] > 1
    parts = _entry_partitions(tbl, entries[0])
    assert len(parts) == entries[0]["row_groups"]
    # the split read returns exactly the table, batch and stream alike
    reader = IceliteBatchReader(
        tbl, read_table(spark, tbl).schema.json(), None, None)
    assert len(reader.partitions()) == entries[0]["row_groups"]
    df = spark.read.format("icelite").load(tbl)
    assert df.count() == 50_000
    assert df.agg(F.sum("k")).first()[0] == sum(range(50_000))


def test_stream_starts_cleanly_after_expiry(spark, tbl, registered,
                                            tmp_path):
    # a fresh stream on a table whose early snapshots were expired must
    # start from the earliest RETAINED snapshot, not crash on snapshot 1
    for i in range(3):
        append(_rows(spark, i * 10, (i + 1) * 10).coalesce(1), tbl)
    expire_snapshots(tbl, keep_last=1)  # snapshots 1-3 gone, 4 kept
    append(_rows(spark, 100, 120), tbl)  # snapshot 5

    q = (spark.readStream.format("icelite").load(tbl)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "s"))
         .option("checkpointLocation", str(tmp_path / "c"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "s"))
    # only snapshots 4..5's ADDED rows are retained history: snapshot 4
    # is the third append (k in [20,30)); 1-3's adds were expired
    assert set(out.select("k").toPandas()["k"]) == (
        set(range(20, 30)) | set(range(100, 120)))


def test_expire_never_touches_uncommitted_files(spark, tbl):
    """A concurrent writer between _write_data_files and its snapshot
    commit owns files no snapshot references yet; expire_snapshots must
    NOT delete them (it deletes only files OWNED by expired snapshots)
    — deleting them would corrupt the table the writer is about to
    commit. Orphan cleanup is a separate, age-gated action."""
    for i in range(3):
        append(_rows(spark, i * 10, (i + 1) * 10).coalesce(1), tbl)
    # simulate the concurrent writer's moved-but-uncommitted data file
    # and its freshly written manifest
    pending_data = os.path.join(tbl, "data", "f-pending.parquet")
    open(pending_data, "wb").write(b"in-flight")
    pending_manifest = icelite._write_manifest(
        tbl, [{"path": "data/f-pending.parquet", "rows": 1,
               "row_groups": 1, "bytes": 9, "stats": {}}])
    stale = os.path.join(tbl, "_staging-deadbeef")
    os.makedirs(stale)
    open(os.path.join(stale, "part-0.parquet"), "wb").write(b"junk")

    removed = expire_snapshots(tbl, keep_last=1)
    assert removed["snapshots"] >= 2
    assert os.path.exists(pending_data)          # never deleted
    assert os.path.exists(
        os.path.join(tbl, "meta", pending_manifest))
    assert os.path.exists(stale)                 # staging untouched too
    assert read_table(spark, tbl).count() == 30


def test_remove_orphan_files_is_age_gated(spark, tbl):
    from bigdata_event_stream_detection_spark.sources.icelite import (
        remove_orphan_files,
    )

    append(_rows(spark, 0, 10), tbl)
    orphan = os.path.join(tbl, "data", "f-orphan.parquet")
    open(orphan, "wb").write(b"junk")
    stale = os.path.join(tbl, "_staging-deadbeef")
    os.makedirs(stale)
    open(os.path.join(stale, "part-0.parquet"), "wb").write(b"junk")

    # young files survive (an in-flight writer's files are always young)
    removed = remove_orphan_files(tbl, older_than_s=3600)
    assert removed == {"manifests": 0, "data_files": 0, "staging_dirs": 0}
    assert os.path.exists(orphan) and os.path.exists(stale)

    # age them past the cutoff -> reclaimed; committed files untouched
    old = (0, 0)
    os.utime(orphan, old)
    os.utime(stale, old)
    removed = remove_orphan_files(tbl, older_than_s=3600)
    assert removed["data_files"] == 1 and removed["staging_dirs"] == 1
    assert not os.path.exists(orphan) and not os.path.exists(stale)
    assert read_table(spark, tbl).count() == 10


def test_merge_into_rejects_null_keys(spark, tbl):
    append(_rows(spark, 0, 10), tbl)
    src = spark.createDataFrame([(None, "x", "m")], SCHEMA)
    with pytest.raises(ValueError, match="null"):
        merge_into(spark, tbl, src, key="k")


def test_timestamp_pruning_and_merge_key(spark, tmp_path):
    """Timestamp stats are stored as epoch MICROS; file pruning, the
    row filter, and merge planning must all compare in that encoding
    (a raw comparison casts seconds-based and silently disagrees)."""
    import datetime

    from pyspark.sql.types import TimestampType

    schema = StructType([
        StructField("ts", TimestampType()),
        StructField("v", StringType()),
    ])
    tbl = str(tmp_path / "ts")
    create_table(tbl, schema)
    base = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    df = spark.range(0, 400).select(
        F.timestamp_seconds(
            F.lit(int(base.timestamp())) + F.col("id") * 60).alias("ts"),
        F.concat(F.lit("v"), F.col("id")).alias("v"))
    append(df.repartitionByRange(4, "ts"), tbl)

    lo = base + datetime.timedelta(minutes=100)
    hi = base + datetime.timedelta(minutes=150)
    pruned = table_files(tbl, where=[("ts", "between", (lo, hi))])
    assert 1 <= len(pruned) < 4
    got = read_table(spark, tbl, where=[("ts", "between", (lo, hi))])
    assert got.count() == 51  # inclusive bounds, minute granularity

    # merge on the timestamp key: only the file covering the source
    # range is rewritten, and the update actually lands
    src = spark.createDataFrame(
        [(lo, "UPDATED")], schema)
    before = {e["path"] for e in table_files(tbl)}
    merge_into(spark, tbl, src, key="ts")
    after = {e["path"] for e in table_files(tbl)}
    assert len(before & after) == 3  # 3 of 4 files carried by reference
    out = read_table(spark, tbl)
    assert out.filter(F.col("v") == "UPDATED").count() == 1
    assert out.count() == 400


def test_rewrite_manifests_bounds_planning(spark, tbl):
    """A sink that commits per trigger leaves one manifest per commit;
    rewrite_manifests coalesces them metadata-only (same data files)
    and keeps planning O(files), not O(commit history)."""
    import time as _time

    from bigdata_event_stream_detection_spark.sources.icelite import (
        rewrite_manifests,
    )

    append(_rows(spark, 0, 20).coalesce(1), tbl)
    entry = table_files(tbl)[0]
    # hand-commit many tiny snapshots (pure metadata; no Spark writes)
    for i in range(2000):
        parent = icelite._load_snapshot(tbl, current_snapshot_id(tbl))
        m = icelite._write_manifest(tbl, [entry])
        icelite._commit_snapshot(tbl, {
            "snapshot_id": parent["snapshot_id"] + 1,
            "parent_id": parent["snapshot_id"],
            "timestamp_ms": int(_time.time() * 1000),
            "operation": "append", "schema": parent["schema"],
            "manifests": parent["manifests"] + [m],
            "added_manifests": [m],
            "summary": {"added_files": 1, "removed_files": 0}})
    n_rows = read_table(spark, tbl).count()

    def _manifest_reads(fn):
        """Count metadata-file opens during a planning call — the
        O(commit history) claim itself; wall-clock ratios are
        page-cache flaky on this host (2000 warm tiny-JSON reads cost
        about the same as one 2001-entry parse)."""
        calls = {"n": 0}
        real = icelite._load_manifest

        def counting(path, name):
            calls["n"] += 1
            return real(path, name)

        icelite._load_manifest = counting
        try:
            return fn(), calls["n"]
        finally:
            icelite._load_manifest = real

    _, reads_before = _manifest_reads(lambda: table_files(tbl))
    assert reads_before >= 2000        # one manifest per commit

    sid = rewrite_manifests(tbl)
    assert sid is not None
    snap = icelite._load_snapshot(tbl, sid)
    assert snap["operation"] == "rewrite-manifests"
    assert len(snap["manifests"]) == 1

    files, reads_after = _manifest_reads(lambda: table_files(tbl))
    assert len(files) == 2001          # same data files, one manifest
    assert read_table(spark, tbl).count() == n_rows
    # planning no longer opens O(commits) metadata files
    assert reads_after == 1
    # idempotent no-op second pass, and no orphan manifests left by it
    pre = {n for n in os.listdir(os.path.join(tbl, "meta"))
           if n.startswith("manifest-")}
    assert rewrite_manifests(tbl) is None
    post = {n for n in os.listdir(os.path.join(tbl, "meta"))
            if n.startswith("manifest-")}
    assert pre == post


def test_streaming_replace_snapshot_policy(spark, tbl, registered,
                                           tmp_path):
    append(_rows(spark, 0, 1000).repartitionByRange(2, "k"), tbl)
    src = spark.range(0, 5).select(
        F.col("id").alias("k"), F.lit("U").alias("v"),
        F.lit("m").alias("src"))
    merge_into(spark, tbl, src, key="k")

    def start(skip):
        reader = spark.readStream.format("icelite")
        if skip:
            reader = reader.option("skip-replace-snapshots", "true")
        return (reader.load(tbl).writeStream.format("parquet")
                .option("path", str(tmp_path / f"s{skip}"))
                .option("checkpointLocation", str(tmp_path / f"c{skip}"))
                .trigger(availableNow=True).start())

    from pyspark.errors.exceptions.base import PySparkException

    q = start(skip=False)
    with pytest.raises(Exception) as ei:
        q.awaitTermination(120)
    assert "append-only" in str(ei.value) or isinstance(
        ei.value, PySparkException)

    q2 = start(skip=True)
    q2.awaitTermination(120)
    # replace snapshot skipped: only the original append's files emitted
    assert spark.read.parquet(str(tmp_path / "sTrue")).count() == 1000


# ---------------------------------------------------------------------------
# write-audit-publish + tags (round 4)


def _meta_names(tbl, prefix):
    return {n for n in os.listdir(os.path.join(tbl, "meta"))
            if n.startswith(prefix)}


def _data_names(tbl):
    return set(os.listdir(os.path.join(tbl, "data")))


def test_wap_publish_is_atomic_and_invisible_until_published(spark, tbl):
    from bigdata_event_stream_detection_spark.sources.icelite import (
        publish_staged,
        read_staged,
        stage_append,
    )

    append(_rows(spark, 0, 50), tbl)
    staged = stage_append(_rows(spark, 50, 80, src="b"), tbl)
    # staged data exists on disk but NO reader path can see it
    assert read_table(spark, tbl).count() == 50
    assert current_snapshot_id(tbl) == 2
    assert len(table_files(tbl)) < len(_data_names(tbl))
    # audit-phase reads: staged-only and as-if-published
    assert read_staged(spark, tbl, staged).count() == 30
    assert read_staged(spark, tbl, staged, as_if_published=True).count() == 80
    sid = publish_staged(tbl, staged)
    assert sid == 3
    assert read_table(spark, tbl).count() == 80
    snap = icelite._load_snapshot(tbl, sid)
    assert snap["summary"]["wap"] is True
    assert snap["added_manifests"] == [staged["manifest"]]


def test_wap_audit_failure_aborts_cleanly(spark, tbl):
    from bigdata_event_stream_detection_spark.sources.icelite import (
        AuditFailed,
        write_audit_publish,
    )

    append(_rows(spark, 0, 50), tbl)
    pre_data = _data_names(tbl)
    pre_manifests = _meta_names(tbl, "manifest-")
    bad = _rows(spark, 50, 60).withColumn(
        "v", F.when(F.col("k") >= 55, F.lit(None)).otherwise(F.col("v")))
    with pytest.raises(AuditFailed, match="v_not_null: 5/10 rows violate"):
        write_audit_publish(bad, tbl, [("v_not_null", "v IS NOT NULL")])
    # table untouched: same snapshot, same rows, no file or manifest leak
    assert current_snapshot_id(tbl) == 2
    assert read_table(spark, tbl).count() == 50
    assert _data_names(tbl) == pre_data
    assert _meta_names(tbl, "manifest-") == pre_manifests


def test_wap_passes_and_tags_release(spark, tbl):
    from bigdata_event_stream_detection_spark.sources.icelite import (
        resolve_tag,
        write_audit_publish,
    )

    append(_rows(spark, 0, 50), tbl)
    sid = write_audit_publish(
        _rows(spark, 50, 70, src="b"), tbl,
        [("v_not_null", "v IS NOT NULL"), ("k_in_range", "k < 100")],
        tag="release-1")
    assert resolve_tag(tbl, "release-1") == sid
    assert read_table(spark, tbl, tag="release-1").count() == 70
    snap = icelite._load_snapshot(tbl, sid)
    assert snap["summary"]["wap_audit"] == "passed"
    assert snap["summary"]["wap_checks"] == 2


def test_wap_audit_scope_table_sees_existing_rows(spark, tbl):
    from bigdata_event_stream_detection_spark.sources.icelite import (
        AuditFailed,
        write_audit_publish,
    )

    # base table carries a violation; clean staged rows pass a
    # staged-scope audit but the as-if-published audit catches it
    append(_rows(spark, 0, 10).withColumn(
        "v", F.when(F.col("k") == 3, F.lit(None)).otherwise(F.col("v"))),
        tbl)
    clean = _rows(spark, 10, 20, src="b")
    checks = [("v_not_null", "v IS NOT NULL")]
    with pytest.raises(AuditFailed):
        write_audit_publish(clean, tbl, checks, audit_scope="table")
    assert read_table(spark, tbl).count() == 10   # aborted
    sid = write_audit_publish(clean, tbl, checks, audit_scope="staged")
    assert sid is not None
    assert read_table(spark, tbl).count() == 20


def test_wap_staged_rows_never_reach_the_stream(spark, tbl, tmp_path):
    from bigdata_event_stream_detection_spark.sources.icelite import (
        publish_staged,
        stage_append,
    )

    append(_rows(spark, 0, 20), tbl)
    staged = stage_append(_rows(spark, 20, 30, src="b"), tbl)
    spark.dataSource.register(IceliteDataSource)
    out = str(tmp_path / "out")

    def run_batch():
        q = (spark.readStream.format("icelite").load(tbl)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.read.parquet(out).count()

    assert run_batch() == 20               # staged rows not emitted
    publish_staged(tbl, staged)
    assert run_batch() == 30               # exactly the published rows


def test_tags_immutable_and_pin_expiry(spark, tbl):
    from bigdata_event_stream_detection_spark.sources.icelite import (
        create_tag,
        drop_tag,
        tags,
    )

    append(_rows(spark, 0, 10), tbl)           # snap 2
    create_tag(tbl, "v1")
    append(_rows(spark, 10, 30, src="b"), tbl)  # snap 3
    append(_rows(spark, 30, 60, src="c"), tbl)  # snap 4
    with pytest.raises(ValueError, match="already exists"):
        create_tag(tbl, "v1")
    with pytest.raises(ValueError, match="invalid ref name"):
        create_tag(tbl, "bad/name")
    # expiry keeps the tagged snapshot alive (retention pin)
    expire_snapshots(tbl, keep_last=1)
    assert read_table(spark, tbl, tag="v1").count() == 10
    assert tags(tbl) == {"v1": 2}
    # dropping the tag releases the pin; the next expiry reclaims it
    drop_tag(tbl, "v1")
    expire_snapshots(tbl, keep_last=1)
    assert 2 not in icelite._list_snapshot_ids(tbl)
    with pytest.raises(ValueError, match="no such tag"):
        read_table(spark, tbl, tag="v1")


def test_multiwriter_randomized_stress(spark, tmp_path):
    """VERDICT r4 item 6: N writers x M randomized ops (appends, MOR
    merges, COW merges, compaction, expiry) interleaved via a shared
    start barrier, asserting (a) snapshot-log linearizability — ids are
    a gapless 1..K chain, each child naming its predecessor as parent —
    and (b) no lost rows: the final table equals a single-threaded
    replay of the ops in their COMMITTED order (each op records the
    snapshot id its commit won). Replace-type ops may lose a race with
    CommitConflict (excluded from the replay); appends must always
    land.  6 seeds x 4 writers x 5 ops = 120 racing commit attempts.
    """
    import random

    for seed in range(6):
        path = str(tmp_path / f"stress{seed}")
        create_table(path, SCHEMA)
        rng = random.Random(seed)
        n_writers, n_ops = 4, 5
        committed = []           # (snapshot_id, op_spec) under lock
        errs = []
        lock = threading.Lock()
        barrier = threading.Barrier(n_writers)

        def mk_append(w, i):
            lo = (w * n_ops + i) * 10 + 1000
            rows = [(lo + j, f"v{lo + j}", f"w{w}") for j in range(5)]
            def run():
                df = spark.createDataFrame(rows, SCHEMA)
                sid = append(df, path)
                return sid, ("append", rows)
            return run

        def mk_merge(w, i, strategy):
            lo = rng.randrange(1000, 1000 + n_writers * n_ops * 10, 5)
            rows = [(lo + j, f"m{w}-{i}-{lo + j}", f"w{w}",
                     (lo + j) % 3 == 0) for j in range(5)]
            def run():
                df = spark.createDataFrame(
                    rows, "k long, v string, src string, del boolean")
                sid = merge_into(spark, path, df, key="k",
                                 delete_col="del", strategy=strategy)
                return sid, ("merge", rows)
            return run

        def mk_maint(kind):
            def run():
                if kind == "compact":
                    sid = compact_files(spark, path, n_files=1,
                                        small_mb=10_000)
                else:
                    expire_snapshots(path, keep_last=50)
                    sid = None
                return sid, (kind, None)
            return run

        plans = []
        for w in range(n_writers):
            ops = []
            for i in range(n_ops):
                pick = rng.random()
                if pick < 0.5:
                    ops.append(mk_append(w, i))
                elif pick < 0.8:
                    ops.append(mk_merge(
                        w, i, rng.choice(
                            ["copy-on-write", "merge-on-read"])))
                else:
                    ops.append(mk_maint(
                        rng.choice(["compact", "expire"])))
            plans.append(ops)

        def worker(ops):
            try:
                barrier.wait()
            except Exception as e:  # pragma: no cover
                errs.append(e)
                return
            for op in ops:
                try:
                    sid, spec = op()
                    if sid is not None and spec[0] != "compact":
                        with lock:
                            committed.append((sid, spec))
                except CommitConflict:
                    continue  # replace-type op lost its race: allowed
                except Exception as e:  # pragma: no cover
                    errs.append(e)

        ts = [threading.Thread(target=worker, args=(p,)) for p in plans]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert not errs, errs

        # (a) linearizable snapshot log: gapless chain of parents
        log = snapshots(path)
        ids = [s["snapshot_id"] for s in log]
        assert ids == list(range(1, len(ids) + 1)), ids
        for prev, cur in zip(log, log[1:]):
            assert cur["parent_id"] == prev["snapshot_id"]

        # (b) no lost rows: replay committed data ops in commit order
        state = {}
        for _sid, (kind, rows) in sorted(committed):
            if kind == "append":
                for k, v, src in rows:
                    state[k] = (v, src)
            elif kind == "merge":
                for k, v, src, is_del in rows:
                    if is_del:
                        state.pop(k, None)
                    else:
                        state[k] = (v, src)
        got = {r["k"]: (r["v"], r["src"])
               for r in read_table(spark, path).collect()}
        assert got == state, (
            f"seed {seed}: {len(got)} rows vs replay {len(state)}")
