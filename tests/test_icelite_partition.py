"""Hidden partitioning (Iceberg partition transforms) for icelite.

Covers: spec validation; Spark-vs-Python transform parity (the write
path groups by a Column expression, the plan path transforms predicate
literals in Python — pruning is sound only if they agree bit-for-bit);
exact partition pruning for every transform; null handling; the
bucketed-merge planning prefilter (untouched buckets stay byte-identical
on disk); partition alignment through compaction and WAP staging.

Reference parity note: the reference repo has no table format (its
inputs are raw XML dumps, SURVEY.md §2.1); this follows the public
Iceberg spec's partition-transform design (iceberg.apache.org/spec
§Partition Transforms).
"""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType,
                               StructField, StructType, TimestampType)

from bigdata_event_stream_detection_spark.sources import icelite as il

SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("ts", TimestampType()),
    StructField("val", LongType()),
])


def _utc(*a):
    return dt.datetime(*a, tzinfo=dt.timezone.utc)


def _rows(n=40, days=3):
    return [(f"d{i:03d}", dt.datetime(2024, 1, 1 + (i % days), 10 + i % 12),
             i) for i in range(n)]


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "ptbl")


def _make(spark, tbl, spec, rows=None):
    il.create_table(tbl, SCHEMA, partition_spec=spec)
    df = spark.createDataFrame(rows or _rows(), SCHEMA)
    il.append(df, tbl)
    return df


# ---------------------------------------------------------------- validation


def test_spec_validation(tbl):
    with pytest.raises(ValueError, match="not in schema"):
        il.create_table(tbl, SCHEMA, partition_spec=[("nope", "identity")])
    with pytest.raises(ValueError, match="bucket.*n >= 2"):
        il.create_table(tbl, SCHEMA, partition_spec=[("doc_id", "bucket", 1)])
    with pytest.raises(ValueError, match="timestamps: use day/hour"):
        il.create_table(tbl, SCHEMA, partition_spec=[("ts", "identity")])
    with pytest.raises(ValueError, match="unknown partition transform"):
        il.create_table(tbl, SCHEMA, partition_spec=[("ts", "month")])
    with pytest.raises(ValueError, match="duplicate"):
        il.create_table(tbl, SCHEMA, partition_spec=[
            ("doc_id", "bucket", 4), ("doc_id", "bucket", 4)])
    sch = StructType([StructField("x", DoubleType())])
    with pytest.raises(ValueError, match="bucket partition unsupported"):
        il.create_table(tbl, sch, partition_spec=[("x", "bucket", 4)])


# ------------------------------------------------- transform parity (write
# path Column expr vs plan path Python scalar — soundness of all pruning)


def test_transform_parity_spark_vs_python(spark):
    schema = StructType([
        StructField("s", StringType()),
        StructField("i", LongType()),
        StructField("ts", TimestampType()),
    ])
    fields = [
        il._normalize_spec([("s", "bucket", 7)], schema)[0],
        il._normalize_spec([("s", "truncate", 3)], schema)[0],
        il._normalize_spec([("s", "identity")], schema)[0],
        il._normalize_spec([("i", "bucket", 5)], schema)[0],
        il._normalize_spec([("i", "truncate", 10)], schema)[0],
        il._normalize_spec([("ts", "day")], schema)[0],
        il._normalize_spec([("ts", "hour")], schema)[0],
    ]
    rows = [
        ("alpha", 42, _utc(2024, 3, 1, 23, 59, 59)),
        ("Ünïcode-ß", -7, _utc(1969, 12, 31, 23, 0)),   # pre-epoch
        ("x", 0, _utc(1970, 1, 1, 0, 0)),
        ("longer-string-here", 999999999999, _utc(2200, 6, 15, 12)),
        ("", -1000000, _utc(2024, 2, 29, 0, 0)),        # leap day
    ]
    df = spark.createDataFrame(
        [(s, i, t.replace(tzinfo=None)) for s, i, t in rows], schema)
    got = df.select(*[il._transform_expr(f, schema).alias(f"c{k}")
                      for k, f in enumerate(fields)]).collect()
    for (s, i, t), row in zip(rows, got):
        vals = {"s": s, "i": i, "ts": t}
        for k, f in enumerate(fields):
            want = il._transform_value(f, vals[f["source"]], schema)
            assert row[f"c{k}"] == want, (f, vals[f["source"]],
                                          row[f"c{k}"], want)


# ------------------------------------------------------------- file layout


def test_partitioned_write_layout(spark, tbl):
    _make(spark, tbl, [("doc_id", "bucket", 4), ("ts", "day")])
    entries = il.table_files(tbl)
    # one file per (bucket, day) tuple present (hash write distribution)
    tuples = {(e["partition"]["doc_id_bucket4"], e["partition"]["ts_day"])
              for e in entries}
    assert len(entries) == len(tuples)
    # hidden columns are NOT stored in the data files
    import pyarrow.parquet as pq

    cols = pq.ParquetFile(
        os.path.join(tbl, entries[0]["path"])).schema_arrow.names
    assert cols == ["doc_id", "ts", "val"]
    # full read round-trips
    assert il.read_table(spark, tbl).count() == 40


def test_exact_bucket_prune_and_read(spark, tbl):
    df = _make(spark, tbl, [("doc_id", "bucket", 4)])
    all_files = il.table_files(tbl)
    spec = il.table_partition_spec(tbl)[0]
    want_bucket = il._transform_value(spec, "d007", SCHEMA)
    pruned = il.table_files(tbl, where=[("doc_id", "=", "d007")])
    # every planned file is in the key's bucket — exact, not min/max
    assert pruned and all(
        e["partition"]["doc_id_bucket4"] == want_bucket for e in pruned)
    assert len(pruned) < len(all_files)
    got = il.read_table(spark, tbl,
                        where=[("doc_id", "=", "d007")]).collect()
    assert [r["val"] for r in got] == [7]
    # range predicates never bucket-prune (hash order != key order) but
    # still stats-prune; result correctness is what matters
    n = il.read_table(spark, tbl,
                      where=[("doc_id", ">=", "d035")]).count()
    assert n == len([r for r in df.collect() if r["doc_id"] >= "d035"])


def test_day_and_hour_prune(spark, tbl):
    il.create_table(tbl, SCHEMA, partition_spec=[("ts", "day")])
    rows = _rows(60, days=5)
    il.append(spark.createDataFrame(rows, SCHEMA), tbl)
    total = len(il.table_files(tbl))
    assert total == 5
    # equality day prune -> exactly 1 file
    d2 = _utc(2024, 1, 2, 15, 0)  # any instant inside the day
    assert len(il.table_files(tbl, where=[("ts", "=", d2)])) == 1
    # range prune: >= Jan 3 keeps days 3,4,5 (3 files)
    lo = _utc(2024, 1, 3, 0, 0)
    files = il.table_files(tbl, where=[("ts", ">=", lo)])
    assert len(files) == 3
    cnt = il.read_table(spark, tbl, where=[("ts", ">=", lo)]).count()
    assert cnt == sum(1 for _, t, _ in rows
                      if t.replace(tzinfo=dt.timezone.utc) >= lo)
    # between prune
    hi = _utc(2024, 1, 3, 23, 59)
    assert len(il.table_files(tbl, where=[("ts", "between", (lo, hi))])) == 1


def test_truncate_prune(spark, tbl):
    il.create_table(tbl, SCHEMA, partition_spec=[("doc_id", "truncate", 2)])
    rows = ([("aa" + str(i), _utc(2024, 1, 1).replace(tzinfo=None), i)
             for i in range(5)]
            + [("zz" + str(i), _utc(2024, 1, 1).replace(tzinfo=None), i)
               for i in range(5)])
    il.append(spark.createDataFrame(rows, SCHEMA), tbl)
    assert len(il.table_files(tbl)) == 2
    got = il.table_files(tbl, where=[("doc_id", "=", "zz3")])
    assert len(got) == 1 and got[0]["partition"]["doc_id_trunc2"] == "zz"
    # monotonic range prune on the string prefix
    assert len(il.table_files(tbl, where=[("doc_id", ">=", "zz")])) == 1
    assert il.read_table(spark, tbl,
                         where=[("doc_id", "<", "b")]).count() == 5


def test_null_partition_values_never_prune_wrong(spark, tbl):
    il.create_table(tbl, SCHEMA, partition_spec=[("doc_id", "bucket", 4)])
    rows = [(None, dt.datetime(2024, 1, 1), 1),
            ("d1", dt.datetime(2024, 1, 1), 2)]
    il.append(spark.createDataFrame(rows, SCHEMA), tbl)
    entries = il.table_files(tbl)
    nulls = [e for e in entries
             if e["partition"]["doc_id_bucket4"] is None]
    assert nulls, "null rows land in the sentinel partition"
    # the null-partition file survives planning under any predicate
    # (conservative: Spark folds '' into the same sentinel)
    planned = il.table_files(tbl, where=[("doc_id", "=", "d1")])
    assert any(e["partition"]["doc_id_bucket4"] is None for e in planned)
    got = il.read_table(spark, tbl, where=[("doc_id", "=", "d1")]).collect()
    assert [r["val"] for r in got] == [2]


# ---------------------------------------------------------------- merge


def test_merge_bucket_prefilter_untouched_bytes(spark, tbl):
    _make(spark, tbl, [("doc_id", "bucket", 8)])
    before = {e["path"]: (os.path.getsize(os.path.join(tbl, e["path"])),
                          os.path.getmtime(os.path.join(tbl, e["path"])))
              for e in il.table_files(tbl)}
    spec = il.table_partition_spec(tbl)[0]
    src_keys = ["d003", "d011"]
    src = spark.createDataFrame(
        [(k, dt.datetime(2024, 2, 1), 1000 + i)
         for i, k in enumerate(src_keys)], SCHEMA)
    il.merge_into(spark, tbl, src, key="doc_id")
    touched_buckets = {il._transform_value(spec, k, SCHEMA)
                       for k in src_keys}
    after = il.table_files(tbl)
    # every surviving pre-merge file outside the touched buckets is
    # byte-identical (same path, size, mtime — never rewritten)
    for e in after:
        b = e["partition"]["doc_id_bucket8"]
        if e["path"] in before and b not in touched_buckets:
            sz, mt = before[e["path"]]
            p = os.path.join(tbl, e["path"])
            assert os.path.getsize(p) == sz and os.path.getmtime(p) == mt
    # and no pre-merge file in an untouched bucket was dropped
    untouched_before = {p for p, _ in (
        (e["path"], e) for e in il.table_files(tbl, version=2))}
    res = {r["doc_id"]: r["val"] for r in il.read_table(spark, tbl).collect()}
    assert res["d003"] == 1000 and res["d011"] == 1001
    assert len(res) == 40
    assert untouched_before  # sanity


def test_merge_uniform_keys_plans_buckets_only(spark, tbl):
    """The uniform-key worst case: every file's [min,max] key range
    overlaps every other, so stats pruning alone touches ALL files; the
    bucket prefilter bounds planning to the source's buckets."""
    il.create_table(tbl, SCHEMA, partition_spec=[("doc_id", "bucket", 8)])
    # two appends -> per-bucket files whose doc_id ranges fully overlap
    il.append(spark.createDataFrame(_rows(40), SCHEMA), tbl)
    src = spark.createDataFrame(
        [("d001", dt.datetime(2024, 3, 1), 9999)], SCHEMA)
    sid = il.merge_into(spark, tbl, src, key="doc_id")
    snap = il._load_snapshot(tbl, sid)
    spec = il.table_partition_spec(tbl)[0]
    per_bucket = {}
    for e in il.table_files(tbl, version=2):
        per_bucket.setdefault(e["partition"]["doc_id_bucket8"], 0)
        per_bucket[e["partition"]["doc_id_bucket8"]] += 1
    b = il._transform_value(spec, "d001", SCHEMA)
    # only the key's bucket was rewritten
    assert snap["summary"]["removed_files"] <= per_bucket[b]


# ------------------------------------------------- maintenance + WAP + misc


def test_compact_preserves_alignment(spark, tbl):
    _make(spark, tbl, [("ts", "day")])
    il.append(spark.createDataFrame(_rows(), SCHEMA), tbl)  # small files x2
    sid = il.compact_files(spark, tbl, target_mb=64)
    assert sid is not None
    entries = il.table_files(tbl)
    days = [e["partition"]["ts_day"] for e in entries]
    assert len(days) == len(set(days)) == 3  # one file per day again
    assert il.read_table(spark, tbl).count() == 80
    # pruning still exact after compaction (row i=1: day 2, hour 11)
    assert len(il.table_files(
        tbl, where=[("ts", "=", _utc(2024, 1, 2, 11))])) == 1


def test_wap_staged_partition_aligned(spark, tbl):
    _make(spark, tbl, [("doc_id", "bucket", 4)])
    staged = il.stage_append(
        spark.createDataFrame([("zz", dt.datetime(2024, 5, 1), 1)], SCHEMA),
        tbl)
    assert all("partition" in e for e in staged["entries"])
    il.publish_staged(tbl, staged)
    assert il.read_table(spark, tbl).count() == 41
    spec = il.table_partition_spec(tbl)[0]
    got = il.table_files(tbl, where=[("doc_id", "=", "zz")])
    assert all(e["partition"]["doc_id_bucket4"]
               == il._transform_value(spec, "zz", SCHEMA) for e in got)


def test_spec_survives_schema_evolution_and_overwrite(spark, tbl):
    df = _make(spark, tbl, [("doc_id", "bucket", 4)])
    il.add_columns(tbl, StructType([StructField("extra", LongType())]))
    assert il.table_partition_spec(tbl)[0]["name"] == "doc_id_bucket4"
    il.append(df.withColumn("extra", F.lit(1)), tbl)
    assert len(il.table_files(tbl, where=[("doc_id", "=", "d001")])) <= (
        2 * 1 + 1)  # two appends' files in one bucket, stats may cut more
    il.overwrite(df.withColumn("extra", F.lit(2)), tbl)
    assert il.table_partition_spec(tbl)[0]["name"] == "doc_id_bucket4"
    ents = il.table_files(tbl)
    assert all("partition" in e for e in ents)


def test_timestamp_ntz_partition_and_stats_prune(spark, tbl):
    """Parquet tables loaded without a timezone read as timestamp_ntz
    (Spark 4 default for naive parquet timestamps): day/hour transforms
    and footer-stats pruning must treat it as UTC instants, same as the
    _plain encoding of the footer stats."""
    from pyspark.sql.types import TimestampNTZType

    schema = StructType([
        StructField("doc_id", StringType()),
        StructField("ts", TimestampNTZType()),
        StructField("val", LongType()),
    ])
    il.create_table(tbl, schema, partition_spec=[("ts", "hour")])
    rows = [(f"d{i}", dt.datetime(2024, 1, 1, i % 4, 30), i)
            for i in range(16)]
    il.append(spark.createDataFrame(rows, schema), tbl)
    assert len(il.table_files(tbl)) == 4
    pred = [("ts", ">=", _utc(2024, 1, 1, 2))]
    assert len(il.table_files(tbl, where=pred)) == 2
    got = il.read_table(spark, tbl, where=pred).count()
    assert got == sum(1 for _, t, _ in rows if t.hour >= 2)
    # ntz footer stats prune too (tighter than the hour partition)
    pred2 = [("ts", "=", _utc(2024, 1, 1, 3, 30))]
    files2 = il.table_files(tbl, where=pred2)
    assert len(files2) == 1
    assert il.read_table(spark, tbl, where=pred2).count() == 4


def test_time_travel_prunes_with_old_spec(spark, tbl):
    _make(spark, tbl, [("ts", "day")])
    v = il.current_snapshot_id(tbl)
    il.append(spark.createDataFrame(
        [("x", dt.datetime(2024, 1, 9), 1)], SCHEMA), tbl)
    old = il.table_files(tbl, version=v,
                         where=[("ts", ">=", _utc(2024, 1, 9))])
    assert old == []  # day 9 didn't exist at v — pruned to nothing
    assert il.read_table(spark, tbl, version=v).count() == 40
