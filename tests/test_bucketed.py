"""Bucketed-table layout: the write pays the shuffle once; every later
join/agg on the bucket key must be Exchange-free (the 100 TB co-located
join strategy — see sources/tables.py:write_bucketed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.sources.tables import (
    read_bucketed,
    write_bucketed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("score"))
    meta = spark.range(0, 2000, 2).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("grp"))
    write_bucketed(docs, "bt_docs", buckets=8, bucket_cols=("doc_id",),
                   sort_cols=("doc_id",), path=str(tmp_path / "bt_docs"))
    write_bucketed(meta, "bt_meta", buckets=8, bucket_cols=("doc_id",),
                   sort_cols=("doc_id",), path=str(tmp_path / "bt_meta"))
    yield "bt_docs", "bt_meta"
    spark.sql("DROP TABLE IF EXISTS bt_docs")
    spark.sql("DROP TABLE IF EXISTS bt_meta")


def test_bucketed_join_is_shuffle_free(spark, bucketed_pair):
    ta, tb = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, ta).join(read_bucketed(spark, tb),
                                               "doc_id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000  # every even doc_id matches
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_aggregates_in_place(spark, bucketed_pair):
    ta, _ = bucketed_pair
    agg = read_bucketed(spark, ta).groupBy("doc_id").agg(
        F.sum("score").alias("s"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 2000


def test_unbucketed_read_of_same_files_does_shuffle(spark, bucketed_pair,
                                                    tmp_path):
    # control: reading the SAME parquet files without the table metadata
    # loses the layout and the join pays an Exchange again
    ta, tb = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.read.parquet(str(tmp_path / "bt_docs"))
        b = spark.read.parquet(str(tmp_path / "bt_meta"))
        plan = _plan(a.join(b, "doc_id"))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
