"""``write.sort-order`` table property: WRITE ORDERED BY for icelite.

Iceberg's ``ALTER TABLE ... WRITE ORDERED BY`` (behavior parity): a
table property every append/overwrite honors — rows are range-
clustered + sorted (or Z-ordered) at write time, so footer stats stay
selective on trigger-sized streaming-sink files WITHOUT waiting for a
layout compaction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.sources.icelite import (
    append,
    create_table,
    set_properties,
    table_files,
)


def _df(spark, n=4000, seed_shift=0):
    # deliberately UNORDERED in every column (hash scrambles)
    return spark.range(0, n).select(
        (F.xxhash64(F.col("id") + seed_shift) % 1000).alias("a"),
        (F.xxhash64(F.col("id") + seed_shift + 7) % 1000).alias("b"),
        F.col("id").alias("k")).repartition(8)


def _span(e, col):
    st = e["stats"][col]
    return st["max"] - st["min"]


def test_range_sort_order_makes_files_prunable(spark, tmp_path):
    df = _df(spark)
    plain, ordered = str(tmp_path / "plain"), str(tmp_path / "ordered")
    create_table(plain, df.schema)
    append(df, plain)
    create_table(ordered, df.schema,
                 properties={"write.sort-order": "a"})
    append(df, ordered)

    pred = [("a", "between", (-100, 0))]
    n_plain = len(table_files(plain))
    n_ordered = len(table_files(ordered))
    hit_plain = len(table_files(plain, where=pred))
    hit_ordered = len(table_files(ordered, where=pred))
    # unordered: every file spans the hash range -> nothing prunable;
    # ordered: the slice lives in a strict subset of the files
    assert hit_plain == n_plain
    assert hit_ordered < n_ordered
    # rows identical either way
    from bigdata_event_stream_detection_spark.sources.icelite import (
        read_table,
    )

    a = read_table(spark, plain).orderBy("k").collect()
    b = read_table(spark, ordered).orderBy("k").collect()
    assert a == b


def test_sort_order_applies_per_append(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df = _df(spark)
    create_table(tbl, df.schema, properties={"write.sort-order": "a"})
    append(df, tbl)
    append(_df(spark, seed_shift=100), tbl)
    files = table_files(tbl)
    # every append's files cover narrow, mostly disjoint slices: each
    # file's span is a fraction of the full 2000-wide hash range
    avg_span = sum(_span(e, "a") for e in files) / len(files)
    assert avg_span < 800


def test_zorder_sort_order_prunes_both_columns(spark, tmp_path):
    df = _df(spark)
    tbl = str(tmp_path / "t")
    create_table(tbl, df.schema,
                 properties={"write.sort-order": "zorder(a,b)"})
    append(df, tbl)
    n = len(table_files(tbl))
    hit_a = len(table_files(tbl, where=[("a", "between", (-100, 0))]))
    hit_b = len(table_files(tbl, where=[("b", "between", (-100, 0))]))
    assert hit_a < n and hit_b < n


def test_sort_order_set_later_applies_to_new_writes(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df = _df(spark)
    create_table(tbl, df.schema)
    append(df, tbl)
    set_properties(tbl, {"write.sort-order": "a"})
    append(_df(spark, seed_shift=50), tbl)
    pred = [("a", "between", (-100, 0))]
    # the post-property files prune; the pre-property ones cannot
    assert len(table_files(tbl, where=pred)) < len(table_files(tbl))


def test_streaming_sink_inherits_sort_order(spark, tmp_path):
    from bigdata_event_stream_detection_spark.streaming.icelite_sink import (
        start_append_sink,
    )

    tbl = str(tmp_path / "t")
    src_dir = str(tmp_path / "src")
    df = _df(spark)
    create_table(tbl, df.schema, properties={"write.sort-order": "a"})
    df.write.parquet(src_dir)
    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    q = start_append_sink(stream, tbl, str(tmp_path / "ckpt"),
                          available_now=True)
    q.awaitTermination(120)
    pred = [("a", "between", (-100, 0))]
    assert len(table_files(tbl, where=pred)) < len(table_files(tbl))
