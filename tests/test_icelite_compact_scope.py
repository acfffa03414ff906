"""Partition/predicate-scoped compaction (compact_files where=...).

The predicate selects whole files (partition-exact on hidden
partition tuples, stats-conservative otherwise) and must never change
table content: scoped compaction folds pending MOR deletes into the
rewritten files while carrying every out-of-scope file byte-identical
and still referenced.
"""

from __future__ import annotations

import os

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
    table_files,
)

SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("grp", StringType()),
])


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), F.col("id") % 3).alias("grp"))


def _content(spark, path):
    return {(r["k"], r["grp"])
            for r in read_table(spark, path).collect()}


def _files_by_grp(path):
    out: dict[str, list] = {}
    for e in table_files(path):
        out.setdefault(e["partition"]["grp"], []).append(e)
    return out


def test_partition_scoped_compaction(spark, tmp_path):
    path = str(tmp_path / "scoped")
    create_table(path, SCHEMA, partition_spec=[("grp", "identity")])
    for i in range(3):
        append(_rows(spark, 90 * i, 90 * (i + 1)), path)
    # pending MOR delete touching g1 rows: the scoped rewrite must
    # fold it in, not resurrect
    merge_into(spark, path,
               _rows(spark, 0, 30).withColumn("is_delete",
                                              F.col("k") % 2 == 1),
               key="k", delete_col="is_delete",
               strategy="merge-on-read")
    before = _content(spark, path)
    by_grp = _files_by_grp(path)
    untouched_state = {
        e["path"]: os.path.getsize(os.path.join(path, e["path"]))
        for g in ("g0", "g2") for e in by_grp[g]}
    assert len(by_grp["g1"]) >= 3
    sid = compact_files(spark, path, n_files=1, small_mb=10_000,
                        where=[("grp", "=", "g1")])
    assert sid is not None
    after_grp = _files_by_grp(path)
    assert len(after_grp["g1"]) == 1  # one tuple, one output file
    # every out-of-scope file carried by reference, byte-identical
    for g in ("g0", "g2"):
        assert {e["path"] for e in after_grp[g]} == {
            p for p in untouched_state
            if any(p == e["path"] for e in by_grp[g])}
        for e in after_grp[g]:
            assert os.path.getsize(
                os.path.join(path, e["path"])) == \
                untouched_state[e["path"]]
    assert _content(spark, path) == before


def test_stats_scoped_compaction_and_empty_scope(spark, tmp_path):
    path = str(tmp_path / "statscope")
    create_table(path, SCHEMA)
    for i in range(4):
        append(_rows(spark, 100 * i, 100 * (i + 1))
               .repartitionByRange(2, "k").sortWithinPartitions("k"),
               path)
    before = _content(spark, path)
    n_before = len(table_files(path))
    # the k<100 slice spans only the first append's files
    in_scope = [e for e in table_files(path)
                if e["stats"]["k"]["min"] < 100]
    sid = compact_files(spark, path, n_files=1, small_mb=10_000,
                        where=[("k", "<", 100)])
    assert sid is not None
    files = table_files(path)
    assert len(files) == n_before - len(in_scope) + 1
    assert _content(spark, path) == before
    # a scope matching nothing compacts nothing
    assert compact_files(spark, path, n_files=1, small_mb=10_000,
                         where=[("k", ">", 10_000)]) is None
