"""Incremental materialized views (sources/icelite_mv.py).

The invariant everywhere: after any sequence of source commits +
refresh, `read_materialized_view` EQUALS the direct groupBy
aggregation over the source's current rows (the recompute the view
exists to avoid). Sources of change exercised: appends, COW merge
(update+delete+insert), MOR merge, delete_where, compaction (nets to
zero — watermark-only refresh), rollback (net diff), and null group
keys / null measure values for the SQL-null semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
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
    rollback_to,
    snapshots,
)
from bigdata_event_stream_detection_spark.sources.icelite_mv import (
    create_materialized_view,
    read_materialized_view,
    rebuild_materialized_view,
    refresh_materialized_view,
)

SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("grp", StringType()),
    StructField("x", LongType()),
    StructField("d", DoubleType()),
])


def _rows(spark, lo, hi, null_every=0):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), F.col("id") % 4).alias("grp"),
        (F.col("id") * 3).alias("x"),
        (F.col("id") * 0.5).alias("d"))
    if null_every:
        df = df.withColumn(
            "grp", F.when(F.col("k") % null_every == 0, F.lit(None))
            .otherwise(F.col("grp")))
        df = df.withColumn(
            "x", F.when(F.col("k") % null_every == 1, F.lit(None))
            .otherwise(F.col("x")))
    return df


MEASURES = {
    "n": ("count", None),
    "n_x": ("count", "x"),
    "sum_x": ("sum", "x"),
    "avg_d": ("avg", "d"),
}


def _direct(spark, path):
    return (read_table(spark, path)
            .groupBy("grp")
            .agg(F.count("*").alias("n"),
                 F.count("x").alias("n_x"),
                 F.sum("x").alias("sum_x"),
                 F.avg("d").alias("avg_d")))


def _assert_matches(spark, src, mv):
    got = {r["grp"]: (r["n"], r["n_x"], r["sum_x"], r["avg_d"])
           for r in read_materialized_view(spark, mv).collect()}
    want = {r["grp"]: (r["n"], r["n_x"], r["sum_x"], r["avg_d"])
            for r in _direct(spark, src).collect()}
    assert set(got) == set(want)
    for g, (n, nx, sx, ad) in want.items():
        gn, gnx, gsx, gad = got[g]
        assert (gn, gnx, gsx) == (n, nx, sx), g
        if ad is None:
            assert gad is None, g
        else:
            assert gad == pytest.approx(ad, rel=1e-9), g


@pytest.fixture()
def src(spark, tmp_path):
    path = str(tmp_path / "mv_src")
    create_table(path, SCHEMA)
    append(_rows(spark, 0, 400, null_every=7), path)
    return path


def test_initial_build_matches_direct(spark, src, tmp_path):
    from bigdata_event_stream_detection_spark.sources.icelite_mv import (
        materialized_view_status,
    )

    mv = str(tmp_path / "mv")
    create_materialized_view(spark, src, mv, ["grp"], MEASURES)
    _assert_matches(spark, src, mv)
    # already current: refresh is a no-op returning None
    assert refresh_materialized_view(spark, mv) is None
    st = materialized_view_status(mv)
    assert st["fresh"] and st["lag"] == 0 and st["source"] == src
    append(_rows(spark, 400, 410), src)
    st = materialized_view_status(mv)
    assert not st["fresh"] and st["lag"] == 1
    refresh_materialized_view(spark, mv)
    assert materialized_view_status(mv)["fresh"]


def test_refresh_tracks_appends_and_cow_merge(spark, src, tmp_path):
    mv = str(tmp_path / "mv")
    create_materialized_view(spark, src, mv, ["grp"], MEASURES)
    append(_rows(spark, 400, 600), src)
    mrg = (_rows(spark, 100, 200)
           .withColumn("x", F.col("x") + 1000)
           .withColumn("is_delete", F.col("k") % 5 == 0))
    merge_into(spark, src, mrg, key="k", delete_col="is_delete")
    assert refresh_materialized_view(spark, mv) is not None
    _assert_matches(spark, src, mv)


def test_refresh_tracks_mor_merge_and_group_death(spark, tmp_path):
    path = str(tmp_path / "src2")
    create_table(path, SCHEMA)
    append(_rows(spark, 0, 40), path)
    mv = str(tmp_path / "mv2")
    create_materialized_view(spark, path, mv, ["grp"], MEASURES)
    # kill every grp=='g1' row (k%4==1) via MOR merge -> group dies
    mrg = (_rows(spark, 0, 40).filter(F.col("k") % 4 == 1)
           .withColumn("is_delete", F.lit(True)))
    merge_into(spark, path, mrg, key="k", delete_col="is_delete",
               strategy="merge-on-read")
    refresh_materialized_view(spark, mv)
    _assert_matches(spark, path, mv)
    assert (read_materialized_view(spark, mv)
            .filter(F.col("grp") == "g1").count() == 0)
    # resurrect the group: a later insert re-creates the row
    append(_rows(spark, 41, 42), path)  # k=41 -> g1
    refresh_materialized_view(spark, mv)
    _assert_matches(spark, path, mv)


def test_compaction_nets_to_watermark_only(spark, src, tmp_path):
    mv = str(tmp_path / "mv")
    create_materialized_view(spark, src, mv, ["grp"], MEASURES)
    n_before = len(snapshots(mv))
    compact_files(spark, src, n_files=1, small_mb=10_000)
    sid = refresh_materialized_view(spark, mv)
    assert sid is not None  # watermark advanced
    # properties-only commit: no data files were added
    last = snapshots(mv)[-1]
    assert last["operation"] == "properties"
    assert len(snapshots(mv)) == n_before + 1
    _assert_matches(spark, src, mv)
    assert refresh_materialized_view(spark, mv) is None


def test_rollback_net_diff(spark, src, tmp_path):
    mv = str(tmp_path / "mv")
    create_materialized_view(spark, src, mv, ["grp"], MEASURES)
    keep = snapshots(src)[-1]["snapshot_id"]
    append(_rows(spark, 400, 900), src)
    refresh_materialized_view(spark, mv)
    rollback_to(src, keep)
    refresh_materialized_view(spark, mv)
    _assert_matches(spark, src, mv)


def test_null_group_key_and_bucketed_view(spark, src, tmp_path):
    mv = str(tmp_path / "mvb")
    create_materialized_view(spark, src, mv, ["grp"], MEASURES,
                             bucket=4)
    append(_rows(spark, 400, 500, null_every=3), src)
    refresh_materialized_view(spark, mv)
    _assert_matches(spark, src, mv)  # includes the NULL group row


def test_composite_group_keys(spark, tmp_path):
    path = str(tmp_path / "src3")
    schema = StructType(SCHEMA.fields
                        + [StructField("parity", LongType())])
    create_table(path, schema)
    rows = _rows(spark, 0, 300, null_every=11).withColumn(
        "parity", F.col("k") % 2)
    append(rows, path)
    mv = str(tmp_path / "mvc")
    create_materialized_view(
        spark, path, mv, ["grp", "parity"],
        {"n": ("count", None), "sum_x": ("sum", "x")})
    append(_rows(spark, 300, 450, null_every=5)
           .withColumn("parity", F.col("k") % 2), path)
    refresh_materialized_view(spark, mv)
    got = {(r["grp"], r["parity"]): (r["n"], r["sum_x"])
           for r in read_materialized_view(spark, mv).collect()}
    want = {(r["grp"], r["parity"]): (r["n"], r["sum_x"])
            for r in (read_table(spark, path)
                      .groupBy("grp", "parity")
                      .agg(F.count("*").alias("n"),
                           F.sum("x").alias("sum_x"))).collect()}
    assert got == want


def test_filtered_view_tracks_boundary_crossings(spark, src, tmp_path):
    # WHERE x < 600 in the definition; the merge bumps x by +1000 for
    # a slice of keys, moving their rows OUT of the predicate — the
    # symmetric delta filter must net each to a pure delete
    mv = str(tmp_path / "mvf")
    create_materialized_view(
        spark, src, mv, ["grp"],
        {"n": ("count", None), "sum_x": ("sum", "x")},
        filter_sql="x < 600")
    mrg = (_rows(spark, 100, 260)
           .withColumn("x", F.col("x") + 1000)
           .withColumn("is_delete", F.col("k") % 10 == 0))
    merge_into(spark, src, mrg, key="k", delete_col="is_delete")
    append(_rows(spark, 400, 520), src)
    refresh_materialized_view(spark, mv)
    got = {r["grp"]: (r["n"], r["sum_x"])
           for r in read_materialized_view(spark, mv).collect()}
    want = {r["grp"]: (r["n"], r["sum_x"])
            for r in (read_table(spark, src).filter("x < 600")
                      .groupBy("grp")
                      .agg(F.count("*").alias("n"),
                           F.sum("x").alias("sum_x"))).collect()}
    assert got == want


def test_rebuild_recovers_from_expired_history(spark, src, tmp_path):
    from bigdata_event_stream_detection_spark.sources.icelite import (
        expire_snapshots,
    )

    mv = str(tmp_path / "mvr")
    create_materialized_view(spark, src, mv, ["grp"], MEASURES)
    append(_rows(spark, 400, 500), src)
    append(_rows(spark, 500, 560), src)
    expire_snapshots(src, keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        refresh_materialized_view(spark, mv)
    rebuild_materialized_view(spark, mv)
    _assert_matches(spark, src, mv)
    # incremental refresh resumes from the rebuilt watermark
    append(_rows(spark, 560, 620), src)
    assert refresh_materialized_view(spark, mv) is not None
    _assert_matches(spark, src, mv)


def test_rejects_min_max_and_bad_specs(spark, src, tmp_path):
    with pytest.raises(ValueError, match="not incrementally"):
        create_materialized_view(spark, src, str(tmp_path / "m1"),
                                 ["grp"], {"m": ("min", "x")})
    with pytest.raises(ValueError, match="needs a column"):
        create_materialized_view(spark, src, str(tmp_path / "m2"),
                                 ["grp"], {"s": ("sum", None)})
    with pytest.raises(ValueError, match="reserved"):
        create_materialized_view(spark, src, str(tmp_path / "m3"),
                                 ["grp"], {"_rows": ("count", None)})
    with pytest.raises(ValueError, match="numeric"):
        create_materialized_view(spark, src, str(tmp_path / "m4"),
                                 ["grp"], {"s": ("sum", "grp")})
