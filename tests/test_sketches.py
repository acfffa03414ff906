"""HLL++ sketch aggregates vs exact distinct counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.operators.sketches import (
    approx_distinct_counts,
    approx_distinct_verified,
)


def _synth(spark):
    # two groups with known distinct cardinalities: 2000 and 100
    return spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
        F.when(F.col("id") % 2 == 0, F.col("id") % 4000)
        .otherwise(F.col("id") % 200).alias("v"),
    )


def test_approx_distinct_within_tolerance(spark):
    rows = {r["g"]: r for r in
            approx_distinct_verified(_synth(spark), ["g"], "v",
                                     rsd=0.05).collect()}
    assert rows["a"]["n_exact"] == 2000
    assert rows["b"]["n_exact"] == 100
    assert all(r["within_tol"] for r in rows.values())


def test_approx_distinct_counts_close(spark):
    rows = {r["g"]: r["n_approx"] for r in
            approx_distinct_counts(_synth(spark), ["g"], "v",
                                   rsd=0.02).collect()}
    assert abs(rows["a"] - 2000) <= 2000 * 0.08
    assert abs(rows["b"] - 100) <= 100 * 0.08


def test_heavy_hitters_equals_exact(spark):
    from bigdata_event_stream_detection_spark.operators.sketches import (
        heavy_hitters,
    )

    # zipf-ish skew: value v appears ~N/(v+1) times, plus a long tail
    # of singletons; shuffled across many partitions
    rows = []
    for v in range(20):
        rows += [f"hot{v}"] * (2000 // (v + 1))
    rows += [f"tail{i}" for i in range(3000)]
    df = (spark.createDataFrame([(r,) for r in rows], "v string")
          .repartition(16))
    n = len(rows)
    thr = 0.01
    got = {(r["v"], r["cnt"]) for r in
           heavy_hitters(df, "v", threshold_frac=thr).collect()}
    import math
    from collections import Counter
    c = Counter(rows)
    want = {(v, cnt) for v, cnt in c.items()
            if cnt >= math.ceil(thr * n)}
    assert got == want and len(want) >= 5


def test_heavy_hitters_partition_invariant(spark):
    from bigdata_event_stream_detection_spark.operators.sketches import (
        heavy_hitters,
    )

    rows = [("a",)] * 500 + [("b",)] * 100 + \
           [(f"t{i}",) for i in range(1000)]
    for parts in (1, 7, 32):
        df = spark.createDataFrame(rows, "v string").repartition(parts)
        got = {(r["v"], r["cnt"]) for r in
               heavy_hitters(df, "v", threshold_frac=0.05).collect()}
        assert got == {("a", 500), ("b", 100)}, parts


def test_histogram_quantiles_verified(spark):
    """Histogram quantile estimate lands in the exact discrete
    quantile's bin (guaranteed by construction) and within bin_width of
    a numpy recomputation, including a planted q*n == cum boundary."""
    import math

    import numpy as np

    from bigdata_event_stream_detection_spark.operators.sketches import (
        histogram_quantiles_verified,
    )

    rng = np.random.RandomState(7)
    vals_a = rng.gamma(2.0, 20.0, size=2000)           # skewed, 0..~300
    # key b: 100 values with a planted boundary — q=0.5 * 100 = 50 rows
    # exactly fill the bins below the median bin
    vals_b = np.concatenate([np.full(50, 3.25), np.full(50, 9.75)])
    pdf_rows = ([("a", float(v)) for v in vals_a]
                + [("b", float(v)) for v in vals_b])
    df = spark.createDataFrame(pdf_rows, "g string, value double")

    qs = [0.5, 0.9, 0.99]
    out = histogram_quantiles_verified(df, ["g"], "value", qs,
                                       bin_width=2.0)
    rows = {(r["g"], r["q"]): r for r in out.collect()}
    assert set(rows) == {(g, q) for g in "ab" for q in qs}
    assert all(r["within_bin"] for r in rows.values())
    for (g, q), r in rows.items():
        vals = np.sort(vals_a if g == "a" else vals_b)
        exact = vals[math.ceil(q * len(vals)) - 1]
        assert r["exact"] == round(float(exact), 6)
        assert abs(r["est"] - exact) <= 2.0 + 1e-9
    # the planted boundary: exact median of b is 3.25 (bin 1), interp
    # est touches the bin's upper edge yet the verdict stays true
    assert rows[("b", 0.5)]["exact"] == 3.25
    assert rows[("b", 0.5)]["est"] == 4.0


def test_count_min_never_undercounts_and_merges(spark):
    from pyspark.sql import functions as F

    from bigdata_event_stream_detection_spark.operators.sketches import (
        count_min_estimate, count_min_sketch,
    )

    rows = ([("apple",)] * 50 + [("pear",)] * 7 + [("plum",)] * 1
            + [(f"w{i}",) for i in range(200)])
    df = spark.createDataFrame(rows, "v string")
    # deliberately tiny width: collisions are live
    sk = count_min_sketch(df, "v", width=16, depth=4)
    est = {r["value"]: r["est"] for r in
           count_min_estimate(sk, df, "v", width=16, depth=4).collect()}
    true = {r["v"]: r["n"] for r in
            df.groupBy("v").agg(F.count("*").alias("n")).collect()}
    assert set(est) == set(true)
    assert all(est[v] >= n for v, n in true.items())   # one-sided error
    assert est["apple"] >= 50

    # mergeability: sketch(shard1) + sketch(shard2) == sketch(all),
    # cell by cell (exact longs, order-insensitive)
    h1 = df.filter(F.xxhash64("v") % 2 == 0)
    h2 = df.filter(F.xxhash64("v") % 2 != 0)
    merged = (count_min_sketch(h1, "v", 16, 4)
              .unionByName(count_min_sketch(h2, "v", 16, 4))
              .groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt")))
    whole = count_min_sketch(df, "v", 16, 4)
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, whole.collect())))
