"""Sketch-based aggregates: the approximate counterparts a 100 TB
deployment substitutes for exact distinct/quantile shuffles.

``count(DISTINCT x)`` needs every distinct value of x to meet in one
place — a full shuffle of the distinct set per group. HyperLogLog++
(``approx_count_distinct``) replaces that with a fixed ~1.5 kB sketch
per group that merges associatively, so the aggregation stays map-side
partial + tiny exchange no matter how many distinct values exist. The
reference's distinct-user / distinct-word counts (the A13 distinct and
the vocabulary sizing in InputParser.java:204-223) are the queries
this swaps into at scale.

The ``*_verified`` form computes BOTH the sketch and the exact answer
and emits a per-group within-tolerance verdict — that is what makes an
approximate operator oracle-checkable: the driver's DuckDB oracle
reproduces the exact side and expects every verdict to be true, so a
sketch regression (wrong rsd plumbing, broken merge) fails the gate
rather than drifting silently. Run it at test scale; run the pure
sketch form in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def approx_distinct_counts(
    df: DataFrame,
    keys: list[str],
    col: str,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-key HLL++ distinct count of ``col`` (relative standard
    deviation ``rsd``). One tiny exchange: sketches partial-aggregate
    map-side."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd).alias("n_approx"))


def approx_distinct_verified(
    df: DataFrame,
    keys: list[str],
    col: str,
    rsd: float = 0.05,
    tolerance_sds: float = 4.0,
) -> DataFrame:
    """Per-key exact distinct count plus a verdict that the HLL++
    estimate landed within ``tolerance_sds * rsd`` of it.

    Emits (keys..., n_exact, within_tol). Exact and sketch aggregate
    in the same pass (one shuffle). 4 standard deviations keeps the
    per-group false-alarm rate below ~1e-4 while still catching any
    real sketch defect, which shows up as orders-of-magnitude error.
    """
    out = df.groupBy(*keys).agg(
        F.countDistinct(col).alias("n_exact"),
        F.approx_count_distinct(col, rsd).alias("_n_approx"),
    )
    tol = float(tolerance_sds) * float(rsd)
    return out.select(
        *keys,
        "n_exact",
        (F.abs(F.col("_n_approx") - F.col("n_exact"))
         <= F.col("n_exact") * tol).alias("within_tol"),
    )


def binned_histogram(
    df: DataFrame,
    keys: list[str],
    col: str,
    bin_width: float = 1.0,
) -> DataFrame:
    """Per-key fixed-width value histogram: (keys..., bin, cnt) with
    ``bin = floor(col / bin_width)``.

    This is the mergeable quantile sketch of choice when values have a
    known scale: bin counts are exact longs whose merge is plain
    addition — commutative, associative, order-insensitive — so the
    SAME aggregation runs as a batch hash agg or a streaming windowed
    agg in append mode with bit-identical results (unlike KLL/t-digest,
    whose merges are order-sensitive and would break stream==batch
    parity). Exchange size is O(keys x bins), never O(rows).
    """
    return (
        df.groupBy(
            *keys,
            F.floor(F.col(col) / F.lit(float(bin_width))).alias("bin"))
        .agg(F.count("*").alias("cnt"))
    )


def histogram_quantiles(
    binned: DataFrame,
    keys: list[str],
    qs: list[float],
    bin_width: float = 1.0,
) -> DataFrame:
    """Reconstruct q-quantile estimates from ``binned_histogram``
    output: for each q, the first bin (ascending) whose cumulative
    count reaches ``q * n`` — i.e. the bin holding the value at
    discrete rank ``ceil(q * n)`` — interpolated linearly inside the
    bin. Emits (keys..., q, n, est).

    Two per-key ordered window scans over bin rows (O(bins), not
    O(rows)) plus a broadcast of the tiny q list; the estimate is
    within ``bin_width`` of the true rank-``ceil(q*n)`` value by
    construction (the emitted ``bin`` is the one holding that value).
    """
    w = float(bin_width)
    by_key = Window.partitionBy(*keys)
    run = by_key.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = (
        binned.withColumn("n", F.sum("cnt").over(by_key))
        .withColumn("cum", F.sum("cnt").over(run))
    )
    qdf = cum.select(
        *keys, "bin", "cnt", "n", "cum",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    ).withColumn("target", F.col("q") * F.col("n"))
    return (
        qdf.filter((F.col("cum") >= F.col("target"))
                   & (F.col("cum") - F.col("cnt") < F.col("target")))
        .select(
            *keys, "q", "n", "bin",
            F.round(
                F.col("bin") * w
                + w * (F.col("target") - (F.col("cum") - F.col("cnt")))
                / F.col("cnt"),
                6).alias("est"),
        )
    )


def histogram_quantiles_verified(
    df: DataFrame,
    keys: list[str],
    col: str,
    qs: list[float],
    bin_width: float = 1.0,
) -> DataFrame:
    """Histogram quantile estimate next to the EXACT discrete quantile
    (the value at rank ``ceil(q * n)``), with a ``within_bin`` verdict
    that the two share a bin — guaranteed true by construction, so any
    false verdict is a real plumbing regression (wrong cumsum frame,
    broken bin math, rank drift).

    Emits (keys..., q, n, est, exact, within_bin), where ``within_bin``
    compares the exact value's bin against the CHOSEN bin (not
    ``floor(est)``, whose interpolation legitimately touches the next
    bin's boundary when ``q * n`` lands exactly on a cumulative count).
    The exact side sorts
    each key's values once (row_number window) — the verification
    scaffold; production uses the histogram alone. The DuckDB oracle
    reproduces ``exact`` via ``quantile_disc`` and ``est`` via the same
    window SQL.
    """
    est = histogram_quantiles(
        binned_histogram(df, keys, col, bin_width), keys, qs, bin_width)
    rn = Window.partitionBy(*keys).orderBy(col)
    ranked = (
        df.select(*keys, col)
        .withColumn("_rn", F.row_number().over(rn))
        .withColumn("_n", F.count("*").over(Window.partitionBy(*keys)))
        .select(
            *keys, F.col(col).alias("exact"), "_rn", "_n",
            F.explode(
                F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
        )
        .filter(F.col("_rn") == F.ceil(F.col("q") * F.col("_n")))
        .select(*keys, "q", "exact")
    )
    return (
        est.join(ranked, [*keys, "q"])
        .select(
            *keys, "q", "n", "est",
            F.round("exact", 6).alias("exact"),
            (F.floor(F.col("exact") / F.lit(float(bin_width)))
             == F.col("bin")).alias("within_bin"),
        )
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold_frac: float = 0.001,
    capacity_factor: int = 4,
) -> DataFrame:
    """All values of ``col`` occurring in at least ``threshold_frac``
    of the rows, with their EXACT counts — without ever shuffling the
    full distinct set.

    Two-pass Misra-Gries: pass 1 builds one bounded summary per
    partition (``capacity_factor / threshold_frac`` counters,
    vectorized batch-decrement via pandas value_counts), merges the
    tiny summaries by key, and keeps the surviving candidates; pass 2
    broadcast-semi-joins the candidates back and counts them exactly.
    Summary math guarantees NO FALSE NEGATIVES: each partition summary
    underestimates any value by at most n_p/k, so the merged
    underestimate is at most N/k = N * threshold_frac /
    capacity_factor < N * threshold_frac — every true heavy hitter
    survives with a positive merged count, and the exact second pass
    removes all false positives. The output is therefore provably
    EQUAL to the exact ``GROUP BY ... HAVING count >= ceil(frac * N)``
    (the DuckDB oracle), while shuffling only
    O(partitions x k + |candidates|) rows instead of one row per
    distinct value — the difference between a vocabulary-sized and a
    corpus-sized exchange at 10^9+ distinct keys.

    Reference analog: the min-count dictionary filter
    (InputParser.java:204-223) is the threshold_count form of the same
    ask; this is its scale-safe generalization.
    """
    import math

    import pandas as pd

    k = max(8, int(math.ceil(capacity_factor / threshold_frac)))

    def partition_summary(pdf_iter):
        counters = pd.Series(dtype="int64")
        for pdf in pdf_iter:
            vc = pdf[col].value_counts()
            counters = counters.add(vc, fill_value=0)
            if len(counters) > k:
                # batch Misra-Gries decrement: subtract the (k+1)-th
                # largest count from EVERY counter and drop the
                # non-positive — each trim's cut is charged against
                # >= k+1 elements, so cumulative underestimate per
                # element stays <= n_p/(k+1) (mergeable-summaries
                # analysis, Agarwal et al., PODS'12)
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        if len(counters):
            yield pd.DataFrame({col: counters.index.to_numpy(),
                                "_lb": counters.to_numpy("int64")})

    in_type = dict(df.dtypes)[col]
    summaries = df.select(col).mapInPandas(
        partition_summary, schema=f"`{col}` {in_type}, _lb long")
    candidates = (summaries.groupBy(col).agg(F.sum("_lb").alias("_lb"))
                  .filter(F.col("_lb") > 0).select(col))
    total = df.select(F.count("*").alias("_n"))
    return (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col).agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.col("_n") * F.lit(threshold_frac)))
        .select(col, "cnt")
    )


def count_min_sketch(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch of a column as a RELATION: one row per
    (row, bucket) cell with its exact collision count — depth
    independent md5-derived hash rows of ``width`` buckets.

    Cells are exact longs whose merge is plain addition (commutative,
    associative, order-insensitive), so — like ``binned_histogram`` —
    the SAME aggregation runs batch or as a streaming windowed agg
    with bit-identical results, and shards of a corpus sketch
    independently then merge by summed union. Exchange is
    O(depth x width) cells, never O(distinct values): the point-
    frequency complement of HLL (cardinality) and Misra-Gries
    (top-k) at web scale.
    """
    from ..functions.textfns import hash60

    rows = F.explode(F.sequence(F.lit(0), F.lit(int(depth) - 1)))
    return (
        df.select(F.col(col).cast("string").alias("_v"))
        .withColumn("row", rows)
        .select(
            "row",
            F.pmod(hash60(F.concat_ws("|", F.lit("cm"), F.col("row"),
                                      F.col("_v"))),
                   F.lit(int(width))).alias("bucket"),
        )
        .groupBy("row", "bucket").agg(F.count("*").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    values: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates from a ``count_min_sketch`` relation:
    per input value, min over the depth rows of its cell counts —
    the classic CM upper bound (never under-counts; over-counts by
    collision mass, bounded by the standard e/width rate).

    The probe side fans each value to its depth cells and joins the
    sketch on (row, bucket) — sketch side is O(depth x width) rows,
    broadcastable at any corpus size.
    """
    from ..functions.textfns import hash60

    probes = (
        values.select(F.col(col).alias("value"))
        .distinct()
        .withColumn("row", F.explode(
            F.sequence(F.lit(0), F.lit(int(depth) - 1))))
        .withColumn(
            "bucket",
            F.pmod(hash60(F.concat_ws(
                "|", F.lit("cm"), F.col("row"),
                F.col("value").cast("string"))),
                F.lit(int(width))))
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
