"""Theme evolution graph: range-constrained theta self-join + KL kernel.

The reference computes an O(n²) RDD cartesian of all themes and filters
by (time-order, KL < threshold) — ``KLDivergence.java:40-72`` — and its
own report documents the quadratic wall (510 s at 500 themes,
report/evolutionGraph.tex:37-56). The rebuild replaces the cartesian
with an *equi-join on candidate window starts*: for a bounded gap of G
windows, each theme row explodes into G candidate successor
window_starts and hash-joins on equality — O(n·G) pairs, shuffle-
partitioned, AQE-balanced. The KL kernel runs as a vectorized pandas
UDF over the aligned probability arrays of each surviving pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .kernels import kl_divergence, tv_distance


def _batched_pair_divergence(
    w1, p1, w2, p2, kind: str, eps: float, log_max: float,
) -> np.ndarray:
    """One vectorized pass over an entire batch of (support, probs)
    pairs — no per-pair Python loop.

    Semantics are those of aligning each pair on the union of its two
    supports with eps smoothing for absent entries (KLDivergence.java:
    104-124), decomposed so the union never materializes: every entry
    of support-1 contributes against its match in support-2 (or eps),
    and support-2-only entries contribute the eps-vs-p2 term. Matches
    are found with ONE sort + searchsorted over composite
    (pair, word_id) keys across the whole batch; per-pair sums are
    ``np.bincount`` scatter-adds. O(nnz log nnz) for the batch, with
    every op a full-width numpy kernel — at 100x theme counts this is
    the difference between an Arrow-batch-bound and a Python-loop-bound
    transition join.
    """
    n_pairs = len(w1)
    out = np.zeros(n_pairs)
    if n_pairs == 0:
        return out
    len1 = np.fromiter((len(x) for x in w1), np.int64, n_pairs)
    len2 = np.fromiter((len(x) for x in w2), np.int64, n_pairs)
    ids1 = (np.concatenate([np.asarray(x, np.int64) for x in w1])
            if len1.sum() else np.empty(0, np.int64))
    pr1 = (np.concatenate([np.asarray(x, np.float64) for x in p1])
           if len1.sum() else np.empty(0))
    ids2 = (np.concatenate([np.asarray(x, np.int64) for x in w2])
            if len2.sum() else np.empty(0, np.int64))
    pr2 = (np.concatenate([np.asarray(x, np.float64) for x in p2])
           if len2.sum() else np.empty(0))
    seg1 = np.repeat(np.arange(n_pairs), len1)
    seg2 = np.repeat(np.arange(n_pairs), len2)
    # composite (pair, word) keys; word ids are dense ints << 2^40
    base = int(max(ids1.max(initial=0), ids2.max(initial=0))) + 1
    k1 = seg1 * base + ids1
    k2 = seg2 * base + ids2
    order2 = np.argsort(k2, kind="stable")
    k2s, pr2s, seg2s = k2[order2], pr2[order2], seg2[order2]
    pos = np.searchsorted(k2s, k1)
    pos_c = np.clip(pos, 0, max(k2s.size - 1, 0))
    matched = (k2s[pos_c] == k1) if k2s.size else np.zeros(k1.size, bool)
    b_for_1 = np.where(matched, pr2s[pos_c] if k2s.size else eps, eps)
    matched2 = np.zeros(k2s.size, dtype=bool)
    matched2[pos_c[matched]] = True
    if kind == "tv":
        # raw values, as in tv_distance over the scattered union arrays
        c1 = np.abs(pr1 - b_for_1)
        c2 = np.abs(eps - pr2s[~matched2])
        out = 0.5 * (np.bincount(seg1, weights=c1, minlength=n_pairs)
                     + np.bincount(seg2s[~matched2], weights=c2,
                                   minlength=n_pairs))
        return out
    # KL(next ‖ prev) with the kernel's max(., eps) + clamped-log rules
    a1 = np.maximum(pr1, eps)
    b1 = np.maximum(b_for_1, eps)
    with np.errstate(divide="ignore", invalid="ignore"):
        r1 = np.log(a1 / b1)
    r1 = np.clip(np.nan_to_num(r1, nan=log_max, posinf=log_max,
                               neginf=-log_max), -log_max, log_max)
    b2only = np.maximum(pr2s[~matched2], eps)
    with np.errstate(divide="ignore", invalid="ignore"):
        r2 = np.log(eps / b2only)
    r2 = np.clip(np.nan_to_num(r2, nan=log_max, posinf=log_max,
                               neginf=-log_max), -log_max, log_max)
    return (np.bincount(seg1, weights=a1 * r1, minlength=n_pairs)
            + np.bincount(seg2s[~matched2], weights=eps * r2,
                          minlength=n_pairs))


def _pair_divergence_udf(kind: str, eps: float, log_max: float):
    @F.pandas_udf(T.DoubleType())
    def div(w1: pd.Series, p1: pd.Series, w2: pd.Series, p2: pd.Series) -> pd.Series:
        return pd.Series(_batched_pair_divergence(
            w1.tolist(), p1.tolist(), w2.tolist(), p2.tolist(),
            kind, eps, log_max))

    return div


def theme_transitions(
    themes: DataFrame,
    window_length_seconds: int,
    max_gap_windows: int = 1,
    threshold: float = 8.0,
    divergence: str = "kl",
    eps: float = 1e-12,
    log_max: float = 27.0,
) -> DataFrame:
    """Edges (window1, theme1, window2, theme2, divergence) where window2
    starts within max_gap_windows after window1 ends and D < threshold.

    Equi-join on exploded candidate successor starts — never a cartesian.
    """
    t1 = themes.select(
        F.col("window_start").alias("window1"),
        F.col("theme_id").alias("theme1"),
        F.col("word_ids").alias("w1"),
        F.col("probs").alias("p1"),
    ).withColumn(
        "window2",
        F.explode(
            F.sequence(
                F.col("window1") + F.expr(f"INTERVAL {window_length_seconds} SECONDS"),
                F.col("window1")
                + F.expr(f"INTERVAL {max_gap_windows * window_length_seconds} SECONDS"),
                F.expr(f"INTERVAL {window_length_seconds} SECONDS"),
            )
        ),
    )
    t2 = themes.select(
        F.col("window_start").alias("window2"),
        F.col("theme_id").alias("theme2"),
        F.col("word_ids").alias("w2"),
        F.col("probs").alias("p2"),
    )
    div = _pair_divergence_udf(divergence, eps, log_max)
    return (
        t1.join(t2, "window2", "inner")
        .withColumn("divergence", div("w1", "p1", "w2", "p2"))
        .filter(F.col("divergence") < threshold)
        .select("window1", "theme1", "window2", "theme2", "divergence")
    )


def top_theme_words(themes: DataFrame, lexicon: DataFrame | None, k: int = 10,
                    min_word_length: int = 4, score: str = "p",
                    background=None, eps: float = 0.001) -> DataFrame:
    """O3/O7: top-k words per theme (row_number window), optionally
    resolved through a lexicon with the reference's min-length filter
    (Theme.java:85-102).

    ``score="p"`` ranks by raw theme probability. ``score="salience"``
    implements the reference's KL-salience feature selection
    (``Theme.java:186-219``): rank by ``p * log(p / p_bg_smoothed)``
    with ``p_bg_smoothed = (p_bg + eps) / (1 + V * eps)`` over the
    V-word background model. The reference runs k greedy argmax rounds
    over a *static* score with a strict ``> 0`` floor, which is exactly
    top-k by score among positive scores — no iteration needed, so the
    whole ranking stays in Catalyst (explode + broadcast join + window),
    no Python in the path.
    """
    from pyspark.sql import Window

    exploded = themes.select(
        "window_start", "theme_id",
        F.explode(F.arrays_zip("word_ids", "probs")).alias("wp"),
    ).select(
        "window_start", "theme_id",
        F.col("wp.word_ids").alias("word_id"),
        F.col("wp.probs").alias("p"),
    )
    if lexicon is not None:
        exploded = exploded.join(F.broadcast(lexicon), "word_id", "inner").filter(
            F.length("word") >= min_word_length)
    if score == "salience":
        if background is None:
            raise ValueError("score='salience' requires the background model")
        import pandas as pd

        spark = themes.sparkSession
        if isinstance(background, pd.DataFrame):
            bgdf = spark.createDataFrame(background[["word_id", "p"]])
        else:
            bgdf = background.select("word_id", "p")
        n_bg = bgdf.agg(F.count("*").alias("_v"))
        bgv = bgdf.select("word_id", F.col("p").alias("_p_bg")).crossJoin(
            F.broadcast(n_bg))
        exploded = (
            exploded.join(F.broadcast(bgv), "word_id", "left")
            .withColumn(
                "_p1",
                (F.coalesce(F.col("_p_bg"), F.lit(0.0)) + eps)
                / (F.lit(1.0) + F.coalesce(F.col("_v"), F.lit(0)) * eps))
            .withColumn("salience", F.col("p") * F.log(F.col("p") / F.col("_p1")))
            .filter(F.col("salience") > 0)   # strict floor, Theme.java:209
            .drop("_p_bg", "_p1", "_v")
        )
        order = [F.col("salience").desc(), F.col("word_id").asc()]
    elif score == "p":
        order = [F.col("p").desc(), F.col("word_id").asc()]
    else:
        raise ValueError(f"unknown score {score!r}")
    w = Window.partitionBy("window_start", "theme_id").orderBy(*order)
    return exploded.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k)
