"""Background model: corpus-wide word distribution.

Reference semantics (``input/BackgroundModel.java:24-88``): count every
token once across the corpus (A1), drop words below a corpus-count floor
(P3), normalize by the grand total (A2/A3). Here it is a hash aggregate
with automatic partial (map-side) aggregation plus a broadcast of the
1-row total — no single-partition window, no driver reduce, so the same
plan holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_counts(sequences: DataFrame) -> DataFrame:
    """(word_id, count) over the whole corpus. explode -> hash agg."""
    return (
        sequences.select(F.explode("tokens").alias("word_id"))
        .groupBy("word_id")
        .agg(F.count("*").alias("count"))
    )


def background_model(sequences: DataFrame, min_count: int = 30) -> DataFrame:
    """(word_id, count, p) with p = count / total over *kept* words.

    The total is a 1-row aggregate cross-joined back (broadcast by AQE):
    scale-safe, unlike `sum() over ()` which would shuffle everything to
    one partition. The reference computes count/total as an exact
    BigFraction then converts to double (BackgroundModel.java:82-87,
    EmInput.java:91-93); double division on bigint counts is bit-stable
    here because the inputs are exact integers.
    """
    counts = word_counts(sequences).filter(F.col("count") >= min_count)
    total = counts.agg(F.sum("count").alias("_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "word_id",
        "count",
        (F.col("count") / F.col("_total")).alias("p"),
    )


def count_histogram(sequences: DataFrame) -> DataFrame:
    """How many words occur c times, ordered by c (A10 —
    ``executables/BackgroundModelTest.java:56-75``)."""
    return (
        word_counts(sequences)
        .groupBy(F.col("count").alias("occurrences"))
        .agg(F.count("*").alias("n_words"))
        .orderBy("occurrences")
    )
