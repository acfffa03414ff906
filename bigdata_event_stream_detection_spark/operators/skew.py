"""Explicit partitioning + salt-based skew mitigation.

At 100 TB one "source" (a heavy newspaper / crawl domain) can hold most
rows; a plain hash shuffle on (source, window) pins that source's whole
window on one task or one state-store partition. The mitigation is the
standard two-phase salt: fan a heavy key out over ``salt_buckets``
sub-keys (deterministically, by hashing doc_id — never randomly, so
restarts and retries land rows in the same bucket), pre-aggregate per
(key, salt), then merge the per-salt partials.

AQE's skew-join splitting (enabled in session.py) covers *joins*; this
module covers *aggregations and grouped-state compute*, which AQE does
not rebalance.

Reference analog: the reference hand-tuned ``repartition(#windows)`` /
``repartition(numBlocks)`` (EmInputFromParser.java:36, EmAlgo.java:115,
KLDivergence.java:42) — the same concern, minus the skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame,
    salt_col: str = "salt",
    buckets: int = 16,
    by: str = "doc_id",
) -> DataFrame:
    """Deterministic salt bucket from a stable row key (xxhash64 mod n).

    Deterministic (vs ``rand()``) so task retries and checkpoint
    replays assign each row the same bucket — required for exactly-once
    semantics downstream.
    """
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(by)), F.lit(buckets)).cast("int"))


def detect_heavy_keys(
    df: DataFrame,
    key_cols: list[str],
    row_share: float = 0.5,
) -> DataFrame:
    """Keys holding more than ``row_share`` of the TOTAL row count
    (matching ``heavy_source_threshold`` semantics) — the candidates
    for salting. One cheap pre-pass aggregation."""
    total = df.count()
    return (
        df.groupBy(*key_cols).count()
        .filter(F.col("count") > row_share * total)
        .select(*key_cols)
    )


def salted_token_counts(
    sequences: DataFrame,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase per-source token count: partial agg per (source, salt),
    then merge. Same result as a direct groupBy('source') but no single
    reducer ever sees a heavy source's full row set.

    The model for salting any algebraic aggregate in this engine.
    """
    salted = with_salt(sequences, buckets=buckets)
    partial = salted.groupBy("source", "salt").agg(
        F.count("*").alias("pn"), F.sum("n_tok").alias("pt"))
    return partial.groupBy("source").agg(
        F.sum("pn").alias("n_docs"), F.sum("pt").alias("n_tokens"))


def repartition_for_state(
    df: DataFrame,
    num_partitions: int,
    *cols: str,
) -> DataFrame:
    """Explicit hash repartition on the grouped-state key columns so the
    exchange before applyInPandas(WithState) is sized deliberately
    (state-store partition count) instead of inheriting upstream
    parallelism."""
    return df.repartition(num_partitions, *[F.col(c) for c in cols])
