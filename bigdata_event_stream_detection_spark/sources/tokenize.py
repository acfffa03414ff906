"""Text -> tokenized-sequence adapter.

The engine's native input is the pre-tokenized sequences table
``(doc_id, tokens array<int32>, n_tok, source, event_time)``. This module
adapts a raw-text `documents` table into that shape: tokenize (the
reference splits on non-letters and lowercases — ``InputParser.java:
204-223``), build a dense dictionary (dense ids via a deterministic
``row_number``, replacing the reference's ``zipWithIndex`` at
``HmmInputFromParser.java:46-58``), encode, and derive a deterministic
event time. Everything is Column expressions + one broadcast join —
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_PATTERN = r"[^\p{L}]+"  # split on runs of non-letters (InputParser.java:207)


def words_column(text_col):
    """lowercase -> split on non-letters -> drop empties (pure Column expr)."""
    return F.filter(F.split(F.lower(text_col), TOKEN_PATTERN), lambda w: w != "")


def build_lexicon(documents: DataFrame, min_count: int = 1) -> DataFrame:
    """Dense word ids, deterministically ordered by (count desc, word asc).

    ``row_number`` over a total order gives dense, reproducible ids —
    unlike ``monotonically_increasing_id`` (and unlike the reference's
    partition-order-dependent ``zipWithIndex``). The lexicon is small
    (vocab-sized); the sort is cheap relative to the corpus scan.
    """
    counts = (
        documents.select(F.explode(words_column(F.col("text"))).alias("word"))
        .groupBy("word")
        .count()
        .filter(F.col("count") >= min_count)
    )
    w = Window.orderBy(F.col("count").desc(), F.col("word").asc())
    return counts.select(
        "word", (F.row_number().over(w) - 1).cast("int").alias("word_id")
    )


def documents_to_sequences(
    documents: DataFrame,
    lexicon: DataFrame | None = None,
    base_epoch: int = 1_420_070_400,
    step_seconds: int = 120,
) -> DataFrame:
    """Encode a raw-text documents table into the native sequences shape.

    event_time is derived deterministically from doc_id (the driver
    `documents` table carries no timestamp): base + doc_id * step.
    """
    lex = lexicon if lexicon is not None else build_lexicon(documents)
    tokens = (
        documents
        .select("doc_id", "source",
                F.posexplode(words_column(F.col("text"))).alias("pos", "word"))
        .join(F.broadcast(lex), "word", "inner")  # drops OOV words, like P4 semi-join
        .groupBy("doc_id", "source")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word_id"))),
                lambda s: s["word_id"],
            ).alias("tokens")
        )
    )
    return tokens.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("tokens").cast("array<int>"),
        F.size("tokens").cast("int").alias("n_tok"),
        "source",
        F.timestamp_seconds(
            F.lit(base_epoch) + F.col("doc_id").cast("long") * step_seconds
        ).alias("event_time"),
    )
