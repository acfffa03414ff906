"""Text -> tokenized-sequence adapter.

The engine's native input is the pre-tokenized sequences table
``(doc_id, tokens array<int32>, n_tok, source, event_time)``. This module
adapts a raw-text `documents` table into that shape: tokenize (the
reference splits on non-letters and lowercases — ``InputParser.java:
204-223``), build a dense dictionary (ids from a range-partitioned
sort + zipWithIndex — deterministic, unlike the reference's
partition-order ``zipWithIndex`` at ``HmmInputFromParser.java:46-58``),
encode, and derive a deterministic event time. Encoding is Column
expressions + one broadcast join — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = r"[^\p{L}]+"  # split on runs of non-letters (InputParser.java:207)


def words_column(text_col):
    """lowercase -> split on non-letters -> drop empties (pure Column expr)."""
    return F.filter(F.split(F.lower(text_col), TOKEN_PATTERN), lambda w: w != "")


def build_lexicon(documents: DataFrame, min_count: int = 1) -> DataFrame:
    """Dense word ids, deterministically ordered by (count desc, word asc).

    Ids are assigned as a range-partitioned sort + per-partition
    offsets — a global ``row_number`` window would move the whole
    vocabulary to ONE partition (Spark's "No Partition Defined for
    Window" cliff), which single-threads at web-scale vocab. Range
    partitions are globally ordered and each is sorted, so
    id = partition offset + local rank is the exact global dense rank
    at any parallelism; the sort key (count, word) is unique per row
    (word is unique), so ids are reproducible regardless of range
    boundaries. Unlike the reference's partition-order-dependent
    ``zipWithIndex`` (HmmInputFromParser.java:46-58), the total order
    makes the ids deterministic — and unlike an RDD ``zipWithIndex``
    the whole computation stays JVM-side: the only driver traffic is
    one row per shuffle partition (the offsets), not the vocabulary.
    The partition ids are stamped into the persisted rows BEFORE the
    offsets job, so the two passes can never disagree about placement
    (AQE may re-plan exchanges between jobs; cached data cannot move).
    """
    from pyspark.sql import Window

    from ..util import persist_once

    counts = (
        documents.select(F.explode(words_column(F.col("text"))).alias("word"))
        .groupBy("word")
        .count()
        .filter(F.col("count") >= min_count)
    )
    spark = documents.sparkSession
    order = [F.col("count").desc(), F.col("word").asc()]
    ordered = persist_once(
        counts.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id()))
    sizes = {r["_pid"]: r["n"] for r in
             ordered.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    if not sizes:
        return spark.createDataFrame([], "word string, word_id int")
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_map = F.create_map(
        *[F.lit(x) for pid in sorted(sizes) for x in (pid, offsets[pid])])
    w = Window.partitionBy("_pid").orderBy(*order)
    return (ordered
            .withColumn("word_id",
                        (F.row_number().over(w) - 1
                         + off_map[F.col("_pid")]).cast("int"))
            .select("word", "word_id"))


# Lexicons up to this size encode via a broadcast map *literal* — a
# single narrow projection, no explode/join/groupBy round trip. Larger
# vocabularies fall back to the join path (a map literal that size
# would bloat the plan).
_MAP_LITERAL_LIMIT = 20_000


def documents_to_sequences(
    documents: DataFrame,
    lexicon: DataFrame | None = None,
    base_epoch: int = 1_420_070_400,
    step_seconds: int = 120,
) -> DataFrame:
    """Encode a raw-text documents table into the native sequences shape.

    event_time is derived deterministically from doc_id (the driver
    `documents` table carries no timestamp): base + doc_id * step.

    Encoding strategy is adaptive: small lexicons become a broadcast
    ``create_map`` literal applied with ``transform`` (word order kept
    by construction, OOV words dropped by the null filter — the same
    semantics as the P4 semi-join); large ones take the
    posexplode -> broadcast join -> re-assemble path, whose shuffle is
    bounded by the token count.
    """
    lex = lexicon if lexicon is not None else build_lexicon(documents)
    # size probe: fetch at most LIMIT+1 rows to pick the strategy — the
    # full lexicon is only materialized on the map-literal path, so a
    # web-scale vocabulary never pays an unbounded driver collect here
    lex_rows = lex.limit(_MAP_LITERAL_LIMIT + 1).collect()
    if len(lex_rows) <= _MAP_LITERAL_LIMIT:
        pairs = []
        for r in lex_rows:
            pairs.append(F.lit(r["word"]))
            pairs.append(F.lit(r["word_id"]))
        lex_map = F.create_map(*pairs) if pairs else F.create_map()
        encoded = F.filter(
            F.transform(words_column(F.col("text")),
                        lambda w: lex_map[w]),
            lambda x: x.isNotNull(),
        )
        tokens = documents.select(
            "doc_id", "source", encoded.alias("tokens")
        ).filter(F.size("tokens") > 0)
    else:
        tokens = (
            documents
            .select("doc_id", "source",
                    F.posexplode(words_column(F.col("text")))
                    .alias("pos", "word"))
            .join(F.broadcast(lex), "word", "inner")  # drops OOV (P4)
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


def remap_token_ids(
    sequences: DataFrame,
    mapping: DataFrame,
    unk_id: int | None = None,
    token_col: str = "tokens",
) -> DataFrame:
    """Rewrite every token through an (old_id -> new_id) mapping — the
    tokenizer-migration / vocab-prune primitive (switch tokenizer
    versions, renumber after dropping rare words, fold tail ids into
    UNK). Order-preserving by construction.

    ``mapping`` is (old_id, new_id); ids absent from it become
    ``unk_id``, or are DROPPED when ``unk_id`` is None (the vocab-prune
    semantics). Same adaptive strategy as ``documents_to_sequences``:
    vocab-bounded mappings apply as one broadcast map literal inside a
    single ``transform`` projection (zero shuffle, zero Python); larger
    mappings take the posexplode -> join -> ordered re-assemble path,
    bounded by token count. ``n_tok`` is recomputed when present.
    """
    rows = mapping.limit(_MAP_LITERAL_LIMIT + 1).collect()
    unk = F.lit(None) if unk_id is None else F.lit(int(unk_id))
    if len(rows) <= _MAP_LITERAL_LIMIT:
        pairs = []
        for r in rows:
            pairs.append(F.lit(int(r["old_id"])))
            pairs.append(F.lit(int(r["new_id"])))
        m = F.create_map(*pairs) if pairs else F.create_map()
        remapped = F.filter(
            F.transform(F.col(token_col),
                        lambda t: F.coalesce(m[t], unk)),
            lambda x: x.isNotNull(),
        )
        out = sequences.withColumn(token_col, remapped)
    else:
        other = [c for c in sequences.columns if c != token_col]
        exploded = sequences.select(
            *other, F.posexplode(token_col).alias("pos", "_old"))
        joined = exploded.join(
            mapping.select(F.col("old_id").alias("_old"),
                           F.col("new_id").alias("_new")),
            "_old", "left"
        ).withColumn("_new", F.coalesce("_new", unk))
        joined = joined.filter(F.col("_new").isNotNull())
        agg = (
            joined.groupBy(*other)
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "_new"))),
                lambda s: s["_new"]).alias(token_col))
        )
        # a doc whose every token dropped still gets a row (empty
        # array) — same semantics as the map-literal path
        arr_type = sequences.schema[token_col].dataType.simpleString()
        out = (
            sequences.select(*other)
            .join(agg, other, "left")
            .withColumn(token_col, F.coalesce(
                F.col(token_col),
                F.expr(f"CAST(array() AS {arr_type})")))
            .select(*sequences.columns)
        )
    if "n_tok" in out.columns:
        out = out.withColumn("n_tok", F.size(token_col))
    return out
