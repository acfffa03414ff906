"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All pure Column expressions (codegen'd, no Python) with exact DuckDB
oracle equivalents. These generalize the reference's tokenizer/filter
stages (InputParser.java:94-107, 204-223) into the quality gates a
training-data pipeline runs before model consumption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import (
    EN_STOPWORDS,
    FR_STOPWORDS,
    ascii_words,
    stopword_ratio,
)

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def language_id(documents: DataFrame) -> DataFrame:
    """Heuristic language ID via stopword-hit ratios (n-gram-free
    variant; a trigram model drops in the same shape)."""
    words = ascii_words(F.lower(F.col("text")))
    en = stopword_ratio(words, EN_STOPWORDS)
    fr = stopword_ratio(words, FR_STOPWORDS)
    return documents.select(
        "doc_id",
        F.round(en, 6).alias("en_ratio"),
        F.round(fr, 6).alias("fr_ratio"),
        F.when(en >= fr, F.lit("en")).otherwise(F.lit("fr")).alias("pred_lang"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Length / punctuation / stopword quality features + a composite
    score in [0,1]. The score formula is arbitrary but fixed; what
    matters is that each feature is cheap, codegen'd, and pushdown-
    friendly (only `text` is read)."""
    words = ascii_words(F.col("text"))
    n_words = F.size(words)
    n_chars = F.length(F.col("text"))
    # sum of word lengths == length of the concatenation — pure codegen
    # string op instead of an interpreted per-element aggregate lambda
    avg_word_len = F.when(
        n_words > 0,
        F.length(F.array_join(words, "")) / n_words).otherwise(F.lit(0.0))
    punct = n_chars - F.length(F.regexp_replace(F.col("text"), r"[^a-zA-Z0-9\s]", ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop = stopword_ratio(words, EN_STOPWORDS)
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
        + F.least(stop * 5.0, F.lit(1.0)) * 0.3
    )
    return documents.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(avg_word_len, 6).alias("avg_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace and BPE-ish token counts per doc — the budget columns
    a training pipeline partitions/packs by."""
    ws = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""))
    bpe = F.size(F.regexp_extract_all(F.lower(F.col("text")),
                                      F.lit(BPE_ISH_PATTERN), 0))
    return documents.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Canonical content fingerprint: md5 over the sorted distinct word
    set (robust to word order / duplication — catches shuffled copies
    that exact_dedup misses)."""
    words = ascii_words(F.col("text"))
    canon = F.array_join(F.array_sort(F.array_distinct(words)), " ")
    return documents.select(
        "doc_id",
        F.md5(canon).alias("fingerprint"),
    )


def word_ngram_counts(
    documents: DataFrame, n: int = 2, min_count: int = 2
) -> DataFrame:
    """Corpus-level word n-gram frequencies — the LM-statistics sweep a
    training-data pipeline runs (vocabulary induction, contamination
    checks, repeated-boilerplate detection).

    Within-doc word order is preserved (unlike the bag-of-words A1
    aggregate): each doc contributes size-n sliding windows over its
    word list, then one corpus-wide hash agg with map-side partials —
    the same single-shuffle shape as word_count, rows bounded by total
    token count. Pure Column expressions (transform/slice/array_join),
    no Python.
    """
    ws = ascii_words(F.lower(F.col("text")))
    # guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty —
    # docs shorter than n must yield no grams, not reversed junk
    grams = F.expr(
        f"if(size(ws) >= {n}, "
        f"transform(sequence(1, size(ws) - {n - 1}), "
        f"i -> array_join(slice(ws, i, {n}), ' ')), "
        f"cast(array() as array<string>))")
    return (
        documents.select(ws.alias("ws"))
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
