"""Corpus n-gram frequency operator (text.word_ngram_counts)."""

from __future__ import annotations

from bigdata_event_stream_detection_spark.operators.text import (
    word_ngram_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], "doc_id string, text string")


def test_bigrams_preserve_order_and_count(spark):
    docs = _docs(spark, ["the cat sat", "the cat ran", "cat the"])
    got = {r["ngram"]: r["cnt"]
           for r in word_ngram_counts(docs, n=2, min_count=1).collect()}
    assert got == {"the cat": 2, "cat sat": 1, "cat ran": 1, "cat the": 1}


def test_short_docs_yield_no_grams_not_reversed_junk(spark):
    # a doc shorter than n must contribute nothing: Spark's
    # sequence(1, 0) is DESCENDING, so an unguarded transform would
    # emit phantom grams here
    docs = _docs(spark, ["one", "", "a b c"])
    got = {r["ngram"]: r["cnt"]
           for r in word_ngram_counts(docs, n=3, min_count=1).collect()}
    assert got == {"a b c": 1}


def test_min_count_filters(spark):
    docs = _docs(spark, ["x y", "x y", "y z"])
    got = {r["ngram"]: r["cnt"]
           for r in word_ngram_counts(docs, n=2, min_count=2).collect()}
    assert got == {"x y": 2}
