"""Corpus n-gram frequency, cross-entropy, and repetition operators."""

from __future__ import annotations

import math

from bigdata_event_stream_detection_spark.operators.text import (
    cross_entropy_scores,
    repetition_stats,
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


def test_cross_entropy_matches_hand_computation(spark):
    # corpus: a=3 b=2 c=1; min_count=2 keeps {a,b}, total=5
    # p(a)=0.6 p(b)=0.4, OOV floor = 1/5 = 0.2
    docs = _docs(spark, ["a a b", "a b c"])
    got = {r["doc_id"]: r for r in
           cross_entropy_scores(docs, min_count=2).collect()}
    d0 = -(2 * math.log(0.6) + math.log(0.4)) / 3
    d1 = -(math.log(0.6) + math.log(0.4) + math.log(0.2)) / 3
    assert got["d0"]["n_tok"] == 3
    assert got["d0"]["cross_entropy"] == round(d0, 6)
    assert got["d0"]["oov_frac"] == 0.0
    assert got["d1"]["cross_entropy"] == round(d1, 6)
    assert got["d1"]["oov_frac"] == round(1 / 3, 6)
    # gibberish (all-OOV) must score strictly worse than fluent text
    assert got["d1"]["cross_entropy"] > got["d0"]["cross_entropy"]


def test_repetition_stats_flags_within_doc_duplication(spark):
    docs = _docs(spark, ["a a a b", "x", ""])
    got = {r["doc_id"]: r for r in repetition_stats(docs, n=2).collect()}
    # d0: bigrams [a a, a a, a b] -> 3 total, 2 distinct
    assert got["d0"]["n_words"] == 4
    assert got["d0"]["top_word_frac"] == 0.75
    assert got["d0"]["dup_ngram_frac"] == round(1 - 2 / 3, 6)
    # single-word doc: no grams -> 0.0, not null; empty doc: no row
    assert got["d1"]["top_word_frac"] == 1.0
    assert got["d1"]["dup_ngram_frac"] == 0.0
    assert "d2" not in got


def test_pii_counts_and_redaction(spark):
    from bigdata_event_stream_detection_spark.operators.text import pii_counts

    docs = _docs(spark, [
        "contact bob@example.com or see https://example.com/x now",
        "call +41 22 123 4567 today",
        "nothing sensitive here",
    ])
    got = {r["doc_id"]: r for r in pii_counts(docs).collect()}
    assert (got["d0"]["n_emails"], got["d0"]["n_urls"]) == (1, 1)
    assert got["d0"]["redacted"] == "contact <EMAIL> or see <URL> now"
    assert got["d1"]["n_phones"] == 1
    assert got["d1"]["redacted"] == "call <PHONE> today"
    assert got["d2"]["redacted"] == "nothing sensitive here"
    assert (got["d2"]["n_emails"], got["d2"]["n_urls"],
            got["d2"]["n_phones"]) == (0, 0, 0)


def test_quality_gate_keeps_top_quantile(spark):
    from bigdata_event_stream_detection_spark.operators.text import (
        quality_percentile_gate,
        quality_scores,
    )

    # 20 docs with strictly increasing quality (more stopword-rich
    # well-formed words => higher composite score)
    texts = ["the and of to in is on for with a " * (i + 1)
             for i in range(20)]
    docs = _docs(spark, texts)
    kept = quality_percentile_gate(docs, p=0.5).collect()
    scores = {r["doc_id"]: r["quality_score"]
              for r in quality_scores(docs).collect()}
    cutoff = kept[0]["cutoff"]
    expect = {d for d, s in scores.items() if s >= cutoff}
    assert {r["doc_id"] for r in kept} == expect
    assert 0 < len(kept) < 20
    # everything excluded scores strictly below everything kept
    worst_kept = min(r["quality_score"] for r in kept)
    assert all(s < worst_kept
               for d, s in scores.items() if d not in expect)


def test_corpus_stats_card(spark):
    from bigdata_event_stream_detection_spark.operators.text import corpus_stats

    docs = spark.createDataFrame(
        [("d0", "aa bb", 5), ("d1", "bb cc dd", 8), ("d2", "aa", 2),
         ("d3", "ee ff gg hh", 11)],
        "doc_id string, text string, n_chars int")
    row = corpus_stats(docs).collect()[0]
    assert row["n_docs"] == 4
    assert row["n_distinct_words"] == 8  # aa bb cc dd ee ff gg hh
    assert row["total_ws_tokens"] == 2 + 3 + 1 + 4
    # n_chars sorted: 2,5,8,11 -> p50 = 5 + 0.5*(8-5) = 6.5
    assert row["p50_chars"] == 6.5
    assert row["p90_chars"] == 8 + 0.7 * 3


def test_tfidf_top_terms_hand_computed(spark):
    import math

    from bigdata_event_stream_detection_spark.operators.text import (
        tfidf_top_terms,
    )

    docs = spark.createDataFrame(
        [("d1", "apple apple banana"), ("d2", "banana cherry"),
         ("d3", "cherry cherry cherry")],
        "doc_id string, text string")
    rows = {(r["doc_id"], r["rank"]): (r["word"], r["score"])
            for r in tfidf_top_terms(docs, k=2).collect()}
    idf = lambda df: math.log(4.0 / (df + 1.0)) + 1.0
    # d1: apple tf 2/3, df 1; banana tf 1/3, df 2
    assert rows[("d1", 1)] == ("apple", round(2 / 3 * idf(1), 6))
    assert rows[("d1", 2)] == ("banana", round(1 / 3 * idf(2), 6))
    # d2: equal scores (tf 1/2, df 2) -> alphabetical tiebreak
    assert rows[("d2", 1)][0] == "banana"
    assert rows[("d2", 2)][0] == "cherry"
    # d3: single word, tf 1
    assert rows[("d3", 1)] == ("cherry", round(1.0 * idf(2), 6))
    assert ("d3", 2) not in rows


def test_bigram_perplexity_matches_hand_computation(spark):
    from bigdata_event_stream_detection_spark.operators.text import (
        bigram_perplexity,
    )

    # corpus: "a b" x2 and "a c" x1 -> bigram "a b" kept (c12=2),
    # "a c" dropped by min_count=2. unigrams: a=3, b=2, c=1, z=1, T=7.
    docs = _docs(spark, ["a b", "a b", "a c", "z"])
    got = {r["doc_id"]: r for r in bigram_perplexity(
        docs, min_count=2, lam=0.7).collect()}

    # "z" has one word -> no transitions -> no row
    assert set(got) == {"d0", "d1", "d2"}

    # d0/d1 transition a->b: p = .7*(2/3) + .3*(2/7)
    p_ab = 0.7 * (2 / 3) + 0.3 * (2 / 7)
    ce_ab = -math.log(p_ab)
    for d in ("d0", "d1"):
        assert got[d]["n_transitions"] == 1
        assert got[d]["bigram_ce"] == round(ce_ab, 6)
        assert got[d]["bigram_ppl"] == round(math.exp(ce_ab), 2)
        assert got[d]["hit_frac"] == 1.0

    # d2 transition a->c: bigram dropped -> pure unigram backoff
    p_ac = 0.3 * (1 / 7)
    assert got["d2"]["bigram_ce"] == round(-math.log(p_ac), 6)
    assert got["d2"]["hit_frac"] == 0.0

    # ordering sensitivity: same bag of words, scrambled order ->
    # strictly higher perplexity than the fluent original
    fluent = ["the cat sat on the mat"] * 6 + ["mat the on sat cat the"]
    scram = bigram_perplexity(_docs(spark, fluent), min_count=2, lam=0.7)
    rows = {r["doc_id"]: r["bigram_ce"] for r in scram.collect()}
    assert rows["d6"] > rows["d0"]


def test_pmi_collocations_hand_computed(spark):
    from bigdata_event_stream_detection_spark.operators.text import (
        pmi_collocations,
    )

    # "strong coffee" always together (perfect association);
    # "the cat" co-occurs but both words are everywhere (low PMI)
    docs = _docs(spark, [
        "strong coffee the cat", "strong coffee cat the",
        "the cat strong coffee", "cat the strong coffee",
    ])
    got = pmi_collocations(docs, min_pair_count=2, k=3).collect()
    rows = {(r["w1"], r["w2"]): (r["c12"], r["pmi"]) for r in got}

    # totals: T1 = 16 tokens (each word x4), T2 = 12 adjacent pairs
    # (strong,coffee): c12=4 -> pmi = ln((4/12)/((4/16)^2)) = ln(16/3)
    assert ("strong", "coffee") in rows
    c12, pmi = rows[("strong", "coffee")]
    assert c12 == 4
    assert pmi == round(math.log((4 / 12) / ((4 / 16) * (4 / 16))), 6)
    # the perfect collocation outranks the incidental one
    top = max(rows.items(), key=lambda kv: kv[1][1])[0]
    assert top == ("strong", "coffee")


def test_skipgram_cooccurrence_weights(spark):
    from bigdata_event_stream_detection_spark.operators.text import (
        skipgram_cooccurrence,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "a")],       # 1-word doc contributes nothing
        "doc_id long, text string")
    got = {(r["w1"], r["w2"]): r["weight"]
           for r in skipgram_cooccurrence(
               docs, window=2, min_weight=0.0).collect()}
    # a b c a, window 2: (a,b)@1, (a,c)@2, (b,c)@1, (b,a)@2, (c,a)@1
    assert got == {("a", "b"): 1.0, ("a", "c"): 0.5,
                   ("b", "c"): 1.0, ("b", "a"): 0.5, ("c", "a"): 1.0}
    # min_weight cuts the tail
    kept = {(r["w1"], r["w2"])
            for r in skipgram_cooccurrence(
                docs, window=2, min_weight=1.0).collect()}
    assert kept == {("a", "b"), ("b", "c"), ("c", "a")}


def test_token_sequence_stats_closed_form(spark):
    import math

    from bigdata_event_stream_detection_spark.operators.text import (
        token_sequence_stats,
    )

    seqs = spark.createDataFrame(
        [("d1", [7, 7, 7, 7]),        # degenerate: one token
         ("d2", [1, 2, 3, 4]),        # all distinct
         ("d3", [1, 2, 1, 2, 1]),     # repeated bigrams
         ("d4", [9])],                # single token: no bigrams
        "doc_id string, tokens array<int>")
    got = {r["doc_id"]: r for r in token_sequence_stats(seqs).collect()}

    assert got["d1"]["distinct_frac"] == 0.25
    assert got["d1"]["top_share"] == 1.0
    assert got["d1"]["entropy"] == 0.0
    assert got["d1"]["dup_bigram_frac"] == round(1 - 1 / 3, 6)

    assert got["d2"]["distinct_frac"] == 1.0
    assert got["d2"]["top_share"] == 0.25
    assert got["d2"]["entropy"] == round(math.log(4), 6)
    assert got["d2"]["dup_bigram_frac"] == 0.0

    # d3: bigrams (1,2)(2,1)(1,2)(2,1) -> 2 distinct of 4
    assert got["d3"]["dup_bigram_frac"] == 0.5
    assert got["d3"]["top_share"] == 0.6

    assert got["d4"]["n_tok"] == 1
    assert got["d4"]["dup_bigram_frac"] == 0.0
