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


def quality_score_col(text_col=None):
    """The composite quality score as a reusable Column expression
    (rounded to 6dp, identical to the ``quality_score`` column of
    ``quality_scores``) — stateless, so it applies unchanged to a
    streaming DataFrame (streaming/curation.py)."""
    t = F.col("text") if text_col is None else text_col
    words = ascii_words(t)
    n_words = F.size(words)
    n_chars = F.length(t)
    punct = n_chars - F.length(F.regexp_replace(t, r"[^a-zA-Z0-9\s]", ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop = stopword_ratio(words, EN_STOPWORDS)
    return F.round(
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
        + F.least(stop * 5.0, F.lit(1.0)) * 0.3, 6)


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
    return documents.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(avg_word_len, 6).alias("avg_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop, 6).alias("stopword_ratio"),
        quality_score_col().alias("quality_score"),
    )


def corpus_stats(documents: DataFrame) -> DataFrame:
    """One-row dataset card: doc / distinct-word / token totals plus
    length quantiles — the summary block a training-data release ships
    with.

    Two full-scan aggregates (doc-level + exploded distinct-word)
    broadcast-joined into one row. The exact ``count(distinct)`` /
    ``percentile`` forms are kept because the oracle needs bit-equal
    answers; at 100 TB swap them for ``approx_count_distinct`` (HLL++)
    and ``approx_percentile`` (mergeable sketches, same plan shape,
    no single-point buffering).
    """
    doc_agg = documents.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.filter(F.split(F.col("text"), r"\s+"),
                              lambda t: t != ""))).alias("total_ws_tokens"),
        F.round(F.percentile("n_chars", F.lit(0.5)), 6).alias("p50_chars"),
        F.round(F.percentile("n_chars", F.lit(0.9)), 6).alias("p90_chars"),
    )
    word_agg = (
        documents.select(
            F.explode(ascii_words(F.lower(F.col("text")))).alias("word"))
        .agg(F.count_distinct("word").alias("n_distinct_words"))
    )
    return doc_agg.join(F.broadcast(word_agg)).select(
        "n_docs", "n_distinct_words", "total_ws_tokens",
        "p50_chars", "p90_chars")


def quality_percentile_gate(
    documents: DataFrame, p: float = 0.75, exact: bool = True
) -> DataFrame:
    """Corpus-relative quality gate: keep docs whose composite quality
    score is at or above the corpus p-quantile.

    Absolute thresholds drift across corpora; a percentile cut is the
    curation knob that survives a data-mix change ("keep the best
    quarter"). The cutoff is a one-row aggregate broadcast back over
    the scores — no driver collect, no re-scan. ``exact=True`` uses
    ``percentile`` (linear interpolation, matches DuckDB
    ``quantile_cont``; buffers values per group, fine to ~10^8 rows);
    at 100 TB use ``exact=False`` → ``approx_percentile`` (mergeable
    KLL-style sketch, bounded memory, same plan shape).
    """
    scores = quality_scores(documents)
    qcol = (F.percentile("quality_score", F.lit(p)) if exact
            else F.approx_percentile("quality_score", F.lit(p), F.lit(10000)))
    cut = scores.agg(F.round(qcol, 6).alias("cutoff"))
    return (
        scores.join(F.broadcast(cut))
        .filter(F.col("quality_score") >= F.col("cutoff"))
        .select("doc_id", "quality_score", "cutoff")
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


# PII patterns kept dialect-portable (character classes + bounded
# repetition only — no lookaround/backrefs), so Java regex (Spark) and
# RE2 (DuckDB oracle) agree match-for-match
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL = r"https?://[^ \t\n]+"
PII_PHONE = r"\+[0-9][0-9() -]{6,}[0-9]"


def redact_pii_col(text_col=None):
    """The PII-redacted text as a reusable Column expression (matches
    replaced by <EMAIL>/<URL>/<PHONE> sentinels, email first so a URL
    containing an @ is not re-matched) — stateless, streams unchanged."""
    t = F.col("text") if text_col is None else text_col
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"),
            PII_URL, "<URL>"),
        PII_PHONE, "<PHONE>")


def pii_counts(documents: DataFrame) -> DataFrame:
    """PII scrub pass: per-doc email/URL/phone match counts plus the
    redacted text (matches replaced by <EMAIL>/<URL>/<PHONE> sentinels,
    applied in that order so a URL containing an @ is not re-matched).

    Pure codegen'd regexp expressions — no shuffle, no Python; the scan
    reads only (doc_id, text). Conservative patterns by design: this is
    the cheap always-on pass, not a recall-tuned NER stage (that slots
    in as a mapInPandas kernel like multimodal.extract_features).
    """
    t = F.col("text")
    redacted = redact_pii_col(t)
    return documents.select(
        "doc_id",
        F.regexp_count(t, F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(t, F.lit(PII_URL)).alias("n_urls"),
        F.regexp_count(t, F.lit(PII_PHONE)).alias("n_phones"),
        redacted.alias("redacted"),
    )


def cross_entropy_scores(
    documents: DataFrame, min_count: int = 5
) -> DataFrame:
    """CCNet-style perplexity-proxy quality filter: per-doc unigram
    cross-entropy against the corpus background model.

    Reuses the engine's background-model shape (InputParser.java:204-223
    min-count dictionary + normalize): corpus word counts with
    ``cnt >= min_count`` become ``p(w) = cnt/total``; out-of-vocabulary
    words get the ``1/total`` floor. Per doc we emit

    - ``n_tok``        — ascii-word count
    - ``cross_entropy``— ``-avg(ln p(w))`` (low = fluent/common text,
                         high = gibberish or heavy OOV — the CCNet
                         head/middle/tail split keys off exactly this)
    - ``oov_frac``     — fraction of tokens outside the kept vocabulary

    Scale shape: two scans of the corpus (one to build the model, one to
    score), one equi-join words->vocab (AQE broadcasts the vocab side
    when it fits — it is bounded by the min-count filter), one hash agg
    on doc_id with map-side partials. No Python, no driver collect; the
    scalar total rides a broadcast crossJoin like background_model.
    """
    words = documents.select(
        "doc_id", F.explode(ascii_words(F.col("text"))).alias("word"))
    counts = (
        words.groupBy("word").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    total = counts.agg(F.sum("cnt").alias("_total"))
    scored = (
        words.join(counts, "word", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.coalesce(F.col("cnt") / F.col("_total"),
                       F.lit(1.0) / F.col("_total")).alias("p"),
            F.when(F.col("cnt").isNull(), F.lit(1.0))
             .otherwise(F.lit(0.0)).alias("oov"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.round(-F.avg(F.log("p")), 6).alias("cross_entropy"),
        F.round(F.avg("oov"), 6).alias("oov_frac"),
    )


def bigram_perplexity(
    documents: DataFrame,
    min_count: int = 2,
    lam: float = 0.7,
) -> DataFrame:
    """Interpolated bigram-LM perplexity per document — the next-order
    CCNet-style fluency signal after ``cross_entropy_scores``: a doc of
    common words in an *unusual order* scores high here while the
    unigram filter waves it through.

    Model (trained on the scored corpus itself, the standard
    self-perplexity sweep): ``p(w2|w1) = lam * c(w1 w2)/c(w1)
    + (1-lam) * c(w2)/T`` where bigram counts below ``min_count`` are
    dropped (back off to the unigram term — interpolation keeps every
    transition probability strictly positive). Per doc over its n-1
    transitions:

    - ``n_transitions`` — word-bigram count
    - ``bigram_ce``     — ``-avg(ln p)``
    - ``bigram_ppl``    — ``exp(bigram_ce)``
    - ``hit_frac``      — fraction of transitions with a kept bigram

    Docs with fewer than 2 ascii words emit no row (no transitions —
    consistent with cross_entropy_scores' empty-doc behavior).

    Scale shape: two corpus scans (train + score); the unigram table is
    vocab-bounded and the bigram table is min-count-bounded, so both
    model joins are equi-joins against tables far smaller than the
    corpus (AQE broadcasts them when they fit); the scalar token total
    rides a broadcast crossJoin; one doc_id hash agg with map-side
    partials. Pure Column expressions throughout — no Python, no
    driver collect.
    """
    ws = ascii_words(F.col("text"))
    toks = documents.select(
        "doc_id", F.explode(ws).alias("word"))
    uni = toks.groupBy("word").agg(F.count("*").alias("c1"))
    total = uni.agg(F.sum("c1").cast("bigint").alias("_total"))
    big = (
        word_ngram_counts(documents, n=2, min_count=min_count)
        .select(
            F.split_part(F.col("ngram"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("ngram"), F.lit(" "), F.lit(2)).alias("w2"),
            F.col("cnt").alias("c12"),
        )
    )
    trans = (
        documents.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(F.expr(
                "transform(sequence(1, size(ws) - 1), "
                "i -> struct(ws[i-1] as w1, ws[i] as w2))")).alias("t"))
        .select("doc_id", "t.w1", "t.w2")
    )
    scored = (
        trans
        .join(big, ["w1", "w2"], "left")
        .join(uni.withColumnRenamed("word", "w1"), "w1")
        .join(uni.select(F.col("word").alias("w2"),
                         F.col("c1").alias("c2")), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            (F.lit(lam) * F.coalesce(F.col("c12") / F.col("c1"), F.lit(0.0))
             + F.lit(1.0 - lam) * F.col("c2") / F.col("_total")).alias("p"),
            F.when(F.col("c12").isNull(), F.lit(0.0))
             .otherwise(F.lit(1.0)).alias("hit"),
        )
    )
    ce = -F.avg(F.log("p"))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_transitions"),
        F.round(ce, 6).alias("bigram_ce"),
        F.round(F.exp(ce), 2).alias("bigram_ppl"),
        F.round(F.avg("hit"), 6).alias("hit_frac"),
    )


def repetition_stats(documents: DataFrame, n: int = 2) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    repetition-removal rules, re-expressed as Spark aggregates):

    - ``top_word_frac``   — most frequent word's share of the doc's tokens
    - ``dup_ngram_frac``  — ``1 - distinct n-grams / total n-grams``
                            (word n-grams, default bigrams)

    High values on either flag boilerplate / degenerate repetition that
    exact and near dedup miss because it repeats *within* one document.

    The n-gram fraction is a pure Column expression (transform/slice/
    array_distinct — codegen'd per row, no shuffle); the top-word share
    is a (doc_id, word) hash agg then a doc_id hash agg — the same
    bounded single-shuffle shape as word_count. Docs with zero ascii
    words produce no row (consistent with cross_entropy_scores).
    """
    ws = ascii_words(F.col("text"))
    grams = F.expr(
        f"if(size(ws) >= {n}, "
        f"transform(sequence(1, size(ws) - {n - 1}), "
        f"i -> array_join(slice(ws, i, {n}), ' ')), "
        f"cast(array() as array<string>))")
    gram_stats = (
        documents.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") > 0)
        .select(
            "doc_id",
            F.when(F.size(grams) > 0,
                   1.0 - F.size(F.array_distinct(grams)) / F.size(grams))
             .otherwise(F.lit(0.0)).alias("dup_raw"),
        )
    )
    per_word = (
        documents.select(
            "doc_id", F.explode(ascii_words(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word").agg(F.count("*").alias("cnt"))
    )
    top = per_word.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_words"), F.max("cnt").alias("max_cnt"))
    return gram_stats.join(top, "doc_id").select(
        "doc_id",
        F.col("n_words"),
        F.round(F.col("max_cnt") / F.col("n_words"), 6).alias("top_word_frac"),
        F.round(F.col("dup_raw"), 6).alias("dup_ngram_frac"),
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


def tfidf_top_terms(documents: DataFrame, k: int = 5) -> DataFrame:
    """Top-k TF-IDF keywords per document.

    score = (tf / doc_len) * (ln((N + 1) / (df + 1)) + 1) — the
    smoothed-idf variant that never divides by zero and keeps
    corpus-wide terms at a positive floor. Generalizes the reference's
    KL-salience ranking (Theme.java:186-219 ranks theme words against
    the corpus background; TF-IDF ranks document words against the
    corpus) into the per-document keyword extraction a curation
    pipeline uses for clustering / topic tagging.

    Scale shape: tokenize runs ONCE — the (doc_id, word) counts are
    persisted (memory-and-disk) because Catalyst does not reuse the
    count exchange between the score branch and the df branch, and
    re-tokenizing the corpus is the dominant cost at scale. The
    document-frequency aggregation then collapses map-side to vocab
    size and is BROADCAST back (never a big-table shuffle); the corpus
    doc count rides a broadcast 1-row crossJoin; doc length and the
    top-k rank share ONE doc_id exchange (same Window partitioning,
    WindowGroupLimit prunes before the final sort). No Python, no
    driver collect.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    wc = (
        documents.select("doc_id",
                         F.explode(ascii_words(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    df = wc.groupBy("word").agg(F.count("*").alias("df"))
    n_docs = documents.agg(F.count("*").alias("n_docs"))
    by_doc = Window.partitionBy("doc_id")
    scored = (
        wc.join(F.broadcast(df), "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf") / F.sum("tf").over(by_doc))
            * (F.log((F.col("n_docs") + F.lit(1.0))
                     / (F.col("df") + F.lit(1.0))) + F.lit(1.0)))
        .withColumn(
            "rank",
            F.row_number().over(
                by_doc.orderBy(F.desc("score"), F.asc("word"))))
        .filter(F.col("rank") <= k)
    )
    return scored.select("doc_id", "rank", "word",
                         F.round("score", 6).alias("score"))


def pmi_collocations(
    documents: DataFrame,
    min_pair_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information — the
    phrase-mining sweep (Church & Hanks 1990) a pipeline runs before
    multi-word tokenization or entity normalization:

    ``pmi(w1,w2) = ln( (c12/T2) / ((c1/T1)*(c2/T1)) )`` with c12 over
    adjacent in-doc pairs (T2 pairs total), c1/c2 unigram counts
    (T1 tokens total). Pairs below ``min_pair_count`` are dropped
    (low-count PMI is noise by construction).

    Scale shape: the pair table is min-count-bounded and the unigram
    table vocab-bounded, so both joins run against small sides (AQE
    broadcasts); the two scalar totals ride 1-row broadcasts; ranking
    is a TakeOrderedAndProject over the surviving pair table. One
    corpus scan feeds both count tables.
    """
    ws = ascii_words(F.col("text"))
    toks = documents.select(F.explode(ws).alias("word"))
    uni = toks.groupBy("word").agg(F.count("*").alias("c1"))
    t1 = uni.agg(F.sum("c1").cast("bigint").alias("_t1"))
    big = (
        word_ngram_counts(documents, n=2, min_count=min_pair_count)
        .select(
            F.split_part(F.col("ngram"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("ngram"), F.lit(" "), F.lit(2)).alias("w2"),
            F.col("cnt").alias("c12"),
        )
    )
    t2 = (
        documents.select(ws.alias("ws"))
        .agg(F.sum(F.greatest(F.size("ws") - 1, F.lit(0)))
             .cast("bigint").alias("_t2"))
    )
    scored = (
        big
        .join(uni.withColumnRenamed("word", "w1"), "w1")
        .join(uni.select(F.col("word").alias("w2"),
                         F.col("c1").alias("c2")), "w2")
        .crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
        .select(
            "w1", "w2", "c12",
            F.round(
                F.log((F.col("c12") / F.col("_t2"))
                      / ((F.col("c1") / F.col("_t1"))
                         * (F.col("c2") / F.col("_t1")))), 6).alias("pmi"),
        )
    )
    return (
        scored.orderBy(F.col("pmi").desc(), F.col("w1").asc(),
                       F.col("w2").asc())
        .limit(k)
    )


def skipgram_cooccurrence(
    documents: DataFrame,
    window: int = 5,
    min_weight: float = 5.0,
    text_col: str = "text",
) -> DataFrame:
    """GloVe-style distance-weighted co-occurrence counts (Pennington
    et al., EMNLP'14): every (center, context-at-offset-k) pair inside
    a ``window``-word context contributes weight 1/k; pairs below
    ``min_weight`` total are cut (the long tail carries no signal and
    dominates the row count).

    The pair stream is generated ENTIRELY in-row — a nested
    transform/flatten over the word array — so there is no positions
    self-join and no token-table shuffle: the only exchange is the
    final (w1, w2) hash agg with map-side partials. Work and output
    are bounded by tokens x window. Directed (center -> context)
    counts; sum the two orientations for the symmetric matrix.
    """
    ws = ascii_words(F.col(text_col))
    n = F.size(ws)
    pairs = F.flatten(F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.transform(
            F.sequence(F.lit(1),
                       F.least(F.lit(int(window)), n - i)),
            lambda k: F.struct(
                F.element_at(ws, i).alias("w1"),
                F.element_at(ws, (i + k).cast("int")).alias("w2"),
                (F.lit(1.0) / k).alias("w")),
        ),
    ))
    return (
        documents.filter(n >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2", "p.w")
        .groupBy("w1", "w2")
        .agg(F.round(F.sum("w"), 6).alias("weight"))
        .filter(F.col("weight") >= float(min_weight))
    )


def token_sequence_stats(
    sequences: DataFrame,
    token_col: str = "tokens",
) -> DataFrame:
    """Quality signals computable from PRE-TOKENIZED sequences alone —
    the north-rule input shape carries no raw text, so the text-side
    heuristics (quality_scores, repetition_stats) don't apply; these
    are their token-native counterparts, all in-row Column work with
    zero shuffle:

    * distinct_frac — distinct tokens / length (low = repetitive);
    * top_share — most frequent token's share (Gopher top-word rule);
    * dup_bigram_frac — 1 - distinct adjacent bigrams / bigrams;
    * entropy — Shannon entropy (nats) of the token distribution.

    The per-doc counting runs over the distinct-token array in first-
    occurrence order (count = size(filter(..)) per distinct token) —
    O(distinct x length) in-row work, fine at context-window lengths;
    a corpus of mega-token docs would switch to the explode + hash-agg
    form instead. Deterministic accumulation order makes the entropy
    reproducible bit-for-bit by a single-node recompute.
    """
    ws = F.col(token_col)
    n = F.size(ws)
    dist = F.array_distinct(ws)
    counts = F.transform(
        dist, lambda t: F.size(F.filter(ws, lambda x: x == t)))
    entropy = F.aggregate(
        counts, F.lit(0.0),
        lambda acc, c: acc - (c / n) * F.log(c / n))
    top_share = F.array_max(counts) / n
    big = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(
            ",", F.element_at(ws, i).cast("string"),
            F.element_at(ws, (i + 1).cast("int")).cast("string")))
    dup_bigram = F.when(
        n >= 2,
        F.lit(1.0) - F.size(F.array_distinct(big)) / (n - 1)
    ).otherwise(F.lit(0.0))
    return sequences.filter(n >= 1).select(
        "doc_id",
        n.alias("n_tok"),
        F.round(F.size(dist) / n, 6).alias("distinct_frac"),
        F.round(top_share, 6).alias("top_share"),
        F.round(dup_bigram, 6).alias("dup_bigram_frac"),
        F.round(entropy, 6).alias("entropy"),
    )
