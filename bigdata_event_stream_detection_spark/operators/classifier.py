"""Multinomial Naive Bayes text classifier — the "cheap model-based
filter" block of training-data pipelines (CCNet / fastText pattern:
label a slice with heuristics or a teacher model, train the cheap
classifier, score the whole corpus with it).

Why NB and not SGD here: training is PURE COUNTING — two hash
aggregations — so the distributed result is bit-identical to a
single-node recompute (no partial-sum float drift, no iteration
order), the model tables are vocab-bounded, and the DuckDB oracle is
plain SQL over the same parquet, no literal tables. A linear SGD
model would add nothing at this feature granularity but would lose
all three properties.

Scale shape:
* train — one explode + groupBy(label, word) hash agg (map-side
  partials), one label-level rollup, one 1-row vocab count joined
  back by broadcast; model size = labels x vocab rows, corpus-free.
* score — doc words equi-join the label-fanned model on the word key
  (vocab-bounded build side, broadcastable; Catalyst/AQE decides),
  then ONE doc_id hash agg and a per-doc argmax window. Nothing
  corpus-sized shuffles twice and no Python runs anywhere — the whole
  plan is Tungsten codegen.

No reference counterpart (the reference has no supervised operator);
this extends the engine's training-data family alongside text.py's
heuristic quality scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textfns import ascii_words


def nb_train(
    documents: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB with Laplace smoothing ``alpha``.

    Returns ``(cond, priors)``:

    * ``cond`` — one row per (label, word) seen under that label:
      ``log_cond = ln((count + alpha) / (label_tokens + alpha * V))``
      where V is the training vocabulary size (distinct words across
      all labels).
    * ``priors`` — one row per label: ``log_prior = ln(docs_label /
      docs_total)`` plus ``log_default`` = the unseen-word likelihood
      ``ln(alpha / (label_tokens + alpha * V))`` scoring uses for
      in-vocab words the label never saw.
    """
    words = documents.select(
        F.col(label_col).alias("label"),
        F.explode(ascii_words(F.col(text_col))).alias("word"),
    )
    # labels x vocab rows, feeds three subtrees (vocab size, per-label
    # totals, the conditional table): persist so the corpus explode+agg
    # runs once, not per subtree
    wc = (words.groupBy("label", "word").agg(F.count("*").alias("c"))
          .persist())
    vocab = wc.select("word").distinct().agg(
        F.count("*").alias("v"))
    label_tot = wc.groupBy("label").agg(F.sum("c").alias("tok"))
    denom = label_tot.crossJoin(F.broadcast(vocab)).select(
        "label",
        (F.col("tok") + F.lit(float(alpha)) * F.col("v")).alias("den"),
    )
    cond = (
        wc.join(F.broadcast(denom), "label")
        .select(
            "label", "word",
            F.log((F.col("c") + F.lit(float(alpha))) / F.col("den"))
            .alias("log_cond"),
        )
    )
    doc_counts = documents.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("nd"))
    total = documents.agg(F.count("*").alias("ntot"))
    priors = (
        doc_counts.crossJoin(F.broadcast(total))
        .join(F.broadcast(denom), "label")
        .select(
            "label",
            F.log(F.col("nd") / F.col("ntot")).alias("log_prior"),
            F.log(F.lit(float(alpha)) / F.col("den")).alias("log_default"),
        )
    )
    return cond, priors


def nb_classify(
    documents: DataFrame,
    cond: DataFrame,
    priors: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a trained model; one row per document:
    (id, pred_label, score rounded 4dp).

    Words outside the training vocabulary are dropped (classic NB);
    in-vocab words a label never saw use that label's smoothed
    ``log_default``. Ties (e.g. an all-OOV doc) break by label asc.
    The 4dp rounding absorbs the ~1e-13 partial-sum ordering drift
    between engines, same contract as embedding_kmeans's cos.
    """
    doc_words = (
        documents.select(
            F.col(id_col),
            F.explode(ascii_words(F.col(text_col))).alias("word"))
        .groupBy(id_col, "word").agg(F.count("*").alias("n"))
    )
    # mark in-vocab words (OOV contributes a 0 term under every label,
    # keeping the doc's row set intact), fan across labels, fill the
    # (label, word) holes with the label default
    vocab_words = cond.select("word").distinct().withColumn(
        "_iv", F.lit(1))
    fanned = (
        doc_words.join(vocab_words, "word", "left")
        .crossJoin(F.broadcast(priors.select("label", "log_default")))
        .join(cond, ["label", "word"], "left")
        .select(
            id_col, "label",
            F.when(
                F.col("_iv").isNotNull(),
                F.col("n") * F.coalesce("log_cond", "log_default"))
            .otherwise(F.lit(0.0)).alias("term"),
        )
    )
    scores = (
        fanned.groupBy(id_col, "label")
        .agg(F.sum("term").alias("like"))
        .join(F.broadcast(priors.select("label", "log_prior")), "label")
        .select(id_col, "label",
                (F.col("like") + F.col("log_prior")).alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("label").asc())
    pred = (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            id_col,
            F.col("label").alias("pred_label"),
            F.round("score", 4).alias("score"),
        )
    )
    # docs with no words at all never reach `scores`: verdict = the
    # best-prior label (a 1-row broadcast fill, not a corpus anti-join)
    best = F.broadcast(
        priors.orderBy(F.col("log_prior").desc(), F.col("label").asc())
        .limit(1)
        .select(F.col("label").alias("_bl"),
                F.round("log_prior", 4).alias("_bs")))
    return (
        documents.select(id_col).join(pred, id_col, "left")
        .crossJoin(best)
        .select(
            id_col,
            F.coalesce("pred_label", "_bl").alias("pred_label"),
            F.coalesce("score", "_bs").alias("score"),
        )
    )


def nb_gate_expr(
    cond: DataFrame,
    priors: DataFrame,
    keep_label: str,
    drop_label: str,
    text_col: str = "text",
    max_terms: int = 20_000,
):
    """The two-class NB decision as ONE stateless Column expression:
    log-odds(keep vs drop) = prior difference + sum over the text's
    words of the per-word log-likelihood ratio, looked up in a map
    literal and reduced with an in-row array aggregate. No explode, no
    per-doc shuffle, no window function — so the gate composes into
    pure append-mode STREAMING queries (and any batch filter) where
    the relational ``nb_classify`` plan cannot.

    The model collapses to at most ``max_terms`` (word -> ratio)
    entries, keeping the highest |ratio| words — chi-square-flavored
    feature selection that also bounds the broadcast literal. Words
    outside the kept vocabulary contribute 0, matching
    ``nb_classify``'s OOV rule (exactly equal when max_terms covers
    the vocabulary; a documented approximation below it).

    Driver cost: one collect of the vocab-bounded model tables — same
    contract as ``tokenize.documents_to_sequences``'s map-literal path.
    """
    from ..functions.textfns import ascii_words

    rows = {(r["label"], r["word"]): r["log_cond"]
            for r in cond.filter(
                F.col("label").isin([keep_label, drop_label])).collect()}
    pri = {r["label"]: (r["log_prior"], r["log_default"])
           for r in priors.filter(
               F.col("label").isin([keep_label, drop_label])).collect()}
    if keep_label not in pri or drop_label not in pri:
        raise ValueError(
            f"model lacks labels {keep_label!r}/{drop_label!r}")
    k_prior, k_def = pri[keep_label]
    d_prior, d_def = pri[drop_label]
    vocab = {w for (lbl, w) in rows}
    ratios = {
        w: (rows.get((keep_label, w), k_def)
            - rows.get((drop_label, w), d_def))
        for w in vocab
    }
    kept = sorted(ratios.items(), key=lambda kv: (-abs(kv[1]), kv[0]))
    kept = kept[:int(max_terms)]
    lr_map = F.create_map(
        *[F.lit(x) for w, r in kept for x in (w, float(r))])
    words = ascii_words(F.col(text_col))
    return (
        F.lit(float(k_prior - d_prior))
        + F.aggregate(
            F.transform(words, lambda w: F.coalesce(
                F.element_at(lr_map, w), F.lit(0.0))),
            F.lit(0.0),
            lambda acc, x: acc + x)
    )
