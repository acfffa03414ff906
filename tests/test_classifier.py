"""Multinomial NB classifier (operators/classifier.py): learns planted
vocab-label structure, handles OOV-only docs by priors, deterministic
under repartitioning. Exact cross-engine training math is covered by
the driver-contract oracle (nb_lang_classify, plain DuckDB SQL).
"""

from __future__ import annotations

from bigdata_event_stream_detection_spark.operators.classifier import (
    nb_classify, nb_train,
)


def _train_rows():
    # two separable dialects: 'spam' docs use one vocab, 'ham' another,
    # with one shared word so the vocab overlaps
    rows = []
    for i in range(30):
        rows.append((i, "buy cheap pills now shared", "spam"))
    for i in range(30, 90):
        rows.append((i, "meeting agenda notes shared", "ham"))
    return rows


def test_nb_learns_planted_separation(spark):
    train = spark.createDataFrame(
        _train_rows(), "doc_id long, text string, lang string")
    cond, priors = nb_train(train)
    test = spark.createDataFrame(
        [(100, "cheap pills"), (101, "agenda notes"),
         (102, "shared"),              # shared word only: priors decide
         (103, "zzz qqq")],            # all-OOV: priors decide
        "doc_id long, text string")
    got = {r["doc_id"]: r["pred_label"]
           for r in nb_classify(test, cond, priors).collect()}
    assert got[100] == "spam"
    assert got[101] == "ham"
    # ham has twice the docs -> wins both prior-dominated cases
    assert got[102] == "ham"
    assert got[103] == "ham"


def test_nb_classify_deterministic_and_total(spark):
    train = spark.createDataFrame(
        _train_rows(), "doc_id long, text string, lang string")
    test = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["buy now", "notes", "zzz", "shared pills agenda"])],
        "doc_id long, text string")
    cond, priors = nb_train(train)
    a = sorted(map(tuple, nb_classify(test, cond, priors).collect()))
    cond2, priors2 = nb_train(train.repartition(7))
    b = sorted(map(tuple, nb_classify(
        test.repartition(3), cond2, priors2).collect()))
    assert a == b
    assert len(a) == 4            # verdict row per input doc, always


def test_nb_gate_expr_sign_matches_classifier(spark):
    from bigdata_event_stream_detection_spark.operators.classifier import (
        nb_gate_expr,
    )

    train = spark.createDataFrame(
        _train_rows(), "doc_id long, text string, lang string")
    cond, priors = nb_train(train)
    test = spark.createDataFrame(
        [(0, "buy now"), (1, "notes agenda"), (2, "zzz unseen"),
         (3, "shared"), (4, "cheap agenda shared pills meeting"),
         (5, "")],
        "doc_id long, text string")

    pred = {r["doc_id"]: r["pred_label"]
            for r in nb_classify(test, cond, priors).collect()}
    gate = {r["doc_id"]: r["lo"] for r in test.select(
        "doc_id",
        nb_gate_expr(cond, priors, "spam", "ham").alias("lo")).collect()}
    for d, lo in gate.items():
        # classifier ties break toward 'ham' (label asc); the gate's
        # log-odds is 0 exactly there
        assert pred[d] == ("spam" if lo > 0 else "ham")

    # max_terms=1 keeps only the single most discriminative word:
    # still a working (coarser) gate, and the literal stays tiny
    g1 = test.select("doc_id", nb_gate_expr(
        cond, priors, "spam", "ham", max_terms=1).alias("lo")).collect()
    assert all(isinstance(r["lo"], float) for r in g1)
