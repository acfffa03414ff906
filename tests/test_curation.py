"""End-to-end curation plan: each stage must drop its planted violator.

One doc per failure mode — junk text (quality), exact copy (dedup),
eval-overlapping text (decontamination), unlisted lang (mix sampling) —
and the two survivors must land in deterministic packs.
"""

from __future__ import annotations

from bigdata_event_stream_detection_spark.plans.curation import (
    curate_training_mix,
)

EVAL = "the cat sat on the mat with a dog and snake"


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
              " n_chars bigint")


def test_each_stage_drops_its_violator_and_packs_rest(spark):
    d1 = "the quick dog runs over a green hill to find water"
    d4 = "a small bird flies on the tall tree and sings loudly"
    docs = _docs(spark, [
        (1, d1, "en", "A", 30),
        (2, d1, "en", "A", 30),      # exact dup of 1
        (3, "!!!!!!", "en", "A", 30),  # junk: quality < 0.5
        (4, d4, "en", "A", 30),
        (5, "the happy mouse eats some cheese in a warm kitchen",
         "xx", "A", 30),             # lang not in the mix
        (6, EVAL, "en", "A", 30),    # == eval doc: contaminated
    ])
    eval_docs = _docs(spark, [(100, EVAL, "en", "E", 30)])
    out = curate_training_mix(
        docs, {"en": 1.0}, quality_min=0.5, eval_docs=eval_docs,
        contamination_max=0.2, pack_budget=30,
    ).collect()
    got = {r["doc_id"]: r for r in out}
    assert set(got) == {1, 4}
    # budget 30 fits one 30-char doc per pack, filled in doc_id order
    assert got[1]["pack_id"] == 0
    assert got[4]["pack_id"] == 1


def test_no_eval_set_skips_decontamination(spark):
    docs = _docs(spark, [(1, EVAL, "en", "A", 30)])
    out = curate_training_mix(docs, {"en": 1.0}, quality_min=0.5).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_classifier_gate_and_temperature_mix(spark):
    from bigdata_event_stream_detection_spark.operators.classifier import (
        nb_train,
    )

    d_ham = "the quick dog runs over a green hill to find water"
    d_spam = "buy cheap pills now before the offer ends forever today"
    docs = _docs(spark, [
        (1, d_ham, "en", "A", 30),
        (2, d_spam, "en", "A", 30),   # classifier-gated out
        (3, "a small bird flies on the tall tree and sings loudly",
         "fr", "A", 30),
    ])
    labeled = spark.createDataFrame(
        [(100 + i, "green hill water dog tree bird", "keep")
         for i in range(10)]
        + [(200 + i, "buy cheap pills offer today", "drop")
           for i in range(10)],
        "doc_id long, text string, lang string")
    model = nb_train(labeled)

    out = curate_training_mix(
        docs, quality_min=0.0, label_model=model,
        keep_labels={"keep"}, temperature_alpha=1.0, pack_budget=30,
    ).collect()
    # alpha=1 keeps every surviving doc; spam-predicted doc 2 is gone
    assert sorted(r["doc_id"] for r in out) == [1, 3]

    # exactly-one-sampler contract
    import pytest
    with pytest.raises(ValueError):
        curate_training_mix(docs, {"en": 1.0}, temperature_alpha=0.5)
    with pytest.raises(ValueError):
        curate_training_mix(docs)
