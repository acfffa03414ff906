"""End-to-end batch pipeline tests on the planted-HMM fixture."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.operators import background as bg
from bigdata_event_stream_detection_spark.operators import em as em_ops
from bigdata_event_stream_detection_spark.operators import hmm as hmm_ops
from bigdata_event_stream_detection_spark.operators import windows as win
from bigdata_event_stream_detection_spark.plans.pipeline import (
    detect_event_stream,
    small_params,
)

PARAMS = small_params(
    num_themes=3, window_length="6 hours", em_iterations=10,
    min_doc_tokens=50, min_word_corpus_count=5, bw_max_iterations=8,
)


def _collect_events(df):
    return sorted(
        (r["window_start"], r["source"], r["theme_id"], r["strength"])
        for r in df.collect()
    )


def test_background_model_is_distribution(tiny_sequences):
    model = bg.background_model(tiny_sequences, min_count=5)
    row = model.agg(F.sum("p").alias("s"), F.count("*").alias("n")).collect()[0]
    assert row["s"] == pytest.approx(1.0, abs=1e-9)
    assert row["n"] > 100


def test_collect_background_guard(tiny_sequences):
    """A vocab over the driver cap fails loudly with the levers named,
    not with an OOM (VERDICT r3 item 4); at most cap+1 rows are pulled."""
    model = bg.background_model(tiny_sequences, min_count=2)
    with pytest.raises(ValueError, match="BESD_BACKGROUND_MAX_ROWS"):
        em_ops.collect_background(model, max_rows=10)
    pdf = em_ops.collect_background(model, max_rows=10_000_000)
    assert len(pdf) == model.count()


def test_detect_events_end_to_end(tiny_sequences):
    events = detect_event_stream(tiny_sequences, PARAMS)
    rows = _collect_events(events)
    assert len(rows) > 0
    assert all(s > 0 for *_, s in rows)
    # theme_id is the EM theme id (0-based), not the HMM state index
    assert all(0 <= t < PARAMS.num_themes for _, _, t, _ in rows)
    srcs = {r[1] for r in rows}
    assert len(srcs) >= 2  # events detected in more than one stream


def test_events_deterministic_across_partitioning(tiny_sequences):
    a = _collect_events(detect_event_stream(tiny_sequences, PARAMS))
    b = _collect_events(
        detect_event_stream(tiny_sequences.repartition(3, "doc_id"), PARAMS))
    assert a == b


def test_decode_tokens_pass_through_byte_equal(tiny_sequences):
    """The per-row invariant: token arrays survive the pipeline intact."""
    seqs = win.filter_docs(tiny_sequences, min_tokens=PARAMS.min_doc_tokens)
    model = bg.background_model(seqs, min_count=PARAMS.min_word_corpus_count)
    windowed = win.with_time_window(seqs, length=PARAMS.window_length)
    themes = em_ops.best_run_themes(em_ops.em_themes(
        windowed, model, k=PARAMS.num_themes, iterations=PARAMS.em_iterations))
    decoded = hmm_ops.decode_tokens(windowed, themes, model,
                                    max_iterations=PARAMS.bw_max_iterations)
    joined = (
        decoded.select("doc_id", F.col("tokens").alias("out_tokens"), "states")
        .join(tiny_sequences.select("doc_id", "tokens"), "doc_id")
        .collect()
    )
    assert len(joined) > 0
    for r in joined:
        assert list(r["out_tokens"]) == list(r["tokens"])
        assert len(r["states"]) == len(r["tokens"])
        assert all(0 <= s <= PARAMS.num_themes for s in r["states"])


def test_decoded_states_track_planted_themes(tiny_sequences):
    """Tokens drawn from a planted theme's vocab block should mostly
    decode to a consistent non-background state (label permutation
    allowed)."""
    from bigdata_event_stream_detection_spark.sources.synthetic import PlantedHmm

    hmm = PlantedHmm()
    _, _, b_true = hmm.matrices()
    true_label = b_true.argmax(axis=0)  # most likely true state per word

    seqs = win.filter_docs(tiny_sequences, min_tokens=50)
    model = bg.background_model(seqs, min_count=5)
    windowed = win.with_time_window(seqs, length="6 hours")
    themes = em_ops.best_run_themes(em_ops.em_themes(
        windowed, model, k=3, iterations=10))
    decoded = hmm_ops.decode_tokens(windowed, themes, model, max_iterations=8)
    pdf = decoded.limit(200).toPandas()
    agree = total = 0
    for _, row in pdf.iterrows():
        toks = np.asarray(row["tokens"])
        states = np.asarray(row["states"])
        mask = states > 0
        if mask.sum() == 0:
            continue
        # majority mapping decoded-state -> planted-state must be consistent
        t = true_label[toks[mask]]
        s = states[mask]
        for st in np.unique(s):
            sub = t[s == st]
            agree += np.bincount(sub).max()
            total += sub.size
    assert total > 0
    assert agree / total > 0.6, f"decoded/planted agreement {agree/total:.2f}"


def test_detect_events_theme_ids_survive_filter(tiny_sequences):
    """Regression (round-1 verdict): after ``filter_themes`` drops a
    theme, event rows must carry the SURVIVING theme's real EM id (the
    Viterbi state index is renumbered, so state 1 may be theme 2).
    Dropping the *middle* theme distinguishes the two: the buggy code
    emits {1, 2}; the correct mapping emits {0, 2}."""
    from bigdata_event_stream_detection_spark.operators.transitions import (
        top_theme_words,
    )

    seqs = win.filter_docs(tiny_sequences, min_tokens=PARAMS.min_doc_tokens)
    model = bg.background_model(seqs, min_count=PARAMS.min_word_corpus_count)
    windowed = win.with_time_window(seqs, length=PARAMS.window_length)
    themes = em_ops.best_run_themes(em_ops.em_themes(
        windowed, model, k=PARAMS.num_themes, iterations=PARAMS.em_iterations))
    surviving = themes.filter(F.col("theme_id") != 1)
    events = hmm_ops.detect_events(windowed, surviving, model,
                                   max_iterations=PARAMS.bw_max_iterations)
    rows = events.collect()
    assert rows
    ids = {r["theme_id"] for r in rows}
    assert 1 not in ids, "dropped theme id leaked into event rows"
    assert ids <= {0, 2}
    # every event row joins a theme_top_words row for its (window, theme)
    tw = top_theme_words(surviving, lexicon=None, k=5).select(
        "window_start", "theme_id").distinct()
    dangling = (events.select("window_start", "theme_id").distinct()
                .join(tw, ["window_start", "theme_id"], "left_anti").count())
    assert dangling == 0


def test_em_themes_chunked_covers_all_docs(spark, tiny_sequences):
    """M4: chunked EM assigns every doc to exactly one (window, chunk)
    and each chunk yields k themes over its own sub-corpus."""
    from bigdata_event_stream_detection_spark.operators import (
        background as bg, em as em_ops, windows as win,
    )

    seqs = win.filter_docs(tiny_sequences, min_tokens=5)
    model = bg.background_model(seqs, min_count=2)
    windowed = win.with_time_window(seqs, length="4 hours")
    themes = em_ops.em_themes_chunked(windowed, model, n_chunks=3, k=2,
                                      iterations=3)
    rows = themes.collect()
    assert rows
    # chunk ids land in 0..2 and doc counts per (window, chunk) sum to
    # the window's doc count
    runs = {r["run"] for r in rows}
    assert runs <= {0, 1, 2}
    per_window_docs = {}
    for r in rows:
        if r["theme_id"] == 0:
            per_window_docs.setdefault(r["window_start"], 0)
            per_window_docs[r["window_start"]] += r["n_docs"]
    truth = {r["window_start"]: r["n"] for r in windowed.groupBy(
        "window_start").agg(__import__("pyspark").sql.functions.count("*")
                            .alias("n")).collect()}
    for w, n in per_window_docs.items():
        assert n == truth[w]


def test_fused_plan_matches_unfused(tiny_sequences):
    """The em_runs==1 fused single-shuffle plan must emit exactly the
    rows of the explicit em_themes -> filter_themes -> detect_events
    composition (same kernels, same seeds, one shuffle instead of
    two)."""
    fused = _collect_events(detect_event_stream(tiny_sequences, PARAMS))

    seqs = win.filter_docs(
        tiny_sequences, min_tokens=PARAMS.min_doc_tokens).persist()
    model = em_ops.collect_background(bg.background_model(
        seqs, min_count=PARAMS.min_word_corpus_count))
    windowed = win.with_time_window(seqs, length=PARAMS.window_length)
    themes = em_ops.em_themes(
        windowed, model, k=PARAMS.num_themes,
        iterations=PARAMS.em_iterations,
        lambda_b=PARAMS.lambda_background, runs=1)
    themes = em_ops.filter_themes(
        themes, PARAMS.num_themes, PARAMS.theme_score_floor_factor)
    unfused = _collect_events(hmm_ops.detect_events(
        windowed, themes, model,
        max_iterations=PARAMS.bw_max_iterations,
        pi_threshold=PARAMS.bw_pi_threshold,
        a_threshold=PARAMS.bw_a_threshold))
    seqs.unpersist()
    assert fused == unfused
