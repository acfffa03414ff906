"""Batch composition of the full event-detection pipeline.

One declarative flow, equivalent to the reference's
``ThemesStrengthOverTime`` entry point (its lifecycle is traced in
SURVEY.md §3.2) but with zero mid-query driver collects:

    sequences -> quality filters -> (background model) -> window assign
              -> per-window EM themes -> best-run/theme filters
              -> per-window HMM train+decode -> event strength rows

Every stage is DataFrame -> DataFrame, so the streaming shell reuses the
same operators under readStream.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame

from ..operators import background as bg
from ..operators import em as em_ops
from ..operators import hmm as hmm_ops
from ..operators import windows as win
from ..params import DEFAULTS, Params
from ..util import persist_once


def _window_seconds(spec: str) -> int:
    qty, unit = spec.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    return int(qty) * mult


def detect_event_stream(
    sequences: DataFrame,
    params: Params = DEFAULTS,
    with_watermark_filter: bool = False,
    model=None,
) -> DataFrame:
    """sequences (input-hint shape) -> event rows
    (window_start, source, theme_id, strength).

    The filtered corpus and the theme table are persisted: the corpus
    lineage is read by the background model, the EM stage, and the HMM
    cogroup (3 consumers), and `best_run_themes` + the HMM side read
    themes twice — without a persist the whole upstream scan/tokenize
    recomputes per consumer (the reference persists at the same points:
    InputParser.java:108, EmAlgo.java:231).
    """
    seqs = win.filter_docs(sequences, min_tokens=params.min_doc_tokens)
    if with_watermark_filter:
        seqs = win.drop_late(seqs, watermark_delay=params.watermark_delay)
    # background model over the *unwindowed* corpus: overlapping windows
    # must not double-count words (ArticleProcessorTest semantics).
    # Collected ONCE (vocab-sized) and shared: the EM and HMM stages
    # each broadcast from this pandas frame instead of running their
    # own scan+agg+collect job. Callers running many queries over one
    # corpus pass a precomputed `model` (the streaming engine's static
    # side input works the same way). The corpus persist exists for the
    # multi-consumer lineage (model scan + EM + HMM cogroup); with a
    # precomputed model and the fused single-run plan there is exactly
    # ONE consumer, so the persist materialization (a serial stage
    # barrier) is skipped.
    fused = params.em_runs == 1
    consumers = (0 if model is not None else 1) + (1 if fused else 2)
    if consumers > 1:
        seqs = persist_once(seqs)
    if model is None:
        model = em_ops.collect_background(
            bg.background_model(seqs, min_count=params.min_word_corpus_count))
    else:
        model = em_ops.collect_background(model)
    windowed = win.with_time_window(
        seqs, length=params.window_length, slide=params.window_slide)
    if fused:
        # single-run plan: EM + theme floor + HMM decode fused into one
        # applyInPandas task per window — ONE corpus shuffle instead of
        # two (EM groups + decode cogroup); shares the streaming state
        # kernel's payload, so outputs are identical by construction
        return hmm_ops.detect_events_pooled(
            windowed, model,
            k=params.num_themes,
            em_iterations=params.em_iterations,
            lambda_b=params.lambda_background,
            score_floor=params.theme_score_floor_factor / params.num_themes,
            max_iterations=params.bw_max_iterations,
            pi_threshold=params.bw_pi_threshold,
            a_threshold=params.bw_a_threshold,
        )
    themes = em_ops.em_themes(
        windowed, model,
        k=params.num_themes,
        iterations=params.em_iterations,
        lambda_b=params.lambda_background,
        runs=params.em_runs,
    )
    # best-run selection reads the theme table twice (agg + join back),
    # so persist it
    themes = em_ops.best_run_themes(persist_once(themes))
    themes = em_ops.filter_themes(
        themes, params.num_themes, params.theme_score_floor_factor)
    return hmm_ops.detect_events(
        windowed, themes, model,
        max_iterations=params.bw_max_iterations,
        pi_threshold=params.bw_pi_threshold,
        a_threshold=params.bw_a_threshold,
    )


def evolution_graph(sequences: DataFrame, params: Params = DEFAULTS) -> DataFrame:
    """The evolution-graph query (reference EvolutionGraphTest §3.1):
    themes per window + KL-linked transitions."""
    from ..operators.transitions import theme_transitions

    seqs = win.filter_docs(
        sequences, min_tokens=params.min_doc_tokens)
    seqs = persist_once(seqs)
    model = em_ops.collect_background(
        bg.background_model(seqs, min_count=params.min_word_corpus_count))
    windowed = win.with_time_window(
        seqs, length=params.window_length, slide=params.window_slide)
    themes = em_ops.em_themes(
        windowed, model, k=params.num_themes,
        iterations=params.em_iterations,
        lambda_b=params.lambda_background,
        runs=params.em_runs)
    if params.em_runs > 1:
        themes = em_ops.best_run_themes(persist_once(themes))
    themes = em_ops.filter_themes(
        themes, params.num_themes, params.theme_score_floor_factor)
    # the transition self-join reads themes twice (both sides) — persist
    # so EM does not recompute per side
    themes = persist_once(themes)
    return theme_transitions(
        themes,
        window_length_seconds=_window_seconds(params.window_length),
        threshold=params.kl_threshold,
        divergence=params.divergence,
        eps=params.kl_epsilon,
        log_max=params.kl_log_max,
    )


def small_params(**overrides) -> Params:
    """Parameter preset sized for the sf0.001/sf0.01 test tables."""
    base = dict(
        min_doc_tokens=5, min_word_corpus_count=2, num_themes=3,
        em_iterations=10, em_runs=1, window_length="1 hour",
        bw_max_iterations=10,
    )
    base.update(overrides)
    return replace(DEFAULTS, **base)
