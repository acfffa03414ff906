"""Pure-numpy kernel tests (no Spark): the single-node oracles.

Mirrors the reference's own test strategy (SURVEY.md §5): generative
HMM round-trip (MainSparkHmm), EM monotone likelihood + topic recovery
(mainTestEm), Viterbi vs brute-force.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from bigdata_event_stream_detection_spark.operators.kernels import (
    baum_welch,
    em_fit,
    hmm_assemble,
    kl_divergence,
    sample_hmm_sequence,
    stable_seed,
    tv_distance,
    viterbi,
)
from bigdata_event_stream_detection_spark.sources.synthetic import PlantedHmm


def brute_force_viterbi(obs, pi, a, b):
    """Exponential exact argmax over paths — oracle for tiny cases."""
    n = len(pi)
    best, best_lp = None, -np.inf
    with np.errstate(divide="ignore"):
        lpi, la, lb = np.log(pi), np.log(a), np.log(b)
    for path in itertools.product(range(n), repeat=len(obs)):
        lp = lpi[path[0]] + lb[path[0], obs[0]]
        for t in range(1, len(obs)):
            lp += la[path[t - 1], path[t]] + lb[path[t], obs[t]]
        if lp > best_lp:
            best_lp, best = lp, path
    return np.array(best)


def test_stable_seed_is_deterministic():
    assert stable_seed("a", 1) == stable_seed("a", 1)
    assert stable_seed("a", 1) != stable_seed("a", 2)


def test_viterbi_matches_brute_force():
    rng = np.random.default_rng(7)
    n, W, T = 3, 5, 8
    pi = rng.dirichlet(np.ones(n))
    a = rng.dirichlet(np.ones(n), size=n)
    b = rng.dirichlet(np.ones(W), size=n)
    for seed in range(5):
        _, obs = sample_hmm_sequence(pi, a, b, T, seed)
        got = viterbi(obs, pi, a, b)
        want = brute_force_viterbi(obs, pi, a, b)
        assert np.array_equal(got, want)


def test_baum_welch_improves_likelihood_and_recovers_structure():
    hmm = PlantedHmm(n_themes=2, vocab=60, seed=3)
    pi, a, b = hmm.matrices()
    _, obs = sample_hmm_sequence(pi, a, b, 4000, seed=11)
    # start from the structured prior, not the truth
    p_bg = b[0]
    pi0, a0, b0 = hmm_assemble(p_bg, b[1:])
    pi_t, a_t, loglik, iters = baum_welch(obs, pi0, a0, b0, max_iterations=30)
    assert iters >= 1
    assert np.isfinite(loglik)
    # recovered self-transition of themes should be high (truth 0.85)
    assert a_t[1, 1] > 0.5 and a_t[2, 2] > 0.5
    # rows remain distributions
    np.testing.assert_allclose(a_t.sum(axis=1), 1.0, atol=1e-9)
    np.testing.assert_allclose(pi_t.sum(), 1.0, atol=1e-9)


def test_decode_recovers_planted_states_mostly():
    hmm = PlantedHmm(n_themes=2, vocab=120, seed=5)
    pi, a, b = hmm.matrices()
    states, obs = sample_hmm_sequence(pi, a, b, 3000, seed=13)
    decoded = viterbi(obs, pi, a, b)
    acc = (decoded == states).mean()
    assert acc > 0.8, f"viterbi accuracy {acc}"


def test_em_loglik_monotone_and_topics_recovered():
    rng = np.random.default_rng(21)
    k, W, D = 3, 90, 60
    block = W // k
    true_topics = rng.integers(0, k, size=D)
    p_bg = np.full(W, 1.0 / W)
    counts = np.zeros((D, W))
    for d in range(D):
        j = true_topics[d]
        words = np.concatenate([
            rng.integers(j * block, (j + 1) * block, size=80),  # topical
            rng.integers(0, W, size=20),                        # background
        ])
        w, c = np.unique(words, return_counts=True)
        counts[d, w] = c
    # multi-run + best-of-loglik (the reference's M2: some seeds land in
    # local optima; best-run selection is part of the spec)
    best = None
    for run in range(3):
        theta, pi, logliks = em_fit(counts, p_bg, k, iterations=20,
                                    lambda_b=0.5, seed=9 + run,
                                    track_loglik=True)
        diffs = np.diff(logliks)
        assert (diffs >= -1e-6).all(), f"non-monotone loglik: {logliks}"
        if best is None or logliks[-1] > best[2][-1]:
            best = (theta, pi, logliks)
    theta, pi, logliks = best
    # doc argmax labels must be a consistent relabeling of true topics
    pred = pi.argmax(axis=1)
    # map each predicted cluster to majority true topic
    acc = 0
    for j in range(k):
        mask = pred == j
        if mask.sum():
            maj = np.bincount(true_topics[mask], minlength=k).max()
            acc += maj
    assert acc / D >= 0.95


def test_em_deterministic_given_seed():
    rng = np.random.default_rng(2)
    counts = rng.integers(0, 5, size=(10, 30)).astype(float)
    p_bg = np.full(30, 1 / 30)
    t1, p1, l1 = em_fit(counts, p_bg, 2, iterations=5, seed=123)
    t2, p2, l2 = em_fit(counts, p_bg, 2, iterations=5, seed=123)
    assert np.array_equal(t1, t2) and np.array_equal(p1, p2) and l1 == l2


def test_divergences():
    p = np.array([0.5, 0.5, 1e-12])
    q = np.array([0.25, 0.25, 0.5])
    assert kl_divergence(p, p) == pytest.approx(0.0, abs=1e-9)
    assert kl_divergence(p, q) > 0
    assert tv_distance(p, q) == pytest.approx(0.5 * (0.25 + 0.25 + 0.5), rel=1e-6)
    # asymmetry
    assert kl_divergence(p, q) != pytest.approx(kl_divergence(q, p), rel=1e-3)


def test_batched_pair_divergence_matches_per_pair():
    """The segment-aligned batch kernel in transitions must equal the
    straightforward per-pair union1d + scatter + scalar-kernel path."""
    from bigdata_event_stream_detection_spark.operators.transitions import (
        _batched_pair_divergence,
    )

    rng = np.random.default_rng(42)
    eps, log_max = 1e-12, 27.0
    w1, p1, w2, p2 = [], [], [], []
    for _ in range(60):
        n1 = int(rng.integers(1, 40))
        n2 = int(rng.integers(1, 40))
        # overlapping supports drawn from a small id pool
        ids1 = rng.choice(200, size=n1, replace=False).astype(np.int64)
        ids2 = rng.choice(200, size=n2, replace=False).astype(np.int64)
        pr1 = rng.random(n1); pr1 /= pr1.sum()
        pr2 = rng.random(n2); pr2 /= pr2.sum()
        w1.append(ids1); p1.append(pr1); w2.append(ids2); p2.append(pr2)

    def per_pair(kind):
        out = np.empty(len(w1))
        for i in range(len(w1)):
            union = np.union1d(w1[i], w2[i])
            a = np.full(union.size, eps)
            b = np.full(union.size, eps)
            a[np.searchsorted(union, w1[i])] = p1[i]
            b[np.searchsorted(union, w2[i])] = p2[i]
            out[i] = (tv_distance(a, b) if kind == "tv"
                      else kl_divergence(a, b, eps=eps, log_max=log_max))
        return out

    for kind in ("kl", "tv"):
        got = _batched_pair_divergence(w1, p1, w2, p2, kind, eps, log_max)
        np.testing.assert_allclose(got, per_pair(kind), rtol=1e-12, atol=0)

    # empty batch
    assert _batched_pair_divergence([], [], [], [], "kl", eps, log_max).size == 0
