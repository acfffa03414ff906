"""Blocked (two-level scan) HMM kernels agree with the sequential ones.

Mirrors the reference's cross-implementation equivalence test
(``hmm/mainTestHmm.java``: deprecated Hmm vs Hmm2 sequential vs spark)
— here: kernels.baum_welch/viterbi vs blocked_hmm.* on sequences long
enough to span many blocks.
"""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_event_stream_detection_spark.operators.blocked_hmm import (
    baum_welch_blocked,
    blocked_forward_backward,
    viterbi_blocked,
)
from bigdata_event_stream_detection_spark.operators.kernels import (
    _forward_backward,
    baum_welch,
    hmm_assemble,
    sample_hmm_sequence,
    viterbi,
)


@pytest.fixture(scope="module")
def model_and_seq():
    rng = np.random.default_rng(7)
    W, k = 40, 3
    p_bg = rng.random(W) + 0.5
    p_bg /= p_bg.sum()
    themes = rng.random((k, W)) * 0.1
    for j in range(k):
        themes[j, j * 10:(j + 1) * 10] += 1.0
        themes[j] /= themes[j].sum()
    pi, a, b = hmm_assemble(p_bg, themes)
    _, obs = sample_hmm_sequence(pi, a, b, 20_000, seed=123)
    return pi, a, b, obs


def test_blocked_forward_backward_matches_sequential(model_and_seq):
    pi, a, b, obs = model_and_seq
    sa, sb, sc, sll = _forward_backward(obs, pi, a, b)
    for block in (1024, 4096, 30_000):  # many blocks / few / single
        ba, bb, bc, bll = blocked_forward_backward(obs, pi, a, b, block)
        np.testing.assert_allclose(ba, sa, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(bb, sb, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(bc, sc, rtol=1e-9)
        assert abs(bll - sll) < 1e-6


def test_blocked_baum_welch_matches_sequential(model_and_seq):
    pi, a, b, obs = model_and_seq
    p1, a1, ll1, it1 = baum_welch(obs, pi, a, b, max_iterations=5,
                                  pi_threshold=0, a_threshold=0)
    p2, a2, ll2, it2 = baum_welch_blocked(obs, pi, a, b, max_iterations=5,
                                          pi_threshold=0, a_threshold=0,
                                          block_size=2048)
    assert it1 == it2
    np.testing.assert_allclose(p2, p1, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(a2, a1, rtol=1e-8, atol=1e-12)
    assert abs(ll2 - ll1) < 1e-5


def test_blocked_viterbi_identical_path(model_and_seq):
    pi, a, b, obs = model_and_seq
    ref = viterbi(obs, pi, a, b)
    for block in (100, 1111, 131072):
        got = viterbi_blocked(obs, pi, a, b, block_size=block)
        np.testing.assert_array_equal(got, ref)


def test_blocked_handles_short_and_empty():
    rng = np.random.default_rng(0)
    b = rng.random((2, 5))
    b /= b.sum(axis=1, keepdims=True)
    pi = np.array([0.5, 0.5])
    a = np.array([[0.9, 0.1], [0.2, 0.8]])
    assert viterbi_blocked(np.empty(0, np.int64), pi, a, b).size == 0
    short = np.array([1, 2], dtype=np.int64)
    np.testing.assert_array_equal(
        viterbi_blocked(short, pi, a, b, block_size=1),
        viterbi(short, pi, a, b))
    p, aa, ll, it = baum_welch_blocked(
        np.array([1], np.int64), pi, a, b)
    assert it == 0
