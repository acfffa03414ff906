"""Bit-exactness contract of the optional C kernels (kernels_native).

The C recursions must be drop-in replacements for the pure-Python fast
paths: IDENTICAL bits out for identical inputs, so enabling the native
path can never change any query result, oracle, or parity invariant.
No Spark session needed — these are pure-numpy tests.
"""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_event_stream_detection_spark.operators import kernels as K

kernels_native = pytest.importorskip(
    "bigdata_event_stream_detection_spark.operators.kernels_native")

pytestmark = pytest.mark.skipif(
    not kernels_native.available,
    reason="no C compiler in this environment — Python fallback active")


def _fixture(rng, n, W, T):
    themes = rng.random((n - 1, W))
    themes /= themes.sum(axis=1, keepdims=True)
    p_bg = rng.random(W)
    p_bg /= p_bg.sum()
    pi, a, b = K.hmm_assemble(p_bg, themes)
    obs = rng.integers(0, W, T)
    return pi, a, b, obs


def test_forward_backward_bit_identical():
    rng = np.random.default_rng(11)
    for _ in range(10):
        n = int(rng.integers(2, 6))
        W = int(rng.integers(10, 300))
        T = int(rng.integers(300, 8000))
        pi, a, b, obs = _fixture(rng, n, W, T)
        b_obs = b[:, obs].T
        py = K._forward_backward_small(b_obs, pi, a)
        c = kernels_native.forward_backward_small(b_obs, pi, a)
        for x, y, name in zip(py, c, ("alpha", "beta", "c", "loglik")):
            assert np.array_equal(np.asarray(x), np.asarray(y)), name


def test_viterbi_bit_identical():
    rng = np.random.default_rng(12)
    for _ in range(10):
        n = int(rng.integers(2, 9))
        W = int(rng.integers(10, 300))
        T = int(rng.integers(300, 8000))
        pi, a, b, obs = _fixture(rng, n, W, T)
        with np.errstate(divide="ignore"):
            lp, la, lb = np.log(pi), np.log(a), np.log(b)
        assert np.array_equal(K._viterbi_small(obs, lp, la, lb),
                              kernels_native.viterbi_small(obs, lp, la, lb))


def test_viterbi_tie_break_matches():
    """Ties must resolve to the LOWEST from-state index in both paths
    (uniform emissions force constant ties)."""
    n, W, T = 4, 7, 900
    pi = np.full(n, 1.0 / n)
    a = np.full((n, n), 1.0 / n)
    b = np.full((n, W), 1.0 / W)
    obs = np.zeros(T, dtype=np.int64)
    with np.errstate(divide="ignore"):
        lp, la, lb = np.log(pi), np.log(a), np.log(b)
    py = K._viterbi_small(obs, lp, la, lb)
    c = kernels_native.viterbi_small(obs, lp, la, lb)
    assert np.array_equal(py, c)
    assert (py == 0).all()


def test_bw_small_bit_identical():
    """The full compiled Baum-Welch loop must equal the pure-Python
    small-state loop bit-for-bit at every shape, including tiny T
    (the engine's real per-(window, source) sequences are T ~ 10-200)."""
    rng = np.random.default_rng(14)
    for _ in range(20):
        n = int(rng.integers(2, 6))
        W = int(rng.integers(10, 300))
        T = int(rng.integers(2, 3000))
        pi0, a0, b, obs = _fixture(rng, n, W, T)
        b_obs = b[:, obs].T
        c = kernels_native.bw_small(b_obs, pi0, a0, 8, 0.01, 0.01)
        py = K._baum_welch_small(b_obs, pi0, a0, 8, 0.01, 0.01)
        assert np.array_equal(c[0], py[0])          # pi
        assert np.array_equal(c[1], py[1])          # a
        assert c[2] == py[2]                        # loglik
        assert c[3] == py[3]                        # n_iter


def test_baum_welch_dispatch_uses_native(monkeypatch):
    """baum_welch through the public dispatch equals the forced-Python
    path bit-for-bit — at a long sequence and at the engine's real
    tiny shapes (the small-state loop now serves ANY T)."""
    rng = np.random.default_rng(13)
    for (n, W, T) in ((4, 50, 5000), (4, 31, 81), (3, 12, 7)):
        pi0, a0, b, obs = _fixture(rng, n, W, T)
        native = K.baum_welch(obs, pi0, a0, b, max_iterations=5)
        monkeypatch.setattr(K, "_NATIVE", None)
        python = K.baum_welch(obs, pi0, a0, b, max_iterations=5)
        monkeypatch.undo()
        for x, y in zip(native, python):
            assert np.array_equal(np.asarray(x), np.asarray(y))
