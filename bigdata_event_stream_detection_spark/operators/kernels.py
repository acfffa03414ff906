"""Pure-numpy model kernels (no Spark imports).

These are the numeric payloads executed inside ``applyInPandas`` groups:
PLSA-style EM with a fixed background component, scaled forward-backward
Baum-Welch (pi/A updated, B fixed), and log-space Viterbi. Semantics
follow the reference engine:

* EM formulas: reference ``em/Document.java:92-168``,
  ``em/EmInput.java:114-165``, report/themeExtraction.tex:19-67.
* Baum-Welch scaling + sparse transition structure (only 0->j, i->0,
  i->i are nonzero): reference ``hmm/Hmm2.java:352-531``,
  ``LifeCycleAnalyserSpark.java:100-123``.
* Viterbi in log space: reference ``hmm/Hmm2.java:164-294``.

Everything is deterministic given an explicit integer seed; seeds are
derived from natural keys (window_start, source, run) by the callers so
results are identical at any parallelism and across restarts.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = [
    "stable_seed",
    "em_fit",
    "hmm_assemble",
    "baum_welch",
    "viterbi",
    "sample_hmm_sequence",
    "kl_divergence",
    "tv_distance",
]


def stable_seed(*keys) -> int:
    """Deterministic 63-bit seed from natural keys (never row order).

    Python's builtin ``hash`` is process-salted, so we go through md5.
    """
    h = hashlib.md5("\x1f".join(str(k) for k in keys).encode()).digest()
    return int.from_bytes(h[:8], "little") & 0x7FFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# EM: PLSA mixture with fixed background component
# ---------------------------------------------------------------------------

def em_fit(
    counts: np.ndarray,          # (D, W) float64 doc-word counts (window vocab)
    p_background: np.ndarray,    # (W,) background distribution over window vocab
    k: int,
    iterations: int = 25,
    lambda_b: float = 0.95,
    seed: int = 0,
    track_loglik: bool = False,
):
    """Fit k theme distributions + doc mixing weights on one window.

    Returns ``(theta, pi, loglik)`` where theta is (k, W) rows P(w|theme),
    pi is (D, k) doc-theme weights, loglik the final data log-likelihood.
    With ``track_loglik`` the third element is the per-iteration array
    (used to assert monotonicity in tests).

    The whole iteration loop runs here, inside one task per (window, run)
    group — the reference fuses all EM iterations into a single map task
    for the same reason (no per-iteration shuffle).
    """
    rng = np.random.default_rng(seed)
    D, W = counts.shape
    # init: uniform pi, random theta rows (reference inits likewise,
    # but with an unseeded RNG — we must be reproducible).
    pi = np.full((D, k), 1.0 / k)
    theta = rng.random((k, W)) + 1e-3
    theta /= theta.sum(axis=1, keepdims=True)

    eps = 1e-300
    lb = lambda_b
    logliks = np.empty(iterations)

    # Doc-word counts are extremely sparse at real vocabulary sizes
    # (a few hundred distinct words per doc over a 10^3-10^5-word
    # window vocab), and the E-step only needs evaluation at NONZERO
    # count cells: eff = counts * z is zero elsewhere, so new_pi /
    # new_theta are scatter-sums over the nnz set. The COO path cuts
    # the per-iteration memory traffic from O(D*W) dense temporaries
    # to O(nnz) vectors — the E-step is bandwidth-bound, so this is
    # the difference between a cache-resident and a DRAM-bound EM.
    # (Summation order over the nonzeros differs from the dense path,
    # so results drift at float rounding; every checker — the DuckDB
    # oracle harness, batch/stream parity, the tests — recomputes with
    # this same kernel, so the engine stays internally consistent.)
    nnz_r, nnz_w = np.nonzero(counts)
    use_sparse = W >= 256 and nnz_r.size * 12 < D * W
    if use_sparse:
        v = counts[nnz_r, nnz_w]
        p_bg_w = p_background[nnz_w]
        for it in range(iterations):
            theta_w = theta[:, nnz_w]                    # (k, nnz)
            pi_r = pi[nnz_r]                             # (nnz, k)
            mix = np.einsum("nj,jn->n", pi_r, theta_w)   # mix at nnz cells
            denom_bg = lb * p_bg_w + (1.0 - lb) * mix + eps
            eff = v * ((1.0 - lb) * mix / denom_bg)
            scale = eff / (mix + eps)
            new_pi = np.empty_like(pi)
            new_theta = np.empty_like(theta)
            for j in range(k):
                w_j = scale * pi_r[:, j] * theta_w[j]    # r_j * eff at nnz
                new_pi[:, j] = np.bincount(nnz_r, weights=w_j, minlength=D)
                new_theta[j] = np.bincount(nnz_w, weights=w_j, minlength=W)
            pi_tot = new_pi.sum(axis=1, keepdims=True)
            pi = np.where(pi_tot > 0, new_pi / np.maximum(pi_tot, eps),
                          1.0 / k)
            th_tot = new_theta.sum(axis=1, keepdims=True)
            theta = np.where(th_tot > 0,
                             new_theta / np.maximum(th_tot, eps), 1.0 / W)
            # the log pass is diagnostics-only (fixed iteration count):
            # skip it except on the last iteration unless tracking
            if track_loglik or it == iterations - 1:
                logliks[it] = float((v * np.log(denom_bg)).sum())
        loglik = logliks if track_loglik else float(logliks[-1])
        return theta, pi, loglik

    for it in range(iterations):
        # E-step. mix[d,w] = sum_j pi[d,j] * theta[j,w]
        mix = pi @ theta                                    # (D, W)
        denom_bg = lb * p_background[None, :] + (1.0 - lb) * mix + eps
        # The per-theme weighted counts factor:
        #   w_j[d,w] = eff[d,w]/mix[d,w] * pi[d,j] * theta[j,w]
        # so both M-step sums are rank-reductions of ONE shared (D,W)
        # factor E = eff/mix — two GEMMs instead of k dense (D,W)
        # temporaries per theme:
        #   new_pi    = pi    * (E @ theta^T)    (D,k)
        #   new_theta = theta * (pi^T @ E)       (k,W)
        E = counts * ((1.0 - lb) * mix / denom_bg) / (mix + eps)
        new_pi = pi * (E @ theta.T)
        new_theta = theta * (pi.T @ E)
        # M-step normalization
        pi_tot = new_pi.sum(axis=1, keepdims=True)
        pi = np.where(pi_tot > 0, new_pi / np.maximum(pi_tot, eps), 1.0 / k)
        th_tot = new_theta.sum(axis=1, keepdims=True)
        theta = np.where(th_tot > 0, new_theta / np.maximum(th_tot, eps), 1.0 / W)
        if track_loglik or it == iterations - 1:
            logliks[it] = float((counts * np.log(denom_bg)).sum())

    loglik = logliks if track_loglik else float(logliks[-1])
    return theta, pi, loglik


# ---------------------------------------------------------------------------
# HMM: assembly, Baum-Welch (scaled), Viterbi (log space)
# ---------------------------------------------------------------------------

def hmm_assemble(p_background: np.ndarray, themes: np.ndarray):
    """Build (pi, A, B) for states {0: background, 1..k: themes}.

    Structured prior as in the reference (LifeCycleAnalyserSpark.java:93-126):
    uniform pi; A allows only 0->j (uniform over all N), i->0 (0.5),
    i->i (0.5); B row 0 = background, rows 1..k = theme distributions.
    """
    k, W = themes.shape
    n = k + 1
    pi = np.full(n, 1.0 / n)
    a = np.zeros((n, n))
    a[0, :] = 1.0 / n
    for i in range(1, n):
        a[i, 0] = 0.5
        a[i, i] = 0.5
    b = np.vstack([p_background[None, :], themes])
    # guard: emissions must have no zero column sum for observed symbols
    b = b + 1e-12
    b /= b.sum(axis=1, keepdims=True)
    return pi, a, b


# State counts up to these use the pure-Python recursion: for tiny n the
# per-step numpy dispatch (~25 us) dwarfs the ~n^2 float ops (~2 us), so
# plain floats win on the dominant T-loop. Break-even measured on this
# hardware: forward-backward flips at n=6 (the O(n^2) inner loops grow
# faster than the numpy constant), Viterbi stays ahead through n=8.
# When a C compiler is present, kernels_native replaces these paths
# with a bit-identical compiled recursion (~100x on the T loop); the
# Python paths remain the verified fallback (KERNELS_NATIVE_DISABLE=1).
_SMALL_N_LIMIT = 5
_VITERBI_SMALL_N_LIMIT = 8

try:
    from . import kernels_native as _native
    _NATIVE = _native if _native.available else None
except Exception:  # pragma: no cover — import must never break kernels
    _NATIVE = None


def _forward_backward_small(b_obs: np.ndarray, pi: np.ndarray, a: np.ndarray):
    """Pure-Python scaled forward-backward for small state counts.

    Same recurrences as the numpy path; returns numpy arrays so callers
    (khi/gamma accumulation) stay vectorized.
    """
    T, n = b_obs.shape
    rng_n = range(n)
    B = b_obs.tolist()
    A = a.tolist()
    AT = [tuple(A[i][j] for i in rng_n) for j in rng_n]  # AT[j][i]=A[i][j]
    piL = pi.tolist()
    alpha = [None] * T
    c = [0.0] * T
    b0 = B[0]
    row = [piL[i] * b0[i] for i in rng_n]
    s = sum(row)
    ct = 1.0 / (s if s > 1e-300 else 1e-300)
    alpha[0] = [x * ct for x in row]
    c[0] = ct
    for t in range(1, T):
        ap = alpha[t - 1]
        bt = B[t]
        row = []
        s = 0.0
        for j in rng_n:
            atj = AT[j]
            acc = 0.0
            for i in rng_n:
                acc += ap[i] * atj[i]
            v = acc * bt[j]
            row.append(v)
            s += v
        ct = 1.0 / (s if s > 1e-300 else 1e-300)
        alpha[t] = [x * ct for x in row]
        c[t] = ct
    beta = [None] * T
    beta[T - 1] = [c[T - 1]] * n
    for t in range(T - 2, -1, -1):
        bn = B[t + 1]
        be = beta[t + 1]
        ct = c[t]
        w = [bn[j] * be[j] for j in rng_n]
        beta[t] = [sum(A[i][j] * w[j] for j in rng_n) * ct for i in rng_n]
    c_arr = np.asarray(c)
    loglik = -float(np.log(c_arr).sum())
    return np.asarray(alpha), np.asarray(beta), c_arr, loglik


def _forward_backward(obs, pi, a, b, b_obs=None):
    """Scaled forward-backward. Returns (alpha_hat, beta_hat, c, loglik).

    Scaling per Rabiner / report/hiddenMarkovModel.tex:87-106: c[t] is the
    normalizer of alpha at t, loglik = -sum(log c).

    ``b_obs`` (the (T, n) per-step emission matrix) can be passed in to
    avoid rebuilding the gather every Baum-Welch iteration.
    """
    T = obs.shape[0]
    n = pi.shape[0]
    if b_obs is None:
        b_obs = b[:, obs].T                  # (T, n) emission prob per step
    if n <= _SMALL_N_LIMIT and T > 256:
        if _NATIVE is not None:
            return _NATIVE.forward_backward_small(b_obs, pi, a)
        return _forward_backward_small(b_obs, pi, a)
    alpha = np.empty((T, n))
    c = np.empty(T)
    alpha[0] = pi * b_obs[0]
    c[0] = 1.0 / max(alpha[0].sum(), 1e-300)
    alpha[0] *= c[0]
    for t in range(1, T):
        alpha[t] = (alpha[t - 1] @ a) * b_obs[t]
        c[t] = 1.0 / max(alpha[t].sum(), 1e-300)
        alpha[t] *= c[t]
    beta = np.empty((T, n))
    beta[T - 1] = c[T - 1]
    for t in range(T - 2, -1, -1):
        beta[t] = (a @ (b_obs[t + 1] * beta[t + 1])) * c[t]
    loglik = -float(np.log(c).sum())
    return alpha, beta, c, loglik


def _baum_welch_small(b_obs: np.ndarray, pi0, a0, max_iterations,
                      pi_threshold, a_threshold):
    """Pure-Python full Baum-Welch loop for small state counts.

    The whole iteration (forward-backward + gamma0 + khi + update +
    convergence) runs on plain floats: at the engine's typical shapes
    (T in the tens-to-hundreds, n = themes + 1 <= 5) the numpy path
    below pays ~25 us of dispatch per step/temporary, which dwarfs the
    actual math. Operation order (ascending indices, libm log, per-row
    khi normalization with the 1e-300 guard) is replicated exactly by
    kernels_native.bw_small, so the C path is bit-identical.
    """
    import math

    T, n = b_obs.shape
    rng_n = range(n)
    pi = [float(x) for x in pi0]
    a = [[float(x) for x in row] for row in a0]
    loglik = 0.0
    it = 0
    for it in range(1, max_iterations + 1):
        alpha, beta, c, _ = _forward_backward_small(
            b_obs, np.asarray(pi), np.asarray(a))
        aL = alpha.tolist()
        bL = beta.tolist()
        cL = c.tolist()
        BL = b_obs.tolist()
        ll = 0.0
        for t in range(T):
            ll += math.log(cL[t])
        loglik = -ll
        s = 0.0
        g0 = [0.0] * n
        for i in rng_n:
            v = aL[0][i] * bL[0][i] / cL[0]
            g0[i] = v
            s += v
        s = s if s > 1e-300 else 1e-300
        new_pi = [g0[i] / s for i in rng_n]
        acc = [[0.0] * n for _ in rng_n]
        for t in range(T - 1):
            bn = BL[t + 1]
            be = bL[t + 1]
            at = aL[t]
            w = [bn[j] * be[j] for j in rng_n]
            for i in rng_n:
                ai = at[i]
                ri = acc[i]
                for j in rng_n:
                    ri[j] += ai * w[j]
        d_pi = 0.0
        for i in rng_n:
            d_pi += abs(new_pi[i] - pi[i])
            pi[i] = new_pi[i]
        d_a = 0.0
        for i in rng_n:
            khi_row = [0.0] * n
            dsum = 0.0
            for j in rng_n:
                v = a[i][j] * acc[i][j]
                khi_row[j] = v
                dsum += v
            dguard = dsum if dsum > 1e-300 else 1e-300
            for j in rng_n:
                v = khi_row[j] / dguard
                d_a += abs(v - a[i][j])
                a[i][j] = v
        if d_pi < pi_threshold and d_a < a_threshold:
            break
    return (np.asarray(pi), np.asarray(a), loglik, it)


def baum_welch(
    obs: np.ndarray,
    pi0: np.ndarray,
    a0: np.ndarray,
    b: np.ndarray,
    max_iterations: int = 50,
    pi_threshold: float = 0.01,
    a_threshold: float = 0.01,
):
    """Train pi and A with B held fixed (the reference trains the same
    subset: Hmm2.java:352-531). Convergence on L1 diffs of pi and A.

    Exploits the sparse transition structure only implicitly: updates of
    structurally-zero transitions stay zero because khi is zero there.
    Returns (pi, a, loglik, n_iter).

    Dispatch: for n <= ``_SMALL_N_LIMIT`` the full loop runs in the
    small-state path (C-compiled when a compiler is present, pure
    Python otherwise — bit-identical pair) at ANY sequence length; the
    numpy body below serves larger state counts. At the engine's real
    shapes (T ~ 10^1-10^3 per (window, source)) the numpy path is
    per-step-dispatch-bound, ~100x slower than the compiled loop.
    """
    obs = np.asarray(obs, dtype=np.int64)
    pi, a = pi0.copy(), a0.copy()
    loglik = -np.inf
    it = 0
    T = obs.shape[0]
    if T < 2:
        return pi, a, 0.0, 0
    b_obs = b[:, obs].T   # B is fixed: one gather for all iterations
    n = pi.shape[0]
    if n <= _SMALL_N_LIMIT:
        if _NATIVE is not None:
            return _NATIVE.bw_small(b_obs, pi, a, max_iterations,
                                    pi_threshold, a_threshold)
        return _baum_welch_small(b_obs, pi, a, max_iterations,
                                 pi_threshold, a_threshold)
    for it in range(1, max_iterations + 1):
        alpha, beta, c, loglik = _forward_backward(obs, pi, a, b, b_obs)
        # gamma[t,i] ∝ alpha[t,i] * beta[t,i] / c[t]
        gamma = alpha * beta / c[:, None]
        gamma /= np.maximum(gamma.sum(axis=1, keepdims=True), 1e-300)
        # khi[i,j] = sum_t alpha[t,i] a[i,j] b[j,obs[t+1]] beta[t+1,j]
        khi = a * (alpha[:-1].T @ (b_obs[1:] * beta[1:]))
        denom = np.maximum(khi.sum(axis=1, keepdims=True), 1e-300)
        new_a = khi / denom
        new_pi = gamma[0]
        d_pi = float(np.abs(new_pi - pi).sum())
        d_a = float(np.abs(new_a - a).sum())
        pi, a = new_pi, new_a
        if d_pi < pi_threshold and d_a < a_threshold:
            break
    return pi, a, loglik, it


def _viterbi_small(obs: np.ndarray, log_pi, log_a, log_b) -> np.ndarray:
    """Pure-Python DP for small n (same dispatch-cost argument as
    _forward_backward_small). Tie-break: lowest from-state index."""
    T = obs.shape[0]
    n = log_pi.shape[0]
    rng_n = range(n)
    LA = log_a.tolist()          # LA[i][j]
    LBT = log_b.T.tolist()       # LBT[w][i]
    obs_l = obs.tolist()
    delta = [log_pi[i] + LBT[obs_l[0]][i] for i in rng_n]
    back = [None] * T
    for t in range(1, T):
        lb = LBT[obs_l[t]]
        bp = [0] * n
        nd = [0.0] * n
        for j in rng_n:
            best = delta[0] + LA[0][j]
            arg = 0
            for i in range(1, n):
                v = delta[i] + LA[i][j]
                if v > best:
                    best = v
                    arg = i
            bp[j] = arg
            nd[j] = best + lb[j]
        back[t] = bp
        delta = nd
    path = np.empty(T, dtype=np.int32)
    best = delta[0]
    arg = 0
    for i in range(1, n):
        if delta[i] > best:
            best = delta[i]
            arg = i
    path[T - 1] = arg
    for t in range(T - 2, -1, -1):
        arg = back[t + 1][arg]
        path[t] = arg
    return path


def viterbi(obs: np.ndarray, pi: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Log-space Viterbi decode; returns the most likely state path (T,).

    Vectorized over states; the T loop is inherent to the DP. Ties break
    toward the lower state index (np.argmax), deterministically.
    """
    obs = np.asarray(obs, dtype=np.int64)
    T = obs.shape[0]
    n = pi.shape[0]
    if T == 0:
        return np.empty(0, dtype=np.int32)
    with np.errstate(divide="ignore"):
        log_a = np.log(a)
        log_b = np.log(b)
        log_pi = np.log(pi)
    # The small-state DP is used at ANY T: Viterbi does only per-cell
    # add/max (no accumulations), so python/numpy/C paths are
    # bit-identical, and the per-step numpy dispatch loses at every
    # length that matters.
    if n <= _VITERBI_SMALL_N_LIMIT:
        if _NATIVE is not None:
            return _NATIVE.viterbi_small(obs, log_pi, log_a, log_b)
        return _viterbi_small(obs, log_pi, log_a, log_b)
    back = np.empty((T, n), dtype=np.int32)
    delta = log_pi + log_b[:, obs[0]]
    for t in range(1, T):
        cand = delta[:, None] + log_a            # (from, to)
        back[t] = np.argmax(cand, axis=0)
        delta = cand[back[t], np.arange(n)] + log_b[:, obs[t]]
    path = np.empty(T, dtype=np.int32)
    path[T - 1] = int(np.argmax(delta))
    for t in range(T - 2, -1, -1):
        path[t] = back[t + 1][path[t + 1]]
    return path


def sample_hmm_sequence(pi, a, b, length: int, seed: int):
    """Sample (states, observations) from a known HMM — fixture generator
    (mirrors the reference's generative test, Hmm.java:1208-1261)."""
    rng = np.random.default_rng(seed)
    n, W = b.shape
    states = np.empty(length, dtype=np.int32)
    obs = np.empty(length, dtype=np.int32)
    s = rng.choice(n, p=pi)
    for t in range(length):
        states[t] = s
        obs[t] = rng.choice(W, p=b[s])
        s = rng.choice(n, p=a[s])
    return states, obs


# ---------------------------------------------------------------------------
# Divergences (theme-transition kernel)
# ---------------------------------------------------------------------------

def _smooth_log_ratio(p2, p1, log_max: float):
    """clamped log(p2/p1) with NaN -> log_max (KLDivergence.java:160-167)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        r = np.log(p2 / p1)
    r = np.nan_to_num(r, nan=log_max, posinf=log_max, neginf=-log_max)
    return np.clip(r, -log_max, log_max)


def kl_divergence(p: np.ndarray, q: np.ndarray, eps: float = 1e-12,
                  log_max: float = 27.0) -> float:
    """KL(p || q) with epsilon smoothing of absent entries and clamped
    logs, matching KLDivergence.java:104-124."""
    p = np.maximum(p, eps)
    q = np.maximum(q, eps)
    return float((p * _smooth_log_ratio(p, q, log_max)).sum())


def tv_distance(p: np.ndarray, q: np.ndarray) -> float:
    """Total-variation distance (KLDivergence.java:136-151)."""
    return 0.5 * float(np.abs(p - q).sum())
