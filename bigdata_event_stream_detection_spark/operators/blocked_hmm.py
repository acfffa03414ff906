"""Block-parallel HMM training/decoding for over-long windows.

The reference's central algorithmic contribution is a block-parallel
Baum-Welch and Viterbi over one corpus-wide token sequence: per-block
normalized transition-matrix products, a scan over block boundaries,
then per-block finishing passes (``Hmm2.java:643-1301``, blocked
Viterbi ``Hmm2.java:73-298``; math in report/hiddenMarkovModel.tex:
96-180). Its weakness was driver-mediated combining — 4-5 ``collect``s
per training iteration.

This module re-expresses the same associative-scan math with the
stage structure made explicit, so each stage maps onto Spark when a
single window's sequence exceeds one task's memory:

    stage 1 (parallel per block): ``forward_block_product`` /
        ``backward_block_product`` — O(block * N^2) each, independent
    scan   (tiny, O(#blocks * N^2)): ``_scan_boundaries`` — the only
        sequential piece; #blocks values, runs wherever
    stage 2 (parallel per block): ``finish_forward`` /
        ``finish_backward`` / ``block_khi`` — reproduce the exact
        scaled alphas/betas from the boundary values
    combine: sum per-block khi/gamma partials (A12) -> new (pi, A)

For the windowed engine, sequences are bounded per (source, window)
and the whole thing runs inside one ``applyInPandas`` task (SURVEY.md
§7.3 hard-part 1); ``baum_welch_blocked``/``viterbi_blocked`` are the
memory-bounded fallback that keeps peak memory at
O(block * N + #blocks * N^2) instead of O(T * N).

Numerical note: block products are renormalized per step, so the
*normalized* per-step alphas (and hence gammas, khis, and the decoded
path) agree with the sequential kernels to float round-off; tests
assert agreement at 1e-10 and identical Viterbi paths.
"""

from __future__ import annotations

import numpy as np

from .kernels import _forward_backward  # sequential reference kernel


# ---------------------------------------------------------------------------
# forward / backward as associative scans
# ---------------------------------------------------------------------------

def forward_block_product(b_obs_block: np.ndarray, a: np.ndarray,
                          include_first_emission: bool) -> np.ndarray:
    """Normalized product of this block's step matrices M_t = A * diag(b_t).

    alpha_end ∝ alpha_start @ TA. Renormalized each step (sum=1) so the
    product never under/overflows — scale factors cancel in the
    normalized boundary alphas. (Hmm2.java:643-732.)
    """
    n = a.shape[0]
    TA = np.eye(n)
    start = 0
    if include_first_emission:
        # block 0: alpha_0 = pi * b_0 handled by caller; TA covers t>=1
        start = 1
    for t in range(start, b_obs_block.shape[0]):
        TA = TA @ (a * b_obs_block[t][None, :])
        s = TA.sum()
        if s <= 0:
            s = 1e-300
        TA /= s
    return TA


def _scan_boundaries(pi: np.ndarray, b_obs_first: np.ndarray,
                     TAs: list[np.ndarray]) -> list[np.ndarray]:
    """Sequential scan over per-block products -> normalized alpha at
    each block's *last* step. O(#blocks * N^2); the reference collects
    the same last-row summaries to the driver (Hmm2.java:737-778).

    lasts[g] = normalize( lasts[g-1] @ TA_g ), seeded with pi*b_0 (which
    TA_0 deliberately excludes).
    """
    alpha0 = pi * b_obs_first
    cur = alpha0 / max(alpha0.sum(), 1e-300)
    lasts = []
    for TA in TAs:
        cur = cur @ TA
        cur = cur / max(cur.sum(), 1e-300)
        lasts.append(cur)
    return lasts  # lasts[g] = normalized alpha at block g's final step


def finish_forward(alpha_start: np.ndarray, b_obs_block: np.ndarray,
                   a: np.ndarray, first_block: bool):
    """Recompute the exact scaled alphas and c's inside one block from
    its boundary alpha (Hmm2.java:780-851). c_t is recoverable from the
    normalized alphas alone: c_t = 1/sum(alpha_hat_{t-1} @ A * b_t)."""
    L, n = b_obs_block.shape
    alpha = np.empty((L, n))
    c = np.empty(L)
    alpha[0] = alpha_start
    c[0] = np.nan  # the boundary step's c is fixed by the caller
    for t in range(1, L):
        raw = (alpha[t - 1] @ a) * b_obs_block[t]
        c[t] = 1.0 / max(raw.sum(), 1e-300)
        alpha[t] = raw * c[t]
    return alpha, c


def blocked_forward_backward(obs: np.ndarray, pi: np.ndarray, a: np.ndarray,
                             b: np.ndarray, block_size: int = 65536):
    """Two-level scan forward-backward; returns (alpha, beta, c, loglik)
    agreeing with the sequential kernel to round-off.

    Stage calls are per-block-independent except the two tiny boundary
    scans — the exact shape of the reference's spark implementation,
    minus the per-iteration driver collect of full blocks.
    """
    T = obs.shape[0]
    n = pi.shape[0]
    b_obs = b[:, obs].T
    edges = list(range(0, T, block_size)) + [T]
    nblocks = len(edges) - 1

    # ---- forward ----
    # stage 1 (parallelizable map over blocks)
    TAs = []
    for g in range(nblocks):
        blk = b_obs[edges[g]:edges[g + 1]]
        TAs.append(forward_block_product(blk, a, include_first_emission=(g == 0)))
    # boundary scan: normalized alpha at each block's LAST step
    lasts = _scan_boundaries(pi, b_obs[0], TAs)
    # stage 2 (parallelizable map over blocks): each block rebuilds its
    # exact scaled alphas from the PREVIOUS block's boundary alpha
    alpha = np.empty((T, n))
    c = np.empty(T)
    for g in range(nblocks):
        s, e = edges[g], edges[g + 1]
        if g == 0:
            raw0 = pi * b_obs[0]
            c0 = 1.0 / max(raw0.sum(), 1e-300)
            blk_alpha, blk_c = finish_forward(raw0 * c0, b_obs[s:e], a, True)
            blk_c[0] = c0
        else:
            raw = (lasts[g - 1] @ a) * b_obs[s]
            c0 = 1.0 / max(raw.sum(), 1e-300)
            blk_alpha, blk_c = finish_forward(raw * c0, b_obs[s:e], a, False)
            blk_c[0] = c0
        alpha[s:e] = blk_alpha
        c[s:e] = blk_c

    # ---- backward (same structure, reversed) ----
    # blocks run right-to-left; each block's inner DP is the parallel
    # unit and only the N-vector boundary beta crosses blocks (the
    # reference's TB-scan, Hmm2.java:957-1128, with the boundary
    # hand-off replacing its driver collect). Reuses the forward c's,
    # so betas match the sequential kernel to round-off.
    beta = np.empty((T, n))
    beta[T - 1] = c[T - 1]
    for g in range(nblocks - 1, -1, -1):
        s, e = edges[g], edges[g + 1]
        t_start = (e - 2) if g == nblocks - 1 else (e - 1)
        for t in range(t_start, s - 1, -1):
            beta[t] = (a @ (b_obs[t + 1] * beta[t + 1])) * c[t]
    loglik = -float(np.log(c).sum())
    return alpha, beta, c, loglik


def baum_welch_blocked(
    obs: np.ndarray,
    pi0: np.ndarray,
    a0: np.ndarray,
    b: np.ndarray,
    max_iterations: int = 50,
    pi_threshold: float = 0.01,
    a_threshold: float = 0.01,
    block_size: int = 65536,
):
    """Baum-Welch using the blocked forward-backward and per-block khi
    partial sums (A12, Hmm2.java:1159-1275). Same update rule and
    convergence criteria as kernels.baum_welch."""
    obs = np.asarray(obs, dtype=np.int64)
    pi, a = pi0.copy(), a0.copy()
    T = obs.shape[0]
    if T < 2:
        return pi, a, 0.0, 0
    loglik = -np.inf
    it = 0
    for it in range(1, max_iterations + 1):
        alpha, beta, c, loglik = blocked_forward_backward(
            obs, pi, a, b, block_size)
        b_obs = b[:, obs].T
        gamma0 = alpha[0] * beta[0] / c[0]
        gamma0 = gamma0 / max(gamma0.sum(), 1e-300)
        # per-block khi partials, then combine (the A12 block sum)
        khi = np.zeros_like(a)
        for s in range(0, T - 1, block_size):
            e = min(s + block_size, T - 1)
            khi += a * (alpha[s:e].T @ (b_obs[s + 1:e + 1] * beta[s + 1:e + 1]))
        denom = np.maximum(khi.sum(axis=1, keepdims=True), 1e-300)
        new_a = khi / denom
        new_pi = gamma0
        d_pi = float(np.abs(new_pi - pi).sum())
        d_a = float(np.abs(new_a - a).sum())
        pi, a = new_pi, new_a
        if d_pi < pi_threshold and d_a < a_threshold:
            break
    return pi, a, loglik, it


# ---------------------------------------------------------------------------
# blocked Viterbi (max-plus scan)
# ---------------------------------------------------------------------------

def viterbi_blocked(obs: np.ndarray, pi: np.ndarray, a: np.ndarray,
                    b: np.ndarray, block_size: int = 131072) -> np.ndarray:
    """Log-space Viterbi with bounded memory: per-block forward DP keeps
    its back-pointer matrix and hands the N-vector delta to the next
    block; the path walk runs right-to-left over the stored pointer
    blocks (Hmm2.java:164-294, minus the per-block driver collect loop
    — in Spark the blocks are tasks and the delta hand-off is the tiny
    scan). Peak working set O(block * N) per task.

    Identical path to kernels.viterbi (same tie-break: lowest index).
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
    edges = list(range(0, T, block_size)) + [T]
    nblocks = len(edges) - 1
    backs: list[np.ndarray] = []
    delta = log_pi + log_b[:, obs[0]]
    for g in range(nblocks):
        s, e = edges[g], edges[g + 1]
        back = np.zeros((e - s, n), dtype=np.int32)
        t0 = s + 1 if g == 0 else s
        for t in range(t0, e):
            cand = delta[:, None] + log_a
            bp = np.argmax(cand, axis=0)
            back[t - s] = bp
            delta = cand[bp, np.arange(n)] + log_b[:, obs[t]]
        backs.append(back)
    path = np.empty(T, dtype=np.int32)
    state = int(np.argmax(delta))
    path[T - 1] = state
    for t in range(T - 2, -1, -1):
        g = min(t // block_size, nblocks - 1)
        # back-pointer for step t+1 lives in the block containing t+1
        g1 = min((t + 1) // block_size, nblocks - 1)
        state = int(backs[g1][(t + 1) - edges[g1]][state])
        path[t] = state
    return path
