"""Optional C acceleration for the sequential HMM recursions.

The scaled forward-backward and Viterbi inner loops are inherently
sequential in T, so neither numpy nor Arrow can vectorize them; at the
engine's tiny state counts (N = themes + 1, typically 3-6) the
per-step cost is interpreter overhead, not math. The pure-Python fast
paths in ``kernels.py`` already beat numpy's per-step dispatch; this
module compiles the SAME recursions as a ~100-line C function at first
use (any stock ``cc``, no external deps) for another ~100x on the
dominant loop.

Bit-exactness contract: the C code replicates the *operation order* of
``kernels._forward_backward_small`` / ``kernels._viterbi_small``
exactly (same ascending-index accumulations, same max/guard, same
strict-> argmax tie-break), so results are BIT-IDENTICAL to the Python
paths on IEEE-754 doubles — enabling it never changes any output,
oracle, or parity test. Callers fall back to the Python paths when no
compiler is available (``KERNELS_NATIVE_DISABLE=1`` forces that).

The shared object is cached under the system temp dir keyed by the
md5 of the C source, written via atomic rename — concurrent Spark
Python workers compile once and dlopen the same file. On a real
cluster each executor host pays one ~0.3 s compile per engine version.

Reference: the recursions themselves follow hmm/Hmm2.java:352-531
(scaled Baum-Welch) and :164-294 (log-space Viterbi); see kernels.py.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SOURCE = r"""
#include <stdint.h>
#include <math.h>

/* Scaled forward-backward, replicating kernels._forward_backward_small:
   alpha[t,j] = (sum_i alpha[t-1,i]*A[i,j]) * B[t,j], normalized per t
   with c[t] = 1/max(sum_j, 1e-300); beta backward with the same guard.
   All accumulations ascend over the same indices as the Python lists. */
void fb_small(const double *b_obs, const double *pi, const double *a,
              int64_t T, int64_t n,
              double *alpha, double *beta, double *c)
{
    double s, acc, v, ct;
    int64_t t, i, j;
    s = 0.0;
    for (i = 0; i < n; i++) {
        v = pi[i] * b_obs[i];
        alpha[i] = v;
        s += v;
    }
    ct = 1.0 / (s > 1e-300 ? s : 1e-300);
    for (i = 0; i < n; i++) alpha[i] *= ct;
    c[0] = ct;
    for (t = 1; t < T; t++) {
        const double *ap = alpha + (t - 1) * n;
        const double *bt = b_obs + t * n;
        double *at = alpha + t * n;
        s = 0.0;
        for (j = 0; j < n; j++) {
            acc = 0.0;
            for (i = 0; i < n; i++)
                acc += ap[i] * a[i * n + j];
            v = acc * bt[j];
            at[j] = v;
            s += v;
        }
        ct = 1.0 / (s > 1e-300 ? s : 1e-300);
        for (j = 0; j < n; j++) at[j] *= ct;
        c[t] = ct;
    }
    for (i = 0; i < n; i++) beta[(T - 1) * n + i] = c[T - 1];
    for (t = T - 2; t >= 0; t--) {
        const double *bn = b_obs + (t + 1) * n;
        const double *be = beta + (t + 1) * n;
        double *bo = beta + t * n;
        double w[64];
        ct = c[t];
        for (j = 0; j < n; j++) w[j] = bn[j] * be[j];
        for (i = 0; i < n; i++) {
            acc = 0.0;
            for (j = 0; j < n; j++)
                acc += a[i * n + j] * w[j];
            bo[i] = acc * ct;
        }
    }
}

/* Full Baum-Welch loop, replicating kernels._baum_welch_small: each
   iteration runs fb_small, then loglik = -sum(log c) ascending,
   gamma0-normalized new_pi, the khi accumulation ascending in t with
   w[j] = B[t+1,j]*beta[t+1,j] hoisted per step, row-normalized new_a
   with the 1e-300 guard, and L1 convergence on (pi, A). pi/a are
   updated in place; returns the final loglik and iteration count. */
void bw_small(const double *b_obs, int64_t T, int64_t n,
              double *pi, double *a,
              int64_t max_iter, double pi_thr, double a_thr,
              double *alpha, double *beta, double *c,
              double *loglik_out, int64_t *iters_out)
{
    double acc[64 * 64], khi[64 * 64], g0[64], new_pi[64], w[64];
    double ll, s, v, d_pi, d_a, ai, dsum, dguard;
    int64_t it, t, i, j;
    it = 0;
    *loglik_out = 0.0;
    for (it = 1; it <= max_iter; it++) {
        fb_small(b_obs, pi, a, T, n, alpha, beta, c);
        ll = 0.0;
        for (t = 0; t < T; t++) ll += log(c[t]);
        *loglik_out = -ll;
        s = 0.0;
        for (i = 0; i < n; i++) {
            v = alpha[i] * beta[i] / c[0];
            g0[i] = v;
            s += v;
        }
        s = (s > 1e-300 ? s : 1e-300);
        for (i = 0; i < n; i++) new_pi[i] = g0[i] / s;
        for (i = 0; i < n * n; i++) acc[i] = 0.0;
        for (t = 0; t < T - 1; t++) {
            const double *bn = b_obs + (t + 1) * n;
            const double *be = beta + (t + 1) * n;
            const double *at = alpha + t * n;
            for (j = 0; j < n; j++) w[j] = bn[j] * be[j];
            for (i = 0; i < n; i++) {
                ai = at[i];
                for (j = 0; j < n; j++)
                    acc[i * n + j] += ai * w[j];
            }
        }
        d_pi = 0.0;
        for (i = 0; i < n; i++) {
            v = new_pi[i] - pi[i];
            d_pi += (v < 0 ? -v : v);
            pi[i] = new_pi[i];
        }
        d_a = 0.0;
        for (i = 0; i < n; i++) {
            dsum = 0.0;
            for (j = 0; j < n; j++) {
                v = a[i * n + j] * acc[i * n + j];
                khi[i * n + j] = v;
                dsum += v;
            }
            dguard = (dsum > 1e-300 ? dsum : 1e-300);
            for (j = 0; j < n; j++) {
                v = khi[i * n + j] / dguard;
                s = v - a[i * n + j];
                d_a += (s < 0 ? -s : s);
                a[i * n + j] = v;
            }
        }
        if (d_pi < pi_thr && d_a < a_thr) break;
    }
    *iters_out = (it > max_iter ? max_iter : it);
}

/* Log-space Viterbi, replicating kernels._viterbi_small: strict-> max
   keeps the LOWEST from-state index on ties; backtrack from the strict
   argmax of the final delta. */
void viterbi_small(const int64_t *obs, const double *log_pi,
                   const double *log_a, const double *log_b,
                   int64_t T, int64_t n, int64_t W,
                   int32_t *back, int32_t *path)
{
    double delta[64], nd[64], best, v;
    int64_t t, i, j, arg;
    for (i = 0; i < n; i++)
        delta[i] = log_pi[i] + log_b[i * W + obs[0]];
    for (t = 1; t < T; t++) {
        const int64_t w = obs[t];
        int32_t *bp = back + t * n;
        for (j = 0; j < n; j++) {
            best = delta[0] + log_a[j];
            arg = 0;
            for (i = 1; i < n; i++) {
                v = delta[i] + log_a[i * n + j];
                if (v > best) { best = v; arg = i; }
            }
            bp[j] = (int32_t) arg;
            nd[j] = best + log_b[j * W + w];
        }
        for (j = 0; j < n; j++) delta[j] = nd[j];
    }
    best = delta[0];
    arg = 0;
    for (i = 1; i < n; i++)
        if (delta[i] > best) { best = delta[i]; arg = i; }
    path[T - 1] = (int32_t) arg;
    for (t = T - 2; t >= 0; t--)
        path[t] = back[(t + 1) * n + path[t + 1]];
}

/* PNG scanline defilter (RFC 2083 filters 0-4), replicating
   codecs.png_decode's per-row reconstruction exactly: uint8 wraparound
   == the Python path's & 0xFF, Average's (a+b)>>1 == //2 on the
   non-negative 0..510 sum, Paeth tie-break (pa<=pb && pa<=pc) -> a,
   else (pb<=pc) -> b, else c.  The x recurrence (left dependency) is
   inherently sequential, which is why this lives in C and not numpy.
   raw is h rows of (1 filter byte + stride bytes); out is h*stride.
   *bad_row reports the first row with an unknown filter byte (else -1),
   and its filter value is left for the caller to re-read. */
void png_defilter(const uint8_t *raw, int64_t h, int64_t stride,
                  int64_t ch, uint8_t *out, int64_t *bad_row)
{
    int64_t y, x;
    int a, b, c, p, pa, pb, pc, pred;
    *bad_row = -1;
    for (y = 0; y < h; y++) {
        const uint8_t *src = raw + y * (stride + 1) + 1;
        const uint8_t *up = (y > 0) ? out + (y - 1) * stride : 0;
        uint8_t *o = out + y * stride;
        switch (raw[y * (stride + 1)]) {
        case 0:
            for (x = 0; x < stride; x++) o[x] = src[x];
            break;
        case 1:
            for (x = 0; x < stride; x++) {
                a = (x >= ch) ? o[x - ch] : 0;
                o[x] = (uint8_t)(src[x] + a);
            }
            break;
        case 2:
            for (x = 0; x < stride; x++) {
                b = up ? up[x] : 0;
                o[x] = (uint8_t)(src[x] + b);
            }
            break;
        case 3:
            for (x = 0; x < stride; x++) {
                a = (x >= ch) ? o[x - ch] : 0;
                b = up ? up[x] : 0;
                o[x] = (uint8_t)(src[x] + ((a + b) >> 1));
            }
            break;
        case 4:
            for (x = 0; x < stride; x++) {
                a = (x >= ch) ? o[x - ch] : 0;
                b = up ? up[x] : 0;
                c = (up && x >= ch) ? up[x - ch] : 0;
                p = a + b - c;
                pa = p - a; if (pa < 0) pa = -pa;
                pb = p - b; if (pb < 0) pb = -pb;
                pc = p - c; if (pc < 0) pc = -pc;
                pred = (pa <= pb && pa <= pc) ? a : ((pb <= pc) ? b : c);
                o[x] = (uint8_t)(src[x] + pred);
            }
            break;
        default:
            *bad_row = y;
            return;
        }
    }
}
"""


def _build() -> "ctypes.CDLL | None":
    if os.environ.get("KERNELS_NATIVE_DISABLE"):
        return None
    tag = hashlib.md5(_C_SOURCE.encode()).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(), f"besd_kernels_{tag}.so")
    if not os.path.exists(cache):
        try:
            with tempfile.TemporaryDirectory() as td:
                src = os.path.join(td, "kernels.c")
                tmp_so = os.path.join(td, "kernels.so")
                with open(src, "w") as f:
                    f.write(_C_SOURCE)
                subprocess.run(
                    ["cc", "-O3", "-fPIC", "-shared", "-o", tmp_so, src,
                     "-lm"],
                    check=True, capture_output=True, timeout=120)
                # atomic publish: concurrent workers race benignly
                os.replace(tmp_so, cache)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(cache)
    except OSError:
        return None
    dp = ctypes.POINTER(ctypes.c_double)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.fb_small.argtypes = [dp, dp, dp, ctypes.c_int64, ctypes.c_int64,
                             dp, dp, dp]
    lib.fb_small.restype = None
    lib.viterbi_small.argtypes = [i64p, dp, dp, dp, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_int64, i32p, i32p]
    lib.viterbi_small.restype = None
    lib.bw_small.argtypes = [dp, ctypes.c_int64, ctypes.c_int64, dp, dp,
                             ctypes.c_int64, ctypes.c_double,
                             ctypes.c_double, dp, dp, dp, dp, i64p]
    lib.bw_small.restype = None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.png_defilter.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int64, u8p, i64p]
    lib.png_defilter.restype = None
    return lib


_LIB = _build()

available = _LIB is not None

_DP = ctypes.POINTER(ctypes.c_double)
_I64P = ctypes.POINTER(ctypes.c_int64)
_I32P = ctypes.POINTER(ctypes.c_int32)


def _dp(arr: np.ndarray):
    return arr.ctypes.data_as(_DP)


def forward_backward_small(b_obs: np.ndarray, pi: np.ndarray,
                           a: np.ndarray):
    """C-accelerated scaled forward-backward (bit-identical to
    kernels._forward_backward_small). Returns (alpha, beta, c, loglik).
    """
    T, n = b_obs.shape
    assert n <= 64, "C kernels use fixed 64-state scratch buffers"
    b_obs = np.ascontiguousarray(b_obs)
    pi = np.ascontiguousarray(pi, dtype=np.float64)
    a = np.ascontiguousarray(a, dtype=np.float64)
    alpha = np.empty((T, n))
    beta = np.empty((T, n))
    c = np.empty(T)
    _LIB.fb_small(_dp(b_obs), _dp(pi), _dp(a),
                  ctypes.c_int64(T), ctypes.c_int64(n),
                  _dp(alpha), _dp(beta), _dp(c))
    loglik = -float(np.log(c).sum())
    return alpha, beta, c, loglik


def bw_small(b_obs: np.ndarray, pi0: np.ndarray, a0: np.ndarray,
             max_iterations: int, pi_threshold: float, a_threshold: float):
    """C-accelerated full Baum-Welch loop (bit-identical to
    kernels._baum_welch_small). Returns (pi, a, loglik, n_iter)."""
    T, n = b_obs.shape
    assert n <= 64, "C kernels use fixed 64-state scratch buffers"
    b_obs = np.ascontiguousarray(b_obs)
    pi = np.ascontiguousarray(pi0, dtype=np.float64).copy()
    a = np.ascontiguousarray(a0, dtype=np.float64).copy()
    alpha = np.empty((T, n))
    beta = np.empty((T, n))
    c = np.empty(T)
    loglik = np.empty(1)
    iters = np.empty(1, dtype=np.int64)
    _LIB.bw_small(_dp(b_obs), ctypes.c_int64(T), ctypes.c_int64(n),
                  _dp(pi), _dp(a), ctypes.c_int64(max_iterations),
                  ctypes.c_double(pi_threshold),
                  ctypes.c_double(a_threshold),
                  _dp(alpha), _dp(beta), _dp(c), _dp(loglik),
                  iters.ctypes.data_as(_I64P))
    return pi, a, float(loglik[0]), int(iters[0])


def viterbi_small(obs: np.ndarray, log_pi: np.ndarray, log_a: np.ndarray,
                  log_b: np.ndarray) -> np.ndarray:
    """C-accelerated log-space Viterbi (bit-identical to
    kernels._viterbi_small)."""
    T = obs.shape[0]
    n = log_pi.shape[0]
    W = log_b.shape[1]
    assert n <= 64, "C kernels use fixed 64-state scratch buffers"
    obs = np.ascontiguousarray(obs, dtype=np.int64)
    log_pi = np.ascontiguousarray(log_pi, dtype=np.float64)
    log_a = np.ascontiguousarray(log_a, dtype=np.float64)
    log_b = np.ascontiguousarray(log_b, dtype=np.float64)
    back = np.empty((T, n), dtype=np.int32)
    path = np.empty(T, dtype=np.int32)
    _LIB.viterbi_small(
        obs.ctypes.data_as(_I64P), _dp(log_pi), _dp(log_a), _dp(log_b),
        ctypes.c_int64(T), ctypes.c_int64(n), ctypes.c_int64(W),
        back.ctypes.data_as(_I32P), path.ctypes.data_as(_I32P))
    return path


def png_defilter(raw: np.ndarray, ch: int) -> np.ndarray:
    """C-accelerated PNG scanline defilter (bit-identical to the
    Python loop in ``codecs.png_decode``).  ``raw`` is the (h,
    1+stride) uint8 array of filter-byte-prefixed scanlines; returns
    the (h, stride) reconstructed pixel bytes.  Raises ValueError on
    an unknown filter byte, matching the Python path."""
    h, w1 = raw.shape
    stride = w1 - 1
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    out = np.empty((h, stride), dtype=np.uint8)
    bad = np.empty(1, dtype=np.int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    _LIB.png_defilter(raw.ctypes.data_as(u8p), ctypes.c_int64(h),
                      ctypes.c_int64(stride), ctypes.c_int64(ch),
                      out.ctypes.data_as(u8p),
                      bad.ctypes.data_as(_I64P))
    if bad[0] >= 0:
        raise ValueError(
            f"png_decode: bad filter byte {raw[bad[0], 0]}")
    return out
