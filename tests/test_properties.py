"""Property-based kernel tests (hypothesis): invariants that must hold
for ANY input, not just the planted fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from bigdata_event_stream_detection_spark.operators.kernels import (
    em_fit,
    hmm_assemble,
    kl_divergence,
    tv_distance,
    viterbi,
    _forward_backward,
)


def _distribution(size):
    return arrays(np.float64, size,
                  elements=st.floats(1e-6, 1.0)).map(
        lambda v: v / v.sum())


@given(_distribution(12), _distribution(12))
@settings(max_examples=50, deadline=None)
def test_kl_nonnegative_and_zero_on_self(p, q):
    assert kl_divergence(p, p) <= 1e-9
    assert kl_divergence(p, q) >= -1e-9


@given(_distribution(12), _distribution(12))
@settings(max_examples=50, deadline=None)
def test_tv_bounds_and_symmetry(p, q):
    tv = tv_distance(p, q)
    assert -1e-12 <= tv <= 1.0 + 1e-12
    assert abs(tv - tv_distance(q, p)) < 1e-12


@given(st.integers(2, 4), st.integers(8, 30),
       st.integers(0, 2 ** 31 - 1))
@settings(max_examples=25, deadline=None)
def test_em_outputs_are_distributions(k, vocab, seed):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 5, size=(6, vocab)).astype(float)
    counts[0, 0] += 1  # ensure nonempty
    p_bg = rng.random(vocab) + 0.1
    p_bg /= p_bg.sum()
    theta, pi, ll = em_fit(counts, p_bg, k, iterations=5, seed=seed)
    assert np.allclose(theta.sum(axis=1), 1.0, atol=1e-8)
    assert np.allclose(pi.sum(axis=1), 1.0, atol=1e-8)
    assert np.isfinite(ll)


@given(st.integers(1, 3), st.integers(300, 600),
       st.integers(0, 2 ** 31 - 1))
@settings(max_examples=10, deadline=None)
def test_forward_backward_is_proper_posterior(k, T, seed):
    """gamma_t = alpha*beta/c must be a distribution at every step, and
    the small-N pure-Python path must agree with the numpy path."""
    import bigdata_event_stream_detection_spark.operators.kernels as K

    rng = np.random.default_rng(seed)
    vocab = 20
    themes = rng.random((k, vocab)) + 0.05
    themes /= themes.sum(axis=1, keepdims=True)
    p_bg = rng.random(vocab) + 0.05
    p_bg /= p_bg.sum()
    pi, a, b = hmm_assemble(p_bg, themes)
    obs = rng.integers(0, vocab, size=T)
    alpha, beta, c, ll = _forward_backward(obs, pi, a, b)
    gamma = alpha * beta / c[:, None]
    gamma /= gamma.sum(axis=1, keepdims=True)
    assert np.all(np.isfinite(gamma))
    assert np.allclose(gamma.sum(axis=1), 1.0)
    # cross-path agreement (n = k+1 <= 4 uses the python path by default)
    old = K._SMALL_N_LIMIT
    try:
        K._SMALL_N_LIMIT = 0
        a2, b2, c2, ll2 = _forward_backward(obs, pi, a, b)
    finally:
        K._SMALL_N_LIMIT = old
    assert np.allclose(alpha, a2) and abs(ll - ll2) < 1e-8


@given(st.integers(1, 3), st.integers(280, 500),
       st.integers(0, 2 ** 31 - 1))
@settings(max_examples=10, deadline=None)
def test_viterbi_path_is_valid_and_paths_agree(k, T, seed):
    import bigdata_event_stream_detection_spark.operators.kernels as K

    rng = np.random.default_rng(seed)
    vocab = 15
    themes = rng.random((k, vocab)) + 0.05
    themes /= themes.sum(axis=1, keepdims=True)
    p_bg = rng.random(vocab) + 0.05
    p_bg /= p_bg.sum()
    pi, a, b = hmm_assemble(p_bg, themes)
    obs = rng.integers(0, vocab, size=T)
    path = viterbi(obs, pi, a, b)
    n = k + 1
    assert path.shape == (T,)
    assert path.min() >= 0 and path.max() < n
    # transitions used must be structurally allowed (a > 0)
    for t in range(1, T):
        assert a[path[t - 1], path[t]] > 0
    old = K._VITERBI_SMALL_N_LIMIT
    try:
        K._VITERBI_SMALL_N_LIMIT = 0
        path2 = viterbi(obs, pi, a, b)
    finally:
        K._VITERBI_SMALL_N_LIMIT = old
    assert np.array_equal(path, path2)


# --- BPE primitives (operators/bpe.py) -------------------------------------

_word = st.text(alphabet="abcd", min_size=1, max_size=12)
_pair = st.tuples(st.text(alphabet="abcd", min_size=1, max_size=3),
                  st.text(alphabet="abcd", min_size=1, max_size=3))


@given(_word, st.lists(_pair, max_size=8))
@settings(max_examples=100, deadline=None)
def test_bpe_encode_reconstructs_the_word(word, merges):
    from bigdata_event_stream_detection_spark.operators.bpe import (
        encode_word,
    )

    toks = encode_word(word, merges)
    # merging only concatenates adjacent symbols: the word is always
    # recoverable and tokens are never empty
    assert "".join(toks) == word
    assert all(toks)


@given(st.lists(st.text(alphabet="ab", min_size=1, max_size=2),
                min_size=0, max_size=12),
       st.text(alphabet="ab", min_size=1, max_size=2),
       st.text(alphabet="ab", min_size=1, max_size=2))
@settings(max_examples=100, deadline=None)
def test_merge_pass_leaves_no_adjacent_pair(syms, left, right):
    from bigdata_event_stream_detection_spark.operators.bpe import (
        _merge_symbols,
    )

    out = _merge_symbols(list(syms), left, right)
    assert "".join(out) == "".join(syms)
    # the greedy left-to-right pass consumes every (left, right)
    # adjacency present in its input
    assert not any(a == left and b == right
                   for a, b in zip(out, out[1:]))


# --- PQ sub-quantizer (operators/similarity.py) -----------------------------

@given(st.integers(2, 6), st.integers(4, 32), st.integers(0, 3))
@settings(max_examples=25, deadline=None)
def test_kmeans_l2_centroids_shape_and_assignment_cost(k, n, seed):
    from bigdata_event_stream_detection_spark.operators.similarity import (
        _kmeans_l2,
    )

    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, 4))
    cent = _kmeans_l2(X, k, iterations=5, seed=seed)
    assert cent.shape == (min(k, n), 4)
    assert np.isfinite(cent).all()
    # trained centroids never cost more than the init choice
    def cost(C):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d2.min(axis=1).sum()
    rng2 = np.random.default_rng(seed)   # the trainer's own init draw
    init = X[rng2.choice(n, size=min(k, n), replace=False)]
    assert cost(cent) <= cost(init) + 1e-9


@given(st.dictionaries(st.text("abcde", min_size=1, max_size=4),
                       st.integers(0, 10_000), min_size=1, max_size=12),
       st.floats(0.0, 1.0))
@settings(max_examples=80, deadline=None)
def test_temperature_fractions_are_valid_and_ordered(counts, alpha):
    from bigdata_event_stream_detection_spark.operators.sampling import (
        temperature_mix_fractions,
    )

    fr = temperature_mix_fractions(counts, alpha)
    assert set(fr) >= {k for k, n in counts.items() if n > 0}
    assert all(0.0 <= v <= 1.0 for v in fr.values())
    # alpha < 1 never favors a LARGER stratum with a HIGHER fraction
    pos = sorted(((n, k) for k, n in counts.items() if n > 0))
    for (n1, k1), (n2, k2) in zip(pos, pos[1:]):
        if n1 < n2:
            assert fr[k1] >= fr[k2] - 1e-12


@given(st.dictionaries(st.text("abc", min_size=1, max_size=3),
                       st.integers(1, 10_000), min_size=1, max_size=8),
       st.floats(0.0, 1.0), st.integers(1, 20_000))
@settings(max_examples=80, deadline=None)
def test_temperature_budget_is_met_or_capped(counts, alpha, budget):
    from bigdata_event_stream_detection_spark.operators.sampling import (
        temperature_mix_fractions,
    )

    fr = temperature_mix_fractions(counts, alpha, budget_rows=budget)
    expected = sum(fr[k] * n for k, n in counts.items())
    total = sum(counts.values())
    # expected kept rows == budget, unless some stratum capped at 1.0
    # (then we can only undershoot, never overshoot)
    assert expected <= budget + 1e-6 * max(budget, 1)
    if all(v < 1.0 for v in fr.values()):
        assert abs(expected - min(budget, total)) < 1e-6 * max(budget, 1)


@given(st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)),
                min_size=1, max_size=80),
       st.floats(0.05, 0.95))
@settings(max_examples=40, deadline=None)
def test_local_pagerank_mass_conservation(pairs, damping):
    # the same recursion tools/local_oracle.pagerank_rows runs (and
    # operators/graph.pagerank matches by oracle): mass must conserve
    # on ANY undirected graph at ANY damping
    pairs = [(a, b) for a, b in pairs if a != b]
    if not pairs:
        return
    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    nbrs = [set() for _ in nodes]
    for a, b in pairs:
        nbrs[idx[a]].add(idx[b])
        nbrs[idx[b]].add(idx[a])
    deg = np.array([len(s) for s in nbrs], dtype=float)
    n = len(nodes)
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        out = r / deg
        r = (1 - damping) / n + damping * np.array(
            [sum(out[j] for j in s) for s in nbrs])
    # undirected graph, no dangling mass: total rank conserves to 1
    assert abs(r.sum() - 1.0) < 1e-9
    assert (r > 0).all()


# ---------------------------------------------------------------------------
# sequence-CEP scan vs the independent oracle state machine (no Spark)
# ---------------------------------------------------------------------------

_SEQ_TYPES = ["A", "B", "C", "D"]


@st.composite
def _seq_case(draw):
    k = draw(st.integers(1, 4))
    types = [draw(st.sampled_from(_SEQ_TYPES)) for _ in range(k)]
    quants = [draw(st.sampled_from(["1", "+", "?"])) for _ in range(k)]
    quants[0] = draw(st.sampled_from(["1", "+"]))   # anchor not optional
    steps = [(f"s{i}", t, q) for i, (t, q) in
             enumerate(zip(types, quants))]
    n = draw(st.integers(0, 60))
    evs = [(draw(st.integers(0, 300)),               # seconds
            i,                                       # event_id
            draw(st.sampled_from(_SEQ_TYPES + ["noise"])))
           for i in range(n)]
    horizon = draw(st.integers(1, 120))
    after = draw(st.sampled_from(["past_last_row", "next_row"]))
    return steps, evs, horizon, after


@given(_seq_case())
@settings(max_examples=400, deadline=None)
def test_seq_scan_equals_independent_state_machine(case):
    """The shared Spark/streaming scan kernel (_seq_scan) and the
    independently written oracle state machine
    (tools/local_oracle.seq_match_rows_pdf) must agree on EVERY random
    (pattern, event list, horizon) — including invalid patterns, where
    both sides' validator must reject identically."""
    import sys

    import pandas as pd

    sys.path.insert(0, "/root/repo/tools")
    import local_oracle as lo

    from bigdata_event_stream_detection_spark.operators.cep import (
        _seq_scan, _validate_steps,
    )

    steps, evs, horizon, after = case
    try:
        labels, types, quants = _validate_steps(steps)
    except ValueError:
        return  # '+'-shadow rejections are themselves validated elsewhere
    pdf = pd.DataFrame({
        "user_id": [1] * len(evs),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta([s for s, _, _ in evs], unit="s"),
        "event_id": [e for _, e, _ in evs],
        "event_type": [t for _, _, t in evs],
    })
    exp = {(eid, s_us, e_us, n, sc) for _, eid, s_us, e_us, n, sc
           in ((r[0], *r[1:]) for r in
               lo.seq_match_rows_pdf(pdf, steps, horizon,
                                     after_match=after))}

    tid_of = {t: i for i, t in enumerate(dict.fromkeys(types))}
    sub = pdf[pdf["event_type"].isin(tid_of)]
    us = (sub["ts"].to_numpy("datetime64[ns]").astype(np.int64)
          // 1_000)
    eid = sub["event_id"].to_numpy(np.int64)
    tid = sub["event_type"].map(tid_of).to_numpy(np.int8)
    order = np.lexsort((eid, us))
    us, eid, tid = us[order], eid[order], tid[order]
    matches, consumed = _seq_scan(
        tid, us, eid, [tid_of[t] for t in types], quants,
        horizon * 10**6, 2 ** 63, skip_past=(after == "past_last_row"))
    got = set()
    for a, last, counts in matches:
        got.add((int(eid[a]), int(us[a]), int(us[last]),
                 int(sum(counts)),
                 ",".join(f"{lb}={c}"
                          for lb, c in zip(labels, counts))))
    assert got == {(e, s, t, n, sc) for e, s, t, n, sc in exp}
    assert consumed == tid.size     # batch consumes everything
