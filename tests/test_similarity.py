"""Embedding-column relational operators (operators/similarity.py).

The ANN top-k paths are exercised end-to-end by the driver-contract
oracle gate (ann_cosine_topk / ann_lsh_topk / ann_ivf_topk at sf0.01);
this file unit-tests the aggregate surfaces on planted vectors.
"""

from __future__ import annotations

from bigdata_event_stream_detection_spark.operators.similarity import (
    embedding_centroids,
)


def test_embedding_centroids_dimension_wise_mean(spark):
    rows = [
        (0, [1.0, 2.0, 3.0], "a"),
        (1, [3.0, 4.0, 5.0], "a"),
        (2, [10.0, 0.0, -2.0], "b"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>, label string")
    got = {(r["label"], r["dim"]): r["centroid"]
           for r in embedding_centroids(df).collect()}
    assert got == {
        ("a", 0): 2.0, ("a", 1): 3.0, ("a", 2): 4.0,
        ("b", 0): 10.0, ("b", 1): 0.0, ("b", 2): -2.0,
    }


def test_embedding_kmeans_recovers_planted_clusters(spark):
    import numpy as np

    from bigdata_event_stream_detection_spark.operators.similarity import (
        embedding_kmeans,
    )

    # 3 planted directions in R^8, 40 vectors each with small seeded
    # noise: spherical k-means must put every vector with its plant
    rng = np.random.default_rng(7)
    base = np.eye(8)[:3]
    rows = []
    for i in range(120):
        v = base[i % 3] + 0.05 * rng.standard_normal(8)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = embedding_kmeans(emb, k=3, iterations=5).collect()
    assert len(out) == 120
    got = {r["vec_id"]: r["cluster"] for r in out}
    # cluster labels are arbitrary but must be constant within a plant
    # and distinct across plants
    plants = [{got[i] for i in range(p, 120, 3)} for p in range(3)]
    assert all(len(s) == 1 for s in plants)
    assert len(plants[0] | plants[1] | plants[2]) == 3
    # tight clusters: cosine to own centroid near 1
    assert min(r["cos"] for r in out) > 0.95

    # determinism under repartitioning (init is id-ordered, updates are
    # full-cluster means): identical assignment rows
    out2 = embedding_kmeans(emb.repartition(7), k=3, iterations=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_pq_topk_recall_vs_brute_force(spark):
    import numpy as np

    from bigdata_event_stream_detection_spark.operators.similarity import (
        cosine_topk,
        pq_topk,
    )

    # 200 vectors in R^16 from 4 planted directions + noise: PQ at
    # m=8, ksub=16 must recover most of the exact top-5 neighborhood
    rng = np.random.default_rng(11)
    base = np.eye(16)[:4]
    rows = [(i, [float(x) for x in base[i % 4] + 0.1 * rng.standard_normal(16)])
            for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter("vec_id < 5")

    exact = cosine_topk(emb, q, k=5).collect()
    approx = pq_topk(emb, q, k=5, m=8, ksub=16).collect()

    ex = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.6, f"PQ recall {recall} too low"
    # every query answered with a full k list
    from collections import Counter
    per_q = Counter(r["query_id"] for r in approx)
    assert all(v == 5 for v in per_q.values())

    # determinism under repartitioning (codebooks from id-ordered
    # sample; partial top-k tie-broken by neighbor id)
    approx2 = pq_topk(emb.repartition(7), q, k=5, m=8, ksub=16).collect()
    assert sorted(map(tuple, approx)) == sorted(map(tuple, approx2))


def test_pq_rescoring_recovers_exact_neighbors(spark):
    import numpy as np

    from bigdata_event_stream_detection_spark.operators.similarity import (
        cosine_topk,
        pq_topk,
    )

    rng = np.random.default_rng(23)
    base = np.eye(16)[:4]
    rows = [(i, [float(x) for x in base[i % 4] + 0.1 * rng.standard_normal(16)])
            for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter("vec_id < 5")

    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, q, k=5).collect()}

    def recall(df):
        got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
        return len(exact & got) / len(exact)

    plain = recall(pq_topk(emb, q, k=5, m=4, ksub=16))
    rescored_df = pq_topk(emb, q, k=5, m=4, ksub=16, rescore_factor=8)
    rescored = recall(rescored_df)
    # the exact rerank can only help, and with an 8x shortlist over a
    # 200-vector corpus it should be near-perfect
    assert rescored >= plain
    assert rescored >= 0.9, f"rescored recall {rescored}"
    # rescored scores are EXACT cosines: they must match cosine_topk's
    # values for every (query, neighbor) both return
    exact_vals = {(r["query_id"], r["neighbor_id"]): r["cos"]
                  for r in cosine_topk(emb, q, k=5).collect()}
    for r in rescored_df.collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_vals:
            assert r["score"] == exact_vals[key]

def test_semantic_dedup_keeps_least_central_member(spark):
    import numpy as np

    from bigdata_event_stream_detection_spark.operators.dedup import (
        semantic_dedup,
    )

    # two well-separated plants; plant 0 carries a near-duplicate group
    # of three (ids 0,4,6: same direction, tilts 0/0.02/0.04 along e1 —
    # a mutually-connected clique at threshold 0.998, pairwise cos
    # >= cos(0.04) ~ 0.9992); plant 1 has only singletons
    rng = np.random.default_rng(11)
    base = np.eye(8)[:2]
    tilt = {0: 0.0, 4: 0.02, 6: 0.04}
    rows = []
    for i in range(40):
        p = i % 2
        if i in tilt:
            v = base[0] + tilt[i] * np.eye(8)[1]
        else:
            v = base[p] + 0.2 * rng.standard_normal(8)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = semantic_dedup(emb, k=2, iterations=5, threshold=0.998).toPandas()
    assert len(out) == 40                      # verdict row per vector
    by_id = out.set_index("vec_id")
    group = by_id.loc[[0, 4, 6]]
    assert set(group["cluster"]) == {group["cluster"].iloc[0]}
    # exactly one survivor: the member LEAST similar to its centroid
    survivor = group["centroid_cos"].idxmin()
    assert group.loc[survivor, "kept"] == 1
    assert group["kept"].sum() == 1
    # everything outside the planted dup group survives
    others = by_id.drop([0, 4, 6])
    assert (others["kept"] == 1).all()


def test_semantic_dedup_blocked_matches_single_block(spark):
    import numpy as np

    from bigdata_event_stream_detection_spark.operators.dedup import (
        semantic_dedup,
    )

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(8)])
            for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(k=3, iterations=4, threshold=0.6)
    # block_target small enough to force multi-block clusters: the
    # within-cluster block x block fan-out must agree with the
    # single-GEMM-per-cluster answer, at any partitioning
    a = semantic_dedup(emb, block_target=7, **kw).collect()
    b = semantic_dedup(emb.repartition(5), block_target=4096, **kw).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ivfpq_recall_and_determinism(spark):
    import numpy as np
    from collections import Counter

    from bigdata_event_stream_detection_spark.operators.similarity import (
        cosine_topk,
        ivf_pq_topk,
    )

    # planted structure at BOTH levels: 4 plants (the coarse cells) x 5
    # sub-clusters each (what the residual codes must separate — with
    # IID noise only, within-cell ranking is information-free and ANY
    # quantizer fails; real corpora have the sub-structure)
    rng = np.random.default_rng(31)
    base = np.eye(16)[:4]
    sub = np.eye(16)[4:9] * 0.4
    rows = [(i, [float(x) for x in
                 base[i % 4] + sub[(i // 4) % 5]
                 + 0.03 * rng.standard_normal(16)])
            for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter("vec_id < 5")

    exact = cosine_topk(emb, q, k=5).collect()
    approx = ivf_pq_topk(emb, q, k=5, n_centroids=4, n_probe=2,
                         m=8, ksub=16).collect()
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.6, f"IVF-PQ recall {recall} too low"
    per_q = Counter(r["query_id"] for r in approx)
    assert all(v == 5 for v in per_q.values())

    approx2 = ivf_pq_topk(emb.repartition(7), q, k=5, n_centroids=4,
                          n_probe=2, m=8, ksub=16).collect()
    assert sorted(map(tuple, approx)) == sorted(map(tuple, approx2))


def test_sign_pack_expr_matches_numpy(spark):
    """The scan-time sign-bit packing must equal a reference numpy
    packing, including dims that are not a multiple of 64 (tail word)
    and exact zeros (bit NOT set: strict > 0)."""
    import numpy as np

    from bigdata_event_stream_detection_spark.operators.similarity import (
        _sign_pack_expr,
    )

    rng = np.random.default_rng(5)
    rows = []
    for i, d in enumerate((3, 64, 70, 128, 130)):
        v = rng.standard_normal(d).astype(np.float32)
        v[0] = 0.0  # exact zero -> bit 0
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    got = {r["vec_id"]: list(r["bits"]) for r in df.select(
        "vec_id", _sign_pack_expr("embedding").alias("bits")).collect()}
    for i, vec in rows:
        v = np.asarray(vec)
        want = []
        for w in range((len(v) + 63) // 64):
            word = 0
            for j in range(64):
                idx = 64 * w + j
                if idx < len(v) and v[idx] > 0:
                    word |= 1 << j
            # numpy-independent reference; emulate int64 wraparound
            want.append(word - (1 << 64) if word >= (1 << 63) else word)
        assert got[i] == want, i


def test_binary_hamming_full_candidates_equals_exact(spark):
    """With candidates >= corpus size the Hamming shortlist keeps
    everything, so the rescore stage must reproduce cosine_topk
    EXACTLY (ids, ranks, rounded cosines)."""
    import numpy as np

    from bigdata_event_stream_detection_spark.operators.similarity import (
        binary_hamming_topk,
        cosine_topk,
    )

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(24)])
            for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 4")
    want = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cos"])
            for r in cosine_topk(df, q, k=5).collect()}
    got = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cos"])
           for r in binary_hamming_topk(df, q, k=5,
                                        candidates=100).collect()}
    assert got == want


def test_binary_hamming_shortlist_is_deterministic(spark):
    """Same input, different partitioning -> identical rows (the
    shortlist's (hamming, neighbor_id) total order is partition-
    independent)."""
    import numpy as np

    from bigdata_event_stream_detection_spark.operators.similarity import (
        binary_hamming_topk,
    )

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(16)])
            for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 3")
    a = sorted(map(tuple, binary_hamming_topk(
        df, q, k=4, candidates=8).collect()))
    b = sorted(map(tuple, binary_hamming_topk(
        df.repartition(13), q, k=4, candidates=8).collect()))
    assert a == b and len(a) == 12
