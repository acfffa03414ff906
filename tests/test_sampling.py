"""Deterministic sampling + sequence packing (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.operators.sampling import (
    hash_sample,
    pack_assignments,
    stratified_hash_sample,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("lang"), (F.col("id") % 3).cast("string")).alias("lang"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
        (F.col("id") % 700 + 100).alias("n_chars"),
    )


def test_hash_sample_deterministic_and_partition_invariant(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in hash_sample(docs, 0.3).collect()}
    b = {r["doc_id"] for r in hash_sample(docs.repartition(13), 0.3).collect()}
    assert a == b and 0.15 < len(a) / 400 < 0.45


def test_hash_sample_salt_decorrelates(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in hash_sample(docs, 0.3, salt="a").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, 0.3, salt="b").collect()}
    assert a != b
    # ~9% expected overlap for independent 30% samples — just not equal
    # nor disjoint by construction accident
    assert 0 < len(a & b) < min(len(a), len(b))


def test_stratified_fractions_respected_and_silence_excludes(spark):
    docs = _docs(spark)
    out = stratified_hash_sample(
        docs, {"lang0": 1.0, "lang1": 0.0}, strata_col="lang")
    langs = {r["lang"] for r in out.collect()}
    assert langs == {"lang0"}  # 1.0 keeps all, 0.0 and absent drop all
    n_lang0 = docs.filter(F.col("lang") == "lang0").count()
    assert out.count() == n_lang0


def test_pack_assignments_budget_and_order(spark):
    docs = _docs(spark, 60)
    out = pack_assignments(docs, budget=2000).collect()
    by_src = {}
    for r in sorted(out, key=lambda r: (r["source"], r["doc_id"])):
        by_src.setdefault(r["source"], []).append(r)
    for rows in by_src.values():
        # pack ids are contiguous non-decreasing starting at 0
        pids = [r["pack_id"] for r in rows]
        assert pids[0] == 0
        assert all(b - a in (0, 1) or (b > a) for a, b in zip(pids, pids[1:]))
        # a row is placed at the pack of its cumsum-before-it
        cum = 0
        for r in rows:
            assert r["pack_id"] == cum // 2000
            cum += r["n_chars"]


def test_pack_assignments_partition_invariant(spark):
    docs = _docs(spark, 200)
    a = sorted((r["doc_id"], r["pack_id"])
               for r in pack_assignments(docs, 1500).collect())
    b = sorted((r["doc_id"], r["pack_id"])
               for r in pack_assignments(docs.repartition(7), 1500).collect())
    assert a == b


def test_chunk_sequences_covers_every_token_with_overlap(spark):
    from bigdata_event_stream_detection_spark.operators.sampling import (
        chunk_sequences,
    )

    rows = [("a", list(range(5))),   # 2 chunks: [0..3], [3,4]
            ("b", list(range(4))),   # exact fit: 1 chunk
            ("c", []),               # empty: no rows, no phantom chunks
            ("d", [7])]              # shorter than max_len: 1 chunk
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {}
    for r in chunk_sequences(df, max_len=4, stride=3).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["tokens"]
    assert got["a"] == {0: [0, 1, 2, 3], 1: [3, 4]}
    assert got["b"] == {0: [0, 1, 2, 3]}
    assert "c" not in got
    assert got["d"] == {0: [7]}
    # min_len drops the short tail but keeps full chunks
    tail = chunk_sequences(df, max_len=4, stride=3, min_len=3).collect()
    assert {(r["doc_id"], r["chunk_id"]) for r in tail} == {("a", 0), ("b", 0)}
    # n_tok column matches the emitted slice
    for r in chunk_sequences(df, max_len=4, stride=3).collect():
        assert r["n_tok"] == len(r["tokens"])


def test_chunk_sequences_grid_invariants(spark):
    from bigdata_event_stream_detection_spark.operators.sampling import (
        chunk_sequences,
    )

    docs = spark.createDataFrame(
        [(f"d{n}", list(range(n))) for n in range(0, 41)],
        "doc_id string, tokens array<int>")
    for max_len, stride in [(8, 8), (8, 5), (8, 3), (5, 5), (1, 1)]:
        out = chunk_sequences(docs, max_len=max_len, stride=stride).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for n in range(0, 41):
            rows = sorted(by_doc.get(f"d{n}", []),
                          key=lambda r: r["chunk_id"])
            if n == 0:
                assert rows == []
                continue
            # contiguous ids from 0; each chunk is the exact slice
            assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
            covered = set()
            for r in rows:
                start = r["chunk_id"] * stride
                assert r["tokens"] == list(range(n))[start:start + max_len]
                covered.update(r["tokens"])
            # stride <= max_len => every token appears in some chunk
            assert covered == set(range(n))
            # last chunk reaches the end; the one before it does not
            assert rows[-1]["tokens"][-1] == n - 1
            if len(rows) > 1:
                assert rows[-2]["tokens"][-1] != n - 1


def test_hash_split_disjoint_exhaustive_stable(spark):
    from pyspark.sql import functions as F

    from bigdata_event_stream_detection_spark.operators.sampling import (
        hash_split,
    )

    docs = spark.createDataFrame(
        [(f"d{i}",) for i in range(2000)], "doc_id string")
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # exhaustive + disjoint: every doc gets exactly one split
    assert sum(counts.values()) == 2000
    assert abs(counts["train"] - 1600) < 100
    assert abs(counts["val"] - 200) < 60
    # stable under append: adding docs never moves an existing one
    more = spark.createDataFrame(
        [(f"d{i}",) for i in range(3000)], "doc_id string")
    first = dict(out.collect())
    again = dict(hash_split(more,
                            {"train": 0.8, "val": 0.1, "test": 0.1})
                 .collect())
    assert all(again[k] == v for k, v in first.items())

    import pytest
    with pytest.raises(ValueError):
        hash_split(docs, {"train": 0.5, "val": 0.1})


def test_topk_hash_sample_exact_counts_and_determinism(spark):
    from bigdata_event_stream_detection_spark.operators.sampling import (
        topk_hash_sample,
    )

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr") for i in range(200)],
        "doc_id long, lang string")
    out = topk_hash_sample(df, k=10, strata_col="lang").collect()
    from collections import Counter
    by = Counter(r["lang"] for r in out)
    assert by == {"en": 10, "fr": 10}          # EXACT k per stratum

    # replay/partitioning stability: identical selection
    out2 = topk_hash_sample(df.repartition(7), k=10,
                            strata_col="lang").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))

    # a stratum smaller than k returns all its rows, never pads
    small = spark.createDataFrame(
        [(1, "de"), (2, "de")], "doc_id long, lang string")
    assert topk_hash_sample(small, k=10).count() == 2

    # the salt changes the selection (independent reservoirs)
    alt = topk_hash_sample(df, k=10, strata_col="lang", salt="other")
    assert {r["doc_id"] for r in alt.collect()} != {
        r["doc_id"] for r in out}


def test_dsir_weights_prefer_target_like_docs(spark):
    from bigdata_event_stream_detection_spark.operators.sampling import (
        dsir_log_weights,
    )

    # target speaks "alpha beta gamma"; half the raw docs do too, the
    # other half speak "delta epsilon zeta"
    target = spark.createDataFrame(
        [(1000 + i, "alpha beta gamma alpha beta") for i in range(20)],
        "doc_id long, text string")
    raw_rows = []
    for i in range(40):
        txt = ("alpha beta gamma beta" if i % 2 == 0
               else "delta epsilon zeta epsilon")
        raw_rows.append((i, txt))
    raw_rows.append((99, ""))            # featureless: neutral weight 0
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")

    w = {r["doc_id"]: r["log_weight"]
         for r in dsir_log_weights(raw, target, n_buckets=512).collect()}
    assert len(w) == 41
    assert w[99] == 0.0
    assert min(w[i] for i in range(0, 40, 2)) > max(
        w[i] for i in range(1, 40, 2))


def test_dsir_sample_is_deterministic_and_biased(spark):
    from bigdata_event_stream_detection_spark.operators.sampling import (
        dsir_sample,
    )

    target = spark.createDataFrame(
        [(1000 + i, "alpha beta gamma alpha beta") for i in range(20)],
        "doc_id long, text string")
    raw = spark.createDataFrame(
        [(i, "alpha beta gamma beta" if i % 2 == 0
          else "delta epsilon zeta epsilon") for i in range(100)],
        "doc_id long, text string")

    sel = dsir_sample(raw, target, k=20, n_buckets=512).collect()
    assert len(sel) == 20
    # importance resampling must overrepresent target-like (even) docs
    n_even = sum(1 for r in sel if r["doc_id"] % 2 == 0)
    assert n_even >= 15
    # replay-stable: same selection at any partitioning
    sel2 = dsir_sample(raw.repartition(7), target.repartition(3),
                       k=20, n_buckets=512).collect()
    assert sorted(map(tuple, sel)) == sorted(map(tuple, sel2))


def test_temperature_mix_fraction_math():
    from bigdata_event_stream_detection_spark.operators.sampling import (
        temperature_mix_fractions,
    )

    counts = {"en": 800, "fr": 100, "zh": 50}
    # alpha=1: natural distribution, keep everything
    assert temperature_mix_fractions(counts, alpha=1.0) == {
        "en": 1.0, "fr": 1.0, "zh": 1.0}
    # alpha=0: uniform target -> expected kept rows equal per stratum
    f0 = temperature_mix_fractions(counts, alpha=0.0)
    kept = {k: f0[k] * counts[k] for k in counts}
    assert abs(kept["en"] - kept["fr"]) < 1e-9
    assert abs(kept["fr"] - kept["zh"]) < 1e-9
    # budget: expected total ~ budget (caps allowed)
    fb = temperature_mix_fractions(counts, alpha=0.5, budget_rows=300)
    assert abs(sum(fb[k] * counts[k] for k in counts) - 300) < 1e-6
    # degenerate inputs
    assert temperature_mix_fractions({"x": 0}, 0.5) == {"x": 0.0}


def test_temperature_mix_sample_rebalances(spark):
    from bigdata_event_stream_detection_spark.operators.sampling import (
        temperature_mix_sample,
    )

    rows = ([(i, "en") for i in range(800)]
            + [(800 + i, "fr") for i in range(100)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mix_sample(df, alpha=0.5).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in out.collect()}
    # fr (most upweighted) keeps everything; en keeps ~sqrt ratio
    assert got["fr"] == 100
    expect_en = 800 * (800 ** -0.5) / (100 ** -0.5)   # ~283
    assert abs(got["en"] - expect_en) < 60            # hash-sample noise
    # replay-stable
    out2 = temperature_mix_sample(df.repartition(5), alpha=0.5)
    assert (sorted(map(tuple, temperature_mix_sample(df, alpha=0.5)
                       .collect()))
            == sorted(map(tuple, out2.collect())))


def test_pack_sequences_builds_trainer_shaped_packs(spark):
    from bigdata_event_stream_detection_spark.operators.sampling import (
        pack_sequences,
    )

    seqs = spark.createDataFrame(
        [(1, [1, 2, 3], 3, "A"),       # pack 0 (cum_before 0)
         (2, [4, 5], 2, "A"),          # pack 0 (cum_before 3)
         (3, [6, 7, 8, 9], 4, "A"),    # pack 1 (cum_before 5 -> //5)
         (4, [10] * 12, 12, "A"),      # oversized: own pack (cum 9)
         (5, [1], 1, "B")],
        "doc_id long, tokens array<int>, n_tok int, source string")
    got = {(r["source"], r["pack_id"]):
           (r["n_docs"], r["total_tokens"],
            list(r["boundaries"]), list(r["tokens"]))
           for r in pack_sequences(seqs, budget_tokens=5).collect()}

    assert got[("A", 0)] == (2, 5, [0, 3, 5], [1, 2, 3, 4, 5])
    assert got[("A", 1)] == (2, 16, [0, 4, 16], [6, 7, 8, 9] + [10] * 12)
    assert got[("B", 0)] == (1, 1, [0, 1], [1])
    # determinism under partitioning
    again = {(r["source"], r["pack_id"]): list(r["tokens"])
             for r in pack_sequences(
                 seqs.repartition(4), budget_tokens=5).collect()}
    assert again == {k: v[3] for k, v in got.items()}


def test_leakage_safe_split_quarantines_clusters(spark):
    """Near-duplicate clusters never straddle a split boundary, every
    doc is assigned exactly once, and singletons equal a plain
    hash_split keyed on their own id (cluster_id == doc_id)."""
    from bigdata_event_stream_detection_spark.operators.sampling import (
        hash_split, leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", "web", 10) for i in range(40)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    # two multi-doc clusters (one transitive chain), rest singletons
    pairs = spark.createDataFrame(
        [(0, 7), (7, 21), (3, 15)], "doc1 long, doc2 long")
    fr = {"train": 0.6, "val": 0.2, "test": 0.2}
    got = leakage_safe_split(docs, pairs, fr).collect()
    assert sorted(r["doc_id"] for r in got) == list(range(40))
    split_of = {r["doc_id"]: r["split"] for r in got}
    assert split_of[0] == split_of[7] == split_of[21]
    assert split_of[3] == split_of[15]
    clustered = {0, 7, 21, 3, 15}
    singles = hash_split(
        docs.filter(~F.col("doc_id").isin(list(clustered))), fr)
    for r in singles.collect():
        assert split_of[r["doc_id"]] == r["split"]
