"""Distributed BPE trainer/encoder (operators/bpe.py).

The driver-contract gate cross-checks the full corpus against an
independent dict-based single-node trainer (tools/local_oracle.py);
this file pins the classic hand-computable merge sequence and the
greedy left-to-right overlap rule.
"""

from __future__ import annotations

import hashlib

from bigdata_event_stream_detection_spark.operators.bpe import (
    _merge_symbols,
    bpe_encode,
    bpe_train,
    encode_word,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_merge_overlap_is_greedy_left_to_right():
    assert _merge_symbols(list("aaa"), "a", "a") == ["aa", "a"]
    assert _merge_symbols(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _merge_symbols(["ab", "c"], "ab", "c") == ["abc"]


def test_bpe_train_hand_computed_merges(spark):
    # corpus: abab x3, abc x2 -> pair counts round 1:
    # (a,b): 2*3 + 1*2 = 8  (b,a): 3  (b,c): 2 -> merge 'ab'
    # round 2: (ab,ab): 3  (ab,c): 2 -> merge 'abab'
    docs = _docs(spark, ["abab abab abab", "abc abc"])
    merges = bpe_train(docs, num_merges=2, min_word_count=1).collect()
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in sorted(merges, key=lambda r: r["rank"])]
    assert got == [(1, "a", "b", 8), (2, "ab", "ab", 3)]


def test_bpe_ties_break_lexicographically(spark):
    # "xy" and "xz" both count 2: (x,y) < (x,z) must win
    docs = _docs(spark, ["xy xy xz xz"])
    merges = bpe_train(docs, num_merges=1, min_word_count=1).collect()
    assert (merges[0]["left"], merges[0]["right"]) == ("x", "y")


def test_bpe_delta_strategy_matches_recount(spark):
    """The delta-maintained pair table must yield the EXACT same merge
    sequence (ranks, pairs, counts) as the per-round recount, at both
    batch sizes, on a corpus that exercises pair creation, destruction,
    deferral, and merged-string collisions ('abc' reachable via
    ab+c and a+bc once both halves merge)."""
    texts = [
        "abab abab abab", "abc abc abc abc", "bca bca", "aabb ccdd",
        "the theme there then", "cat cats catalog", "dog dogs",
        "xy xy xz xz", "mississippi mississippi",
    ]
    docs = _docs(spark, texts * 3)
    for m in (1, 3):
        rec = bpe_train(docs, num_merges=25, min_word_count=1,
                        batch_size=m, pair_strategy="recount").collect()
        dlt = bpe_train(docs, num_merges=25, min_word_count=1,
                        batch_size=m, pair_strategy="delta").collect()
        key = lambda rows: [(r["rank"], r["left"], r["right"],
                             r["pair_count"]) for r in
                            sorted(rows, key=lambda r: r["rank"])]
        assert key(rec) == key(dlt)


def test_bpe_encode_fingerprint_and_counts(spark):
    docs = _docs(spark, ["abab abc", "zzz"])
    # round 1: (a,b)=3 wins; round 2: (z,z)=2 beats (ab,ab)=1/(ab,c)=1
    merges = bpe_train(docs, num_merges=2, min_word_count=1)
    ms = [(r["left"], r["right"]) for r in
          sorted(merges.collect(), key=lambda r: r["rank"])]
    assert ms == [("a", "b"), ("z", "z")]

    out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    # abab->[ab,ab], abc->[ab,c], zzz->[zz,z]
    assert out[0]["n_words"] == 2 and out[0]["n_bpe"] == 4
    assert out[1]["n_words"] == 1 and out[1]["n_bpe"] == 2
    assert out[0]["token_fingerprint"] == hashlib.md5(b"ab ab ab c").hexdigest()
    assert out[1]["token_fingerprint"] == hashlib.md5(b"zz z").hexdigest()

    assert encode_word("ababab", ms) == ["ab", "ab", "ab"]


def test_bpe_encode_streams_with_batch_parity(spark, tmp_path):
    """bpe_encode is a stateless Arrow map stage, so the SAME operator
    runs on a readStream of documents (train on the static corpus,
    encode continuously); streamed rows must equal the batch rows."""
    import os
    import time

    texts = ["abab abc abab", "zzz abab", "abc zz zzz"]
    docs = _docs(spark, texts)
    merges = bpe_train(docs, num_merges=2, min_word_count=1)
    batch = {tuple(r) for r in bpe_encode(docs, merges).collect()}

    d = str(tmp_path / "in")
    os.makedirs(d)
    for i, t in enumerate(texts):
        spark.createDataFrame(
            [(i, t)], "doc_id long, text string"
        ).write.mode("overwrite").parquet(os.path.join(d, f"c{i}"))
        os.utime(os.path.join(d, f"c{i}"), (time.time() + i, time.time() + i))

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1").parquet(d + "/*"))
    out = bpe_encode(stream, merges)
    q = (out.writeStream.format("memory").queryName("bpe_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("bpe_stream").collect()}
    assert got == batch


def test_bpe_batched_matches_oracle_policy(spark):
    """batch_size>1: engine == the independently-implemented batched
    greedy in tools/local_oracle.py (top-m symbol-disjoint pairs per
    round, colliding pairs deferred), and batch_size=1 is EXACTLY the
    sequential trainer."""
    import sys

    sys.path.insert(0, "tools")
    from local_oracle import _bpe_learn

    texts = ["the quick brown fox the lazy dog the end",
             "pack my box with five dozen jugs of the brown liquor",
             "dozen dozen quick quick the fox"]
    docs = _docs(spark, texts)
    wc: dict = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1

    for m in (1, 3, 8):
        got = [tuple(r) for r in sorted(
            bpe_train(docs, num_merges=9, min_word_count=1,
                      batch_size=m).collect(),
            key=lambda r: r["rank"])]
        want = _bpe_learn(wc, 9, batch_size=m)
        assert got == want, f"batch_size={m}"

    # batch_size=1 == the pre-batching sequential semantics
    seq = [tuple(r) for r in sorted(
        bpe_train(docs, num_merges=9, min_word_count=1).collect(),
        key=lambda r: r["rank"])]
    assert seq == _bpe_learn(wc, 9)


def test_bpe_batched_defers_colliding_pairs(spark):
    """A pair sharing a symbol with a higher-ranked selection in the
    same round is deferred to the NEXT round, never dropped."""
    # (a,b)=8 then (b,c)=6 collide on b; (x,y)=5 is disjoint
    docs = _docs(spark, ["ab " * 8 + "bc " * 6 + "xy " * 5])
    got = [(r["left"], r["right"]) for r in sorted(
        bpe_train(docs, num_merges=3, min_word_count=1,
                  batch_size=2).collect(), key=lambda r: r["rank"])]
    assert got[0] == ("a", "b")
    assert got[1] == ("x", "y")   # disjoint -> same round
    assert got[2] == ("b", "c")   # deferred, not dropped
