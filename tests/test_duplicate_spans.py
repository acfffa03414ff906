"""Substring-level duplicate-span audit vs a brute-force reference."""

from __future__ import annotations

import re

from bigdata_event_stream_detection_spark.operators.dedup import (
    duplicate_spans,
)

N = 4

BOILER = "all rights reserved contact us for details"          # 7 words
DOCS = [
    # two docs sharing the boilerplate at different offsets, with
    # overlapping duplicated grams (coverage must merge, not double-count)
    (0, f"alpha beta gamma {BOILER} delta epsilon"),
    (1, f"{BOILER} zeta eta theta iota kappa"),
    # a third doc sharing only a SUB-span of the boilerplate
    (2, "nothing here except contact us for details maybe"),
    # clean doc, doc shorter than n, empty doc
    (3, "entirely unique words that repeat nowhere else at all"),
    (4, "too short"),
    (5, ""),
]


def _words(t):
    return [w for w in re.split("[^a-z]+", t.lower()) if w]


def _brute_force():
    grams = {}
    for doc_id, text in DOCS:
        ws = _words(text)
        for i in range(len(ws) - N + 1):
            grams.setdefault(" ".join(ws[i:i + N]), set()).add(doc_id)
    dup = {g for g, d in grams.items() if len(d) >= 2}
    out = {}
    for doc_id, text in DOCS:
        ws = _words(text)
        hit_pos = set()
        n_grams = 0
        for i in range(len(ws) - N + 1):
            if " ".join(ws[i:i + N]) in dup:
                n_grams += 1
                hit_pos.update(range(i, i + N))
        frac = round(len(hit_pos) / len(ws), 6) if ws else 0.0
        out[doc_id] = (len(ws), n_grams, len(hit_pos), frac)
    return out


def test_duplicate_spans_matches_brute_force(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["dup_grams"], r["dup_tokens"],
                         r["dup_fraction"])
           for r in duplicate_spans(df, n=N).collect()}
    truth = _brute_force()
    assert got == truth
    # every doc present, incl. clean/short/empty with zeros
    assert set(got) == {0, 1, 2, 3, 4, 5}
    assert got[3][1:] == (0, 0, 0.0)
    assert got[4][1:] == (0, 0, 0.0)
    assert got[5] == (0, 0, 0, 0.0)
    # the shared boilerplate marks both carriers but not the clean doc,
    # and doc 2's sub-span overlap is found at token granularity
    assert got[0][2] >= 7 and got[1][2] >= 7
    assert got[2][2] >= N
    # overlap merge: doc 0 has 4 duplicated grams over the 7-word
    # boilerplate -> 7 covered tokens, not 4*N
    assert truth[0][1] * N > truth[0][2]


def test_remove_duplicate_spans_cuts_exactly_the_covered_tokens(spark):
    import hashlib

    from bigdata_event_stream_detection_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r
           for r in remove_duplicate_spans(df, n=N).collect()}
    assert set(got) == {0, 1, 2, 3, 4, 5}

    grams = {}
    for doc_id, text in DOCS:
        ws = _words(text)
        for i in range(len(ws) - N + 1):
            grams.setdefault(" ".join(ws[i:i + N]), set()).add(doc_id)
    dup = {g for g, d in grams.items() if len(d) >= 2}
    for doc_id, text in DOCS:
        ws = _words(text)
        hit = set()
        for i in range(len(ws) - N + 1):
            if " ".join(ws[i:i + N]) in dup:
                hit.update(range(i, i + N))
        kept = [w for p, w in enumerate(ws) if p not in hit]
        r = got[doc_id]
        assert r["n_tokens"] == len(ws)
        assert r["n_kept"] == len(kept)
        assert r["clean_fingerprint"] == hashlib.md5(
            " ".join(kept).encode()).hexdigest()

    # the boilerplate carriers lost tokens; the clean doc lost none
    assert got[0]["n_kept"] < got[0]["n_tokens"]
    assert got[3]["n_kept"] == got[3]["n_tokens"]
    assert got[5]["n_kept"] == 0
