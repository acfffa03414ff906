"""T5 span corruption (operators/objectives.py): reconstruction
invariants, replay-stable masking, vectorized kernel == hand semantics."""

from __future__ import annotations

from bigdata_event_stream_detection_spark.operators.objectives import (
    span_corruption,
)


def test_span_corruption_invariants(spark):
    seqs = spark.createDataFrame(
        [(f"d{i}", list(range(100 + i, 160 + i))) for i in range(8)],
        "doc_id string, tokens array<int>")
    out = {r["doc_id"]: r for r in span_corruption(
        seqs, mask_rate=0.3, span_len=3).collect()}
    assert len(out) == 8
    for d, r in out.items():
        inp, tgt = list(r["input_ids"]), list(r["target_ids"])
        ns = r["n_spans"]
        # sentinel bookkeeping: input and target each carry exactly
        # one sentinel per span, numbered densely from sentinel_base
        sents = sorted((x for x in inp if x < 0), reverse=True)
        assert sents == [-1 - j for j in range(ns)]
        assert sorted((x for x in tgt if x < 0), reverse=True) == sents
        # token conservation: every original token appears exactly once
        # across (input minus sentinels) + (target minus sentinels)
        orig = sorted([x for x in inp if x >= 0]
                      + [x for x in tgt if x >= 0])
        assert orig == list(range(int(d[1:]) + 100, int(d[1:]) + 160))
        # reconstruction: splicing target spans back at the sentinel
        # positions yields the original sequence
        spans = {}
        cur = None
        for x in tgt:
            if x < 0:
                cur = x
                spans[cur] = []
            else:
                spans[cur].append(x)
        rebuilt = []
        for x in inp:
            rebuilt.extend(spans[x] if x < 0 else [x])
        assert rebuilt == list(range(int(d[1:]) + 100, int(d[1:]) + 160))

    # replay-stable: identical output at any partitioning
    again = {r["doc_id"]: (list(r["input_ids"]), list(r["target_ids"]))
             for r in span_corruption(
                 seqs.repartition(5), mask_rate=0.3, span_len=3).collect()}
    assert again == {d: (list(r["input_ids"]), list(r["target_ids"]))
                     for d, r in out.items()}


def test_mlm_masking_invariants(spark):
    from bigdata_event_stream_detection_spark.operators.objectives import (
        mlm_masking,
    )

    seqs = spark.createDataFrame(
        [(f"d{i}", list(range(1000, 1400))) for i in range(5)],
        "doc_id string, tokens array<int>")
    out = mlm_masking(seqs, mask_rate=0.15, vocab_size=30_000,
                      mask_id=-1).collect()
    assert len(out) == 5
    total = sel = masked = kept = rnd = 0
    for r in out:
        inp, lab = list(r["input_ids"]), list(r["labels"])
        assert len(inp) == len(lab) == 400
        for x, y in zip(inp, lab):
            total += 1
            if y == -100:
                assert 1000 <= x < 1400     # unselected: unchanged
                continue
            sel += 1
            if x == -1:
                masked += 1
            elif x == y:
                kept += 1
            else:
                rnd += 1
                assert 0 <= x < 30_000      # hash-derived random id
    # rates near the 15% / 80-10-10 spec on 2000 positions
    assert abs(sel / total - 0.15) < 0.03
    assert abs(masked / sel - 0.8) < 0.1
    assert kept > 0 and rnd > 0
    # replay-stable across partitionings
    again = [tuple(map(tuple, (r["input_ids"], r["labels"])))
             for r in sorted(mlm_masking(
                 seqs.repartition(4), mask_rate=0.15,
                 vocab_size=30_000, mask_id=-1).collect(),
                 key=lambda r: r["doc_id"])]
    first = [tuple(map(tuple, (r["input_ids"], r["labels"])))
             for r in sorted(out, key=lambda r: r["doc_id"])]
    assert again == first


def test_fim_transform_reorders_and_conserves(spark):
    from bigdata_event_stream_detection_spark.operators.objectives import (
        fim_transform,
    )

    seqs = spark.createDataFrame(
        [(f"d{i}", list(range(100, 130))) for i in range(40)],
        "doc_id string, tokens array<int>")
    out = fim_transform(seqs, fim_rate=0.5).collect()
    n_fim = sum(1 for r in out if r["is_fim"])
    assert 8 <= n_fim <= 32                  # hash gate near 50%
    for r in out:
        ids = list(r["output_ids"])
        if not r["is_fim"]:
            assert ids == list(range(100, 130))
            continue
        # PSM shape: [PRE] p [SUF] s [MID] m, token multiset conserved
        assert ids[0] == -1
        assert ids.count(-1) == ids.count(-2) == ids.count(-3) == 1
        i_suf, i_mid = ids.index(-3), ids.index(-2)
        assert 0 < i_suf < i_mid
        pre = ids[1:i_suf]
        suf = ids[i_suf + 1:i_mid]
        mid = ids[i_mid + 1:]
        assert pre + mid + suf == list(range(100, 130))
    # replay-stable
    again = sorted((r["doc_id"], tuple(r["output_ids"]))
                   for r in fim_transform(
                       seqs.repartition(7), fim_rate=0.5).collect())
    assert again == sorted((r["doc_id"], tuple(r["output_ids"]))
                           for r in out)


def test_objectives_stream_unchanged(spark, tmp_path):
    """All three preps are stateless row transforms: running them on a
    readStream yields exactly the batch rows (stream-static parity)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_event_stream_detection_spark.operators.objectives import (
        fim_transform, mlm_masking, span_corruption,
    )

    rows = [(f"d{i}", list(range(50 + i, 90 + i))) for i in range(6)]
    d = str(tmp_path / "seq")
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["doc_id", "tokens"]),
        schema=pa.schema([("doc_id", pa.string()),
                          ("tokens", pa.list_(pa.int32()))]),
        preserve_index=False), os.path.join(d, "a.parquet"))

    batch = spark.read.parquet(d)
    stream = (spark.readStream.schema("doc_id string, tokens array<int>")
              .parquet(d))
    for name, fn in [("sc", span_corruption), ("mlm", mlm_masking),
                     ("fim", fim_transform)]:
        q = (fn(stream).writeStream.format("memory")
             .queryName(f"obj_{name}").outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = sorted(map(tuple, spark.table(f"obj_{name}").collect()))
        want = sorted(map(tuple, fn(batch).collect()))
        assert got == want, name
