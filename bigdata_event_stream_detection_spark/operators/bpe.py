"""Byte-pair-encoding subword tokenizer: distributed training + encode.

The spec's token-counting operator (text.token_counts) counts
whitespace/BPE-ish regex pre-tokens; this module implements the real
thing — learn a merge table from the corpus and encode documents into
subword tokens — the vocabulary-induction step a tokens-payload
training pipeline runs before anything else.

Scale shape (the reason classic BPE fits Spark): training never touches
the corpus after ONE word-count scan. The working set is the
word-frequency table (vocab-bounded — ~10^7 rows at web scale, not
10^12 tokens), each merge round is a pair-explode + hash-agg over that
table (pairs bounded by total symbols in the vocab), and the argmax
pair is a 1-row collect. Encoding is a second corpus scan with the
merge list broadcast; per-batch memoization means each DISTINCT word is
encoded once per batch, not once per occurrence.

Determinism: merge selection orders by (count desc, left asc, right
asc); ties cannot depend on partitioning. The single-node oracle
(tools/local_oracle.py:bpe_merge_rows / bpe_encode_rows) recomputes
with an independent dict-based implementation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import ascii_words


def _word_counts(documents: DataFrame, min_word_count: int) -> DataFrame:
    return (
        documents.select(
            F.explode(ascii_words(F.col("text"))).alias("word"))
        .groupBy("word").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_word_count)
    )


def _merge_symbols(syms: list, left: str, right: str) -> list:
    """One merge pass over a symbol list, left-to-right (the classic
    greedy rule: 'aaa' + (a,a) -> ['aa', 'a'])."""
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(
    documents: DataFrame,
    num_merges: int = 30,
    min_word_count: int = 2,
    batch_size: int = 1,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges (Sennrich et al., ACL'16) from
    the corpus. Returns (rank, left, right, merged, pair_count) with
    rank 1 = first/most frequent merge.

    Each round: explode adjacent symbol pairs weighted by word count,
    one hash agg, take the (count desc, left, right) argmax, apply the
    merge to the symbol table with a vectorized pandas pass. The table
    is localCheckpointed and replaced per round — ``ceil(num_merges /
    batch_size)`` tiny jobs over a vocab-bounded table, zero corpus
    rescans.

    ``batch_size > 1`` (batched greedy): each round takes the top-m
    SYMBOL-DISJOINT pairs in (count desc, left, right) order and
    applies them together, cutting driver round-trips m-fold at large
    merge counts. Disjointness makes the batch exact — merging (a,b)
    can neither create nor destroy an occurrence of a pair that shares
    no symbol with it, so every selected pair's count is the true
    corpus count at selection time, and applying the batch in rank
    order equals applying each selected pair as its own round. The
    deviation from sequential BPE (batch_size=1): a pair *created* by
    an earlier merge in the same batch (e.g. ("th","e") right after
    (t,h)) cannot be chosen until the next round, and that deferral
    compounds — later rounds see different pair counts, so the greedy
    TRAJECTORY (and eventually the merge set itself) can drift from
    the sequential trainer's, the standard tradeoff every batched BPE
    trainer makes (measured on sf0.01 at m=8: same prefix, then
    order/set drift — BENCH.md "Round 4: BPE batched merge rounds").
    Pairs that share a symbol with an already-selected pair are
    deferred within the round, never dropped. batch_size=1 is
    bit-identical to classic Sennrich BPE; the single-node oracle
    mirrors whatever batch_size the engine ran, so engine==oracle
    parity is pinned for m in {1,3,8} (tests/test_bpe.py).
    """
    spark = documents.sparkSession
    # localCheckpoint (not persist): each round's table must TRUNCATE
    # its logical plan, or 30 rounds of mapInPandas stack into a plan
    # whose Catalyst string alone OOMs the driver. On a real cluster
    # with executor loss concerns, setCheckpointDir + .checkpoint()
    # is the durable equivalent.
    vocab = _word_counts(documents, min_word_count).select(
        F.split(F.col("word"), "").alias("syms"), "cnt"
    ).localCheckpoint(eager=True)
    n_parts = vocab.rdd.getNumPartitions()

    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    merges: list[tuple] = []
    while len(merges) < num_merges:
        m = min(batch_size, num_merges - len(merges))
        pairs = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode(F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i-1] as l, syms[i] as r))")).alias("p"))
            .groupBy("p.l", "p.r").agg(F.sum("cnt").alias("n"))
        )
        # over-fetch: symbol collisions skip candidates, so pull extra
        # rows per round (a deferred pair is re-offered next round)
        top = pairs.orderBy(F.col("n").desc(), F.col("l").asc(),
                            F.col("r").asc()).limit(4 * m + 4).collect()
        if not top:
            break
        chosen: list[tuple] = []
        used: set = set()
        for row in top:
            l, r = row["l"], row["r"]
            if l in used or r in used:
                continue  # deferred to the next round, not skipped
            chosen.append((len(merges) + len(chosen) + 1, l, r,
                           l + r, int(row["n"])))
            used.update((l, r))
            if len(chosen) >= m:
                break
        merges.extend(chosen)
        batch = [(l, r) for _, l, r, _, _ in chosen]

        def apply_merge(batches, _batch=tuple(batch)):
            for pdf in batches:
                if pdf.empty:
                    continue
                pdf = pdf.copy()
                syms = pdf["syms"]
                for _l, _r in _batch:
                    syms = [_merge_symbols(list(s), _l, _r) for s in syms]
                pdf["syms"] = syms
                yield pdf

        # incremental rewrite: only words CONTAINING a winning pair
        # cross the Python/Arrow boundary; the rest of the vocab table
        # passes through untouched JVM-side. (At real-tokenizer merge
        # counts (~30k) the remaining cost is the per-round pair
        # recount — the next step would be delta-updating pair counts
        # from the touched rows only.)
        pair_here = F.expr(
            "exists(sequence(1, size(syms) - 1), i -> " + " OR ".join(
                f"(syms[i-1] = '{l}' AND syms[i] = '{r}')"
                for l, r in batch) + ")")
        mask = F.when(F.size("syms") >= 2, pair_here).otherwise(F.lit(False))
        # coalesce: the union concatenates both branches' partitions —
        # without pinning the count it doubles per round (2^rounds)
        vocab = (
            vocab.filter(mask)
            .mapInPandas(apply_merge,
                         schema="syms array<string>, cnt bigint")
            .unionByName(vocab.filter(~mask))
            .coalesce(n_parts)
            .localCheckpoint(eager=True)
        )

    return spark.createDataFrame(
        merges or [],
        "rank int, left string, right string, merged string, "
        "pair_count bigint")


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply merges in rank order to one word (char-split start)."""
    syms = list(word)
    for left, right in merges:
        if len(syms) < 2:
            break
        syms = _merge_symbols(syms, left, right)
    return syms


def bpe_encode(
    documents: DataFrame,
    merges: DataFrame,
) -> DataFrame:
    """Encode documents with a trained merge table. Emits per doc:

    - ``n_words``          — ascii pre-tokens
    - ``n_bpe``            — subword tokens after merging
    - ``token_fingerprint``— md5 of the space-joined subword sequence
                             (order-exact content check without shipping
                             the full token arrays to a comparator)

    The merge list is collected once (num_merges rows — bounded) and
    broadcast inside the encode UDF; per-batch memoization encodes each
    distinct word once. One corpus scan, one Arrow stage, no shuffle.
    """
    spark = documents.sparkSession
    mrows = sorted(
        ((r["rank"], r["left"], r["right"]) for r in merges.collect()))
    mlist = [(l, r) for _, l, r in mrows]
    bc = spark.sparkContext.broadcast(mlist)

    def encode(batches):
        ms = bc.value
        memo: dict[str, list[str]] = {}
        import hashlib
        for pdf in batches:
            if pdf.empty:
                continue
            n_words, n_bpe, fps = [], [], []
            for ws in pdf["ws"]:
                toks: list[str] = []
                for w in ws:
                    enc = memo.get(w)
                    if enc is None:
                        enc = encode_word(w, ms)
                        memo[w] = enc
                    toks.extend(enc)
                n_words.append(len(ws))
                n_bpe.append(len(toks))
                fps.append(hashlib.md5(
                    " ".join(toks).encode()).hexdigest())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "n_words": n_words,
                "n_bpe": n_bpe, "token_fingerprint": fps})

    id_type = dict(documents.dtypes)["doc_id"]
    return documents.select(
        "doc_id", ascii_words(F.col("text")).alias("ws")
    ).mapInPandas(
        encode,
        schema=f"doc_id {id_type}, n_words bigint, n_bpe bigint, "
               "token_fingerprint string")
