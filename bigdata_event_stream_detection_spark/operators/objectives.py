"""Training-objective preparation over pre-tokenized sequences:

* ``span_corruption`` — T5 denoising pairs (Raffel et al., JMLR'20
  §3.1.4): contiguous spans replaced by sentinels in the input, spans
  emitted (sentinel-prefixed) as the target.
* ``mlm_masking``    — BERT MLM pairs (Devlin et al., NAACL'19): 15%
  selection with the 80/10/10 mask/keep/random split, -100-padded
  labels.
* ``fim_transform``  — fill-in-the-middle PSM reorder (Bavarian et
  al. 2022) on a gated fraction, causal passthrough for the rest.

The web-scale discipline is the same as sampling.py: NO rand(). Every
decision (span starts, selection, action, cut points, gate) derives
from the salted md5 hash of row content, so the prepared pair is a
pure function of the row — stable across runs, retries, partitionings,
and engines, and therefore oracle-checkable. Span-corruption density
is start_rate = mask_rate/span_len per position; overlapping spans
merge (the union of masked positions), matching the
non-overlapping-span construction in expectation.

Shape: masks/selections/cuts build as in-row Column expressions (the
portable hash60, JVM-side); MLM and FIM stay 100% Column work, and
only span corruption's run-splitting — a genuinely sequential per-doc
rewrite — crosses into ONE vectorized pandas kernel (slot-interleave
assembly over the boolean mask; no per-token Python). Zero shuffles
end to end, so all three run UNCHANGED on a readStream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import hash60


def span_corruption(
    sequences: DataFrame,
    mask_rate: float = 0.15,
    span_len: int = 3,
    sentinel_base: int = -1,
    salt: str = "t5",
    id_col: str = "doc_id",
    token_col: str = "tokens",
) -> DataFrame:
    """(id, n_spans, input_ids, target_ids) per sequence.

    Sentinels are ``sentinel_base - span_index`` (negative ids never
    collide with vocab ids; remap to real sentinel vocab entries with
    ``tokenize.remap_token_ids`` if the tokenizer reserves them).
    Docs where nothing masks emit with n_spans = 0 and an empty target.
    """
    period = max(1, round(float(span_len) / float(mask_rate)))
    ws = F.col(token_col)
    n = F.size(ws)
    starts = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.pmod(
            hash60(F.concat_ws("|", F.lit(salt),
                               F.col(id_col).cast("string"),
                               i.cast("string"))),
            F.lit(int(period))) == 0)
    mask = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.exists(
            F.slice(starts,
                    F.greatest(F.lit(1), i - int(span_len) + 1),
                    F.least(i, F.lit(int(span_len)))),
            lambda b: b))
    src = sequences.filter(n >= 1).select(
        F.col(id_col), ws.alias("_toks"), mask.alias("_mask"))

    def rewrite(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids, n_spans, inp, tgt = [], [], [], []
            for doc, toks, m in zip(pdf[id_col], pdf["_toks"],
                                    pdf["_mask"]):
                t = np.asarray(toks, dtype=np.int64)
                mk = np.asarray(m, dtype=bool)
                rise = mk & ~np.concatenate(([False], mk[:-1]))
                span_of = np.cumsum(rise) - 1     # valid where mk
                sentinel = int(sentinel_base) - span_of
                # order-preserving assembly via 2n interleaved slots:
                # slot 2i = the span sentinel (if a span starts at i),
                # slot 2i+1 = the token itself (input keeps unmasked
                # tokens, target keeps masked ones)
                hole = np.iinfo(np.int64).min
                s_in = np.full(2 * t.size, hole)
                s_in[0::2][rise] = sentinel[rise]
                s_in[1::2][~mk] = t[~mk]
                s_tg = np.full(2 * t.size, hole)
                s_tg[0::2][rise] = sentinel[rise]
                s_tg[1::2][mk] = t[mk]
                ids.append(doc)
                n_spans.append(int(rise.sum()))
                inp.append(s_in[s_in != hole].tolist())
                tgt.append(s_tg[s_tg != hole].tolist())
            yield pd.DataFrame({
                id_col: ids, "n_spans": n_spans,
                "input_ids": inp, "target_ids": tgt})

    id_type = dict(sequences.dtypes)[id_col]
    return src.mapInPandas(
        rewrite,
        schema=(f"{id_col} {id_type}, n_spans int, "
                "input_ids array<int>, target_ids array<int>"))


def mlm_masking(
    sequences: DataFrame,
    mask_rate: float = 0.15,
    vocab_size: int = 30_000,
    mask_id: int = -1,
    keep_frac: float = 0.1,
    random_frac: float = 0.1,
    salt: str = "mlm",
    id_col: str = "doc_id",
    token_col: str = "tokens",
) -> DataFrame:
    """BERT-style MLM pair prep (Devlin et al., NAACL'19 §3.1): select
    ~``mask_rate`` of positions; of those, 80% become ``mask_id``, 10%
    a hash-derived random vocab id, 10% stay — labels carry the
    original token at selected positions and -100 (the ignore index)
    elsewhere.

    Entirely Column expressions — both the selection and the
    replacement derive from the salted md5 hash of (doc, position), so
    the pair is replay-stable and engine-reproducible, and the whole
    op is one narrow projection: zero shuffles, zero Python.
    """
    den = 1_000_000
    sel_thr = int(mask_rate * den)
    keep_thr = int(keep_frac * den)
    rnd_thr = int((keep_frac + random_frac) * den)
    ws = F.col(token_col)
    n = F.size(ws)

    def h(tag, i):
        return F.pmod(
            hash60(F.concat_ws("|", F.lit(salt), F.lit(tag),
                               F.col(id_col).cast("string"),
                               i.cast("string"))),
            F.lit(den))

    idx = F.sequence(F.lit(1), n)
    selected = F.transform(idx, lambda i: h("sel", i) < sel_thr)
    inputs = F.transform(
        idx,
        lambda i: F.when(~F.element_at(selected, i.cast("int")),
                         F.element_at(ws, i.cast("int")))
        .when(h("act", i) < keep_thr, F.element_at(ws, i.cast("int")))
        .when(h("act", i) < rnd_thr,
              F.pmod(hash60(F.concat_ws(
                  "|", F.lit(salt), F.lit("rnd"),
                  F.col(id_col).cast("string"), i.cast("string"))),
                  F.lit(int(vocab_size))).cast("int"))
        .otherwise(F.lit(int(mask_id))))
    labels = F.transform(
        idx,
        lambda i: F.when(F.element_at(selected, i.cast("int")),
                         F.element_at(ws, i.cast("int")))
        .otherwise(F.lit(-100)))
    return sequences.filter(n >= 1).select(
        id_col,
        inputs.alias("input_ids"),
        labels.alias("labels"),
    )


def fim_transform(
    sequences: DataFrame,
    fim_rate: float = 0.5,
    pre_id: int = -1,
    mid_id: int = -2,
    suf_id: int = -3,
    salt: str = "fim",
    id_col: str = "doc_id",
    token_col: str = "tokens",
) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022,
    arXiv:2207.14255): for a hash-selected ``fim_rate`` of documents,
    split at two hash-derived cut points and emit the PSM reorder
    ``[PRE] prefix [SUF] suffix [MID] middle``; the rest pass through
    unchanged (plain causal). The trainer sees both objectives in one
    stream — the standard recipe for infill-capable code/text models.

    Pure Column expressions (slice/concat + the portable hash60):
    zero shuffles, zero Python, replay-stable; ``is_fim`` marks which
    branch a row took so mixes are auditable.
    """
    den = 1_000_000
    ws = F.col(token_col)
    n = F.size(ws)

    def h(tag):
        return hash60(F.concat_ws("|", F.lit(salt), F.lit(tag),
                                  F.col(id_col).cast("string")))

    is_fim = (F.pmod(h("gate"), F.lit(den))
              < F.lit(int(fim_rate * den))) & (n >= 3)
    # cut points in [1, n-1], ordered: prefix [1..a], middle (a..b],
    # suffix (b..n]  (middle may be empty when a == b)
    c1 = (F.pmod(h("c1"), n - 1) + 1).cast("int")
    c2 = (F.pmod(h("c2"), n - 1) + 1).cast("int")
    a, b = F.least(c1, c2), F.greatest(c1, c2)
    psm = F.concat(
        F.array(F.lit(int(pre_id))), F.slice(ws, 1, a),
        F.array(F.lit(int(suf_id))), F.slice(ws, b + 1, n - b),
        F.array(F.lit(int(mid_id))), F.slice(ws, a + 1, b - a),
    )
    return sequences.filter(n >= 1).select(
        id_col,
        is_fim.alias("is_fim"),
        F.when(is_fim, psm).otherwise(ws).alias("output_ids"),
    )
