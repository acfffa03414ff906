"""Deterministic sampling and sequence packing for training-data mixes.

A web-scale pipeline never samples with ``rand()``: a retried task or a
re-run of the job would select a different subset, breaking exactly-once
sinks, ablation reproducibility, and cross-table consistency (a doc
sampled into the text mix must also be sampled into its paired
embedding table). Both operators here are pure Column expressions keyed
by a *content-derived hash*, so the decision for a row is a function of
the row alone — stable across runs, retries, partitionings, and engines
(the md5-based ``hash60`` is reproducible in DuckDB, which is how the
oracles check these exactly).

Reference analog: the reference subsamples by year-file selection
(``RawArticleInputStream.java:69-83``); these operators generalize that
to row-level deterministic mix construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.textfns import hash60

# hash60 yields values in [0, 2^60); thresholds are fractions of this
HASH_SPACE = 1 << 60


def sample_threshold(fraction: float) -> int:
    """Integer keep-threshold for a fraction (shared with the oracles)."""
    return int(fraction * HASH_SPACE)


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep rows whose salted key-hash lands below ``fraction`` of the
    hash space — deterministic Bernoulli(fraction) sampling.

    The salt decorrelates independent samples over the same table (two
    10% samples with different salts overlap ~1%, same salt = same
    rows). One codegen'd filter, pushdown-friendly, no shuffle.
    """
    h = hash60(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string")))
    return df.filter(h < F.lit(sample_threshold(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix reweight
    (e.g. keep 90% of English, 30% of everything else). Strata absent
    from ``fractions`` are DROPPED (fraction 0): a mix definition is
    exhaustive by design, silence is exclusion.

    Still one codegen'd filter: the per-stratum threshold is a literal
    CASE over ``strata_col``; no join, no shuffle, skew-immune.
    """
    thr = F.lit(0)
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value,
                     F.lit(sample_threshold(frac))).otherwise(thr)
    h = hash60(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string")))
    return df.filter(h < thr)


def chunk_sequences(
    df: DataFrame,
    max_len: int,
    stride: int | None = None,
    min_len: int = 1,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Split over-long token arrays into model-context chunks:
    one output row per ``max_len``-token slice, starts every ``stride``
    tokens (``stride < max_len`` = overlapping contexts, the standard
    long-document training prep).

    Pure Column expressions — one generate (explode of the chunk-index
    range) and a ``slice`` per chunk, no shuffle, no Python; a doc's
    chunks stay in its input partition. The chunk-index range is
    guarded (``sequence(0, -1)`` is DESCENDING in Spark — an unguarded
    empty doc would emit phantom chunks). ``1 + ceil((n-max_len)/
    stride)`` chunk starts guarantee every token is covered while a
    tail already fully contained in the previous chunk is NOT
    re-emitted; tail chunks shorter than ``min_len`` are dropped.

    Output: input row (minus ``tokens_col``) + (chunk_id, chunk
    tokens under the original column name, n_tok).
    """
    stride = stride or max_len
    if stride <= 0 or max_len <= 0:
        raise ValueError("max_len and stride must be positive")
    n = F.size(F.col(tokens_col))
    n_chunks = (
        F.greatest(
            F.lit(0).cast("bigint"),
            F.ceil((n - F.lit(max_len)) / F.lit(float(stride))),
        ) + 1
    ).cast("bigint")
    idx = F.when(
        n > 0, F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)
    ).otherwise(F.array().cast("array<bigint>"))
    passthrough = [c for c in df.columns if c != tokens_col]
    chunk = F.slice(
        F.col(tokens_col),
        (F.col("chunk_id") * stride + 1).cast("int"),
        max_len,
    )
    return (
        df.withColumn("chunk_id", F.explode(idx))
        .withColumn(tokens_col, chunk)
        .filter(F.size(F.col(tokens_col)) >= min_len)
        .select(*passthrough, "chunk_id", tokens_col,
                F.size(F.col(tokens_col)).alias("n_tok"))
    )


def pack_assignments(
    df: DataFrame,
    budget: int,
    size_col: str = "n_chars",
    order_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """(row..., pack_id): assign rows to fixed-budget training packs.

    Within each group, rows in deterministic ``order_col`` order fill
    packs greedily by cumulative size: a row starts a new pack when the
    running total would cross the budget boundary —
    ``pack_id = floor((cumsum - size) / budget)``, the next-fit
    streaming approximation of bin packing (no reordering, exactly one
    window function, identical SQL on any engine). Oversized rows span
    their own pack ids; packs can overfill by at most one row, which is
    the standard trade against a second shuffle.

    Scale note: the ordered cumulative sum is a per-group prefix scan —
    ``group_col`` must be fine enough that one group's rows fit a task
    (source+day, shard id, ...); a GLOBAL pack order would serialize.
    """
    w = Window.partitionBy(group_col).orderBy(order_col)
    cum = F.sum(size_col).over(w)
    return df.withColumn(
        "pack_id",
        F.floor((cum - F.col(size_col)) / F.lit(budget)).cast("int"))


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic, disjoint, exhaustive train/val/test assignment.

    Adds a ``split`` column: the salted key-hash is mapped onto
    contiguous ranges of the hash space sized by ``fractions`` (which
    must sum to ~1). Properties a training pipeline needs and random
    splits don't give: REPRODUCIBLE (pure function of the key — rerun,
    re-shard, or re-ingest and every doc keeps its split), DISJOINT
    (ranges cannot overlap), and STABLE UNDER APPEND (new docs get
    splits without moving old ones). One codegen'd CASE expression, no
    shuffle, no state; same md5 hash60 the oracles reproduce in DuckDB.
    """
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    h = hash60(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string")))
    expr = None
    acc = 0.0
    # deterministic range order: iterate in insertion order so the
    # caller controls which split absorbs the rounding remainder (last)
    items = list(fractions.items())
    for name, frac in items[:-1]:
        acc += frac
        cond = h < F.lit(sample_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else \
            expr.when(cond, F.lit(name))
    last = F.lit(items[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def leakage_safe_split(
    documents: DataFrame,
    dup_pairs: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Train/val/test split that cannot leak near-duplicates across
    splits: every member of a duplicate cluster lands in the SAME split
    because the hash key is the cluster id, not the doc id. A plain
    ``hash_split`` puts two near-identical docs on opposite sides of
    the train/test boundary ~2·p·(1-p) of the time — the classic
    contamination path a dedup pass alone does not close (dedup keeps
    one representative for TRAINING, but eval-set leakage needs the
    whole cluster quarantined together).

    ``dup_pairs`` is any (doc1, doc2) near-duplicate pair table (LSH
    candidates, simhash bands, embedding near-dups). Cost on top of
    :func:`dedup.dedup_clusters` (which resolves the transitive
    closure): zero — the split itself is the same codegen CASE over
    the md5 hash60, no extra shuffle.
    """
    from .dedup import dedup_clusters

    clusters = dedup_clusters(documents, dup_pairs)
    return hash_split(
        clusters, fractions, key_col="cluster_id", salt=salt,
    ).select(key_col, "cluster_id", "split")


def topk_hash_sample(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "reservoir",
) -> DataFrame:
    """EXACT-k deterministic sample per stratum, single pass: rank rows
    within each stratum by the salted content hash and keep the k
    smallest (hash order is a uniform permutation in expectation — the
    distributed, replay-stable equivalent of per-group reservoir
    sampling). Use this when the mix spec demands exact counts;
    ``stratified_hash_sample`` (Bernoulli) when it demands exact
    per-row independence.

    Scale shape: one hash shuffle on the stratum key + a rank window —
    and the window never single-partitions because it is partitioned by
    the stratum. For heavily-skewed strata, pre-trim with a per-
    partition LIMIT-style local rank (any row globally in the top k is
    in the top k of its partition) before the shuffle; at k << rows
    that cuts the exchange to ~k x partitions rows per stratum.
    """
    h = hash60(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(strata_col).orderBy(
        h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= int(k))
        .drop("_rk")
    )


def _hashed_ngram_buckets(
    df: DataFrame,
    n_buckets: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, bucket) per word-unigram and word-bigram occurrence, hashed
    into ``n_buckets`` via the engine-portable md5 hash60."""
    from ..functions.textfns import ascii_words, shingles

    ws = ascii_words(F.col(text_col))
    feats = F.concat(ws, shingles(ws, 2))
    return (
        df.filter(F.size(ws) > 0)
        .select(F.col(id_col), F.explode(feats).alias("feat"))
        .select(
            id_col,
            F.pmod(hash60(F.col("feat")), F.lit(int(n_buckets)))
            .alias("bucket"),
        )
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 8192,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    fit hashed-ngram (unigram+bigram) bag models on the raw corpus and
    the small target/exemplar corpus, then score every raw doc with
    ``logw = sum_b count_b * (ln p_target[b] - ln p_raw[b])`` under
    Laplace smoothing ``alpha``. High logw = looks like the target.

    One row per raw doc: (id, log_weight rounded 6dp). Docs with no
    word features weight 0 (neutral).

    Scale shape: both model fits are one explode + bucket hash agg
    (<= n_buckets result rows each); the scoring join broadcasts the
    merged n_buckets-row log-ratio table onto the raw docs' bucket
    counts and finishes with ONE doc_id hash agg. Nothing corpus-sized
    shuffles more than once and the whole plan is codegen.
    """
    B = int(n_buckets)
    rb = _hashed_ngram_buckets(raw, B, id_col, text_col)
    tb = _hashed_ngram_buckets(target, B, id_col, text_col)
    rc = rb.groupBy("bucket").agg(F.count("*").alias("cr"))
    tc = tb.groupBy("bucket").agg(F.count("*").alias("ct"))
    rtot = rc.agg(F.sum("cr").alias("rt"))
    ttot = tc.agg(F.sum("ct").alias("tt"))
    model = (
        rc.join(tc, "bucket", "full_outer")
        .crossJoin(F.broadcast(rtot)).crossJoin(F.broadcast(ttot))
        .select(
            "bucket",
            (F.log((F.coalesce("ct", F.lit(0)) + F.lit(float(alpha)))
                   / (F.col("tt") + F.lit(float(alpha) * B)))
             - F.log((F.coalesce("cr", F.lit(0)) + F.lit(float(alpha)))
                     / (F.col("rt") + F.lit(float(alpha) * B))))
            .alias("log_ratio"),
        )
    )
    doc_buckets = rb.groupBy(id_col, "bucket").agg(F.count("*").alias("n"))
    scored = (
        doc_buckets.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("n") * F.col("log_ratio")).alias("_lw"))
    )
    return (
        raw.select(id_col).join(scored, id_col, "left")
        .select(
            id_col,
            F.round(F.coalesce("_lw", F.lit(0.0)), 6).alias("log_weight"),
        )
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 8192,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir",
) -> DataFrame:
    """DSIR selection: Gumbel top-k over the importance weights —
    sampling WITHOUT replacement proportional to exp(log_weight), made
    deterministic/replay-stable by deriving the Gumbel noise from the
    salted content hash instead of rand(). Returns the k selected rows
    as (id, log_weight, sample_key rounded 6dp), sorted by key desc.

    Scale shape: weights as in ``dsir_log_weights``; selection is a
    global TakeOrderedAndProject (per-partition top-k then a k-row
    merge on the driver side of the exchange — never a full sort).
    """
    w = dsir_log_weights(raw, target, n_buckets, alpha, id_col, text_col)
    h = hash60(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    u = (h + F.lit(1).cast("double")) / F.lit(float(HASH_SPACE + 1))
    key = F.col("log_weight") - F.log(-F.log(u))
    return (
        w.withColumn("sample_key", F.round(key, 6))
        .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(int(k))
    )


def temperature_mix_fractions(
    counts: dict[str, int],
    alpha: float = 0.7,
    budget_rows: int | None = None,
) -> dict[str, float]:
    """Per-stratum keep-fractions for temperature-based mix balancing
    (the multilingual p^alpha resampling rule, Conneau & Lample 2019):
    target share_i ~ n_i^alpha, so alpha < 1 upweights small strata.

    With ``budget_rows`` the fractions target that expected total row
    count (capped at 1 per stratum); without it the most-upweighted
    stratum keeps everything and the rest scale relative to it. Pure
    driver math over the (tiny) per-stratum counts — the heavy
    lifting stays in ``stratified_hash_sample``'s codegen filter.
    """
    pos = {k: n for k, n in counts.items() if n > 0}
    if not pos:
        return {k: 0.0 for k in counts}
    if budget_rows is None:
        scale = max(n ** (alpha - 1.0) for n in pos.values())
        return {k: min(1.0, (n ** (alpha - 1.0)) / scale)
                for k, n in pos.items()}
    tot = sum(n ** alpha for n in pos.values())
    return {k: min(1.0, budget_rows * (n ** alpha) / tot / n)
            for k, n in pos.items()}


def temperature_mix_sample(
    df: DataFrame,
    alpha: float = 0.7,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    budget_rows: int | None = None,
    salt: str = "tmix",
) -> DataFrame:
    """Deterministic temperature-balanced mix: one tiny per-stratum
    count agg (collected — strata cardinality, never rows), fractions
    via ``temperature_mix_fractions``, selection via the replay-stable
    ``stratified_hash_sample`` codegen filter. Two corpus scans, zero
    corpus shuffles."""
    counts = {r["k"]: r["n"] for r in
              df.groupBy(F.col(strata_col).alias("k"))
              .agg(F.count("*").alias("n")).collect()}
    fracs = temperature_mix_fractions(counts, alpha, budget_rows)
    return stratified_hash_sample(df, fracs, strata_col, key_col, salt)


def pack_sequences(
    sequences: DataFrame,
    budget_tokens: int,
    token_col: str = "tokens",
    order_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Materialize the packed training batches that ``pack_assignments``
    plans: per (group, pack), the member token arrays concatenate in
    deterministic order into ONE sequence, with the doc-boundary prefix
    array a trainer needs for attention masking / loss spans
    (boundaries[i] = start offset of doc i; last entry = total length).

    One row per pack: (group, pack_id, n_docs, total_tokens,
    boundaries, tokens). All array work is in-row Column expressions
    (sorted collect_list -> flatten / running-sum aggregate), so the
    only exchange is the (group, pack_id) hash agg and nothing crosses
    into Python. Pack sizes are budget-bounded (one-row overflow, the
    next-fit contract), so a pack row is a bounded, trainer-shaped
    unit — this is the operator whose output feeds a dataloader.
    """
    asg = pack_assignments(sequences, budget_tokens, size_col="n_tok",
                           order_col=order_col, group_col=group_col)
    parts = asg.groupBy(group_col, "pack_id").agg(
        F.array_sort(
            F.collect_list(F.struct(order_col, token_col))).alias("_p"))
    toks = F.flatten(
        F.transform(F.col("_p"), lambda s: s[token_col]))
    sizes = F.transform(F.col("_p"), lambda s: F.size(s[token_col]))
    boundaries = F.aggregate(
        sizes, F.array(F.lit(0)),
        lambda acc, x: F.concat(acc, F.array(F.element_at(acc, -1) + x)))
    return parts.select(
        group_col, "pack_id",
        F.size("_p").alias("n_docs"),
        F.element_at(boundaries, -1).alias("total_tokens"),
        boundaries.alias("boundaries"),
        toks.alias(token_col),
    )
