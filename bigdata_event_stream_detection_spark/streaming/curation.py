"""Continuous training-data curation: the streaming form of
``plans/curation.curate_training_mix``.

Everything that is stateless in the batch plan streams UNCHANGED —
the quality gate, PII redaction, and deterministic stratified sampling
are pure Column expressions, so the same operators that are
oracle-proven in batch (quality_scores / pii_counts /
stratified_hash_sample) run per-micro-batch with zero extra machinery.
The two stages that need state get the streaming-native treatment:

- exact dedup -> ``dropDuplicatesWithinWatermark`` on the content hash:
  state holds one hash per distinct doc inside the watermark horizon
  and is evicted past it, so memory is bounded by the horizon's
  distinct-doc count, not the stream's history (same contract as
  streaming/dedup.dedup_exact_stream).
- sequence packing and CORPUS-RELATIVE gates (percentile cutoffs,
  decontamination against a growing eval set) need global or ordered
  state — those remain batch / ``foreachBatch`` stages by design; this
  function deliberately does not fake them in-stream.

Sampling runs BEFORE dedup so sampled-out duplicates never enter the
dedup state (the content-hash sample keys all copies of a duplicate
identically, so sampling cannot split a dup group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import stratified_hash_sample
from ..operators.text import quality_score_col, redact_pii_col


def curate_document_stream(
    stream: DataFrame,
    fractions: dict[str, float],
    *,
    quality_min: float = 0.5,
    time_col: str = "ts",
    watermark_delay: str = "30 minutes",
    strata_col: str = "lang",
    salt: str = "mix",
    gate_expr=None,
    gate_threshold: float = 0.0,
) -> DataFrame:
    """Curated continuous document stream.

    Input: a streaming documents table with at least
    (doc_id, text, ``strata_col``, ``time_col``). Output: the rows that
    clear the fixed quality floor, land in the per-stratum
    deterministic sample, and are first-within-watermark for their
    exact content — with ``text`` replaced by its PII-redacted form.
    Append-mode safe; replay/retry-stable (every decision is a pure
    function of row content except dedup, whose exactly-once dedup key
    is the content hash itself).

    ``gate_expr`` adds a MODEL-based filter in the same stateless
    spirit: pass ``classifier.nb_gate_expr(cond, priors, keep, drop)``
    (the trained NB two-class log-odds as one in-row expression) and
    rows scoring below ``gate_threshold`` drop before sampling.
    """
    s = (
        stream.withWatermark(time_col, watermark_delay)
        .filter(quality_score_col() >= F.lit(quality_min))
    )
    if gate_expr is not None:
        s = s.filter(gate_expr >= F.lit(float(gate_threshold)))
    s = s.withColumn("content_md5", F.md5(F.col("text")))
    # deterministic sample keyed by the CONTENT hash: all copies of a
    # duplicate share the decision, so sampling before dedup cannot
    # split a dup group — and sampled-out docs never touch dedup state
    s = stratified_hash_sample(
        s, fractions, strata_col=strata_col, key_col="content_md5",
        salt=salt)
    s = s.dropDuplicatesWithinWatermark(["content_md5"])
    return s.withColumn("text", redact_pii_col()).drop("content_md5")
