"""End-to-end training-data curation plan.

Chains the individually oracle-proven operators into the pipeline a
training run actually consumes: quality gate -> exact dedup ->
eval-set decontamination -> deterministic stratified mix sampling ->
fixed-budget sequence packing. Everything stays declarative (semi/anti
joins + codegen'd filters + one window function), so Catalyst sees ONE
plan and can reorder/push the cheap filters below the join-heavy
stages; nothing touches the driver.

Scale shape per stage:
- quality gate: per-row codegen'd expression, no shuffle;
- exact dedup:  one groupBy on md5(text) + a doc_id semi-join;
- decontamination: training shingles probe a broadcast DISTINCT
  eval-shingle set (see ``dedup.contamination_overlap``), one anti-join;
- sampling: pure content-hash filter, no shuffle, retry/replay-stable;
- packing: one per-(source) ordered prefix-scan window.

This generalizes the reference's ad-hoc preprocessing chain
(InputParser.java:94-107 tokenize/filter -> RawArticleInputStream
year-file subsetting) into the curation sweep a 100 TB corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import contamination_overlap, exact_dedup
from ..operators.sampling import (
    pack_assignments, stratified_hash_sample, temperature_mix_sample,
)
from ..operators.text import quality_scores


def curate_training_mix(
    documents: DataFrame,
    fractions: dict[str, float] | None = None,
    *,
    quality_min: float = 0.5,
    eval_docs: DataFrame | None = None,
    contamination_max: float = 0.2,
    shingle_k: int = 3,
    pack_budget: int = 4000,
    salt: str = "mix",
    label_model: tuple[DataFrame, DataFrame] | None = None,
    keep_labels: frozenset[str] | set[str] | None = None,
    temperature_alpha: float | None = None,
) -> DataFrame:
    """Curated, sampled, packed training mix over a documents table.

    Returns (doc_id, source, lang, n_chars, pack_id) for every document
    that (1) clears the composite quality score, (2) survives exact
    dedup as its group's min-doc_id representative, (3) overlaps the
    eval corpus in at most ``contamination_max`` of its distinct
    ``shingle_k``-shingles, and (4) lands in the per-``lang``
    deterministic sample defined by ``fractions`` — then assigned to
    fixed-``pack_budget`` packs per source in doc_id order.

    Optional model-based stages (both default-off; the oracle-checked
    query runs the base chain):

    * ``label_model=(cond, priors)`` + ``keep_labels`` — gate by the
      trained NB classifier's predicted label (the CCNet distillation
      pattern, operators/classifier.py): docs predicted outside
      ``keep_labels`` drop before sampling. One more semi-join; the
      model tables are vocab-bounded.
    * ``temperature_alpha`` — replace the explicit ``fractions`` mix
      with the p^alpha temperature rule over post-curation stratum
      counts (exactly one of ``fractions`` / ``temperature_alpha``
      must be given).
    """
    if (fractions is None) == (temperature_alpha is None):
        raise ValueError(
            "give exactly one of fractions / temperature_alpha")
    keep_quality = (
        quality_scores(documents)
        .filter(F.col("quality_score") >= quality_min)
        .select("doc_id")
    )
    keep_dedup = exact_dedup(documents).select(
        F.col("keep_doc_id").alias("doc_id"))
    curated = (
        documents.join(keep_quality, "doc_id", "semi")
        .join(keep_dedup, "doc_id", "semi")
    )
    if eval_docs is not None:
        contaminated = (
            contamination_overlap(documents, eval_docs, shingle_k)
            .filter(F.col("contaminated_frac") > contamination_max)
            .select("doc_id")
        )
        curated = curated.join(contaminated, "doc_id", "anti")
    if label_model is not None:
        from ..operators.classifier import nb_classify

        cond, priors = label_model
        keep_pred = (
            nb_classify(documents, cond, priors)
            .filter(F.col("pred_label").isin(*sorted(keep_labels or ())))
            .select("doc_id")
        )
        curated = curated.join(keep_pred, "doc_id", "semi")
    if temperature_alpha is not None:
        sampled = temperature_mix_sample(
            curated, alpha=temperature_alpha, strata_col="lang",
            salt=salt)
    else:
        sampled = stratified_hash_sample(
            curated, fractions, strata_col="lang", salt=salt)
    return pack_assignments(
        sampled, pack_budget, size_col="n_chars",
        order_col="doc_id", group_col="source",
    ).select("doc_id", "source", "lang", "n_chars", "pack_id")
