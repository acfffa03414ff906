#!/usr/bin/env python
"""Physical-plan audit: print .explain('formatted') for each headline
query and flag the scale-critical properties:

  * PushedFilters / ReadSchema at the parquet scan (pushdown + pruning)
  * BroadcastHashJoin where a small dim is joined (no shuffle of the
    big side)
  * WholeStageCodegen coverage of the relational spine
  * unexpected CartesianProduct / single-partition Exchange

Usage: python tools/explain_audit.py [query ...] > PLANS.txt
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from bigdata_event_stream_detection_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

AUDIT = [
    "word_count", "background_model", "windowed_event_counts",
    "sliding_window_counts", "session_windows", "topk_event_types_per_user",
    "semi_join_filter", "revenue_per_nation", "dedup_exact",
    "dedup_minhash_lsh", "ann_cosine_topk", "quality_scores",
    "cube_counts", "salted_source_counts",
    "doc_cross_entropy", "repetition_stats", "contamination_overlap",
    "curated_mix", "pii_counts", "quality_gate", "corpus_stats",
    "asof_purchase_click", "burst_windows", "chunked_contexts",
    "embedding_centroids", "simhash_near_dups",
    "funnel_times_within", "tfidf_top_terms", "approx_distinct_users",
    "heavy_hitter_words", "hash_split", "duplicate_spans",
    "bigram_perplexity", "embedding_kmeans", "ann_pq_topk", "bpe_encode",
    "nb_lang_classify", "dsir_sample", "bloom_contamination",
    "temperature_mix", "semantic_dedup", "dup_graph_pagerank",
    "cm_word_counts", "ann_ivfpq_topk",
]


def main():
    names = sys.argv[1:] or AUDIT
    spark = get_spark("plan-audit", cores=8, shuffle_partitions=8)
    qmap = entry_mod.queries()
    for name in names:
        df = qmap[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        flags = []
        if re.search(r"PushedFilters: \[[^\]]", plan):
            flags.append("pushdown")
        if "BroadcastHashJoin" in plan:
            flags.append("broadcast-join")
        if "WholeStageCodegen" in plan or "codegen id" in plan:
            flags.append("codegen")
        if "CartesianProduct" in plan:
            flags.append("!!CARTESIAN")
        if re.search(r"SinglePartition", plan) and "AdaptiveSparkPlan" not in plan:
            flags.append("!!single-partition")
        print(f"\n{'=' * 70}\n## {name}  [{', '.join(flags) or 'none'}]\n{'=' * 70}")
        print(plan)


if __name__ == "__main__":
    main()
