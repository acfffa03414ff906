"""Driver-contract sanity: every queries() entry runs; oracle_sql keys
are a subset; entry() yields rows on sf0.001.

Full DuckDB value comparison lives in tools/check_oracles.py (heavier);
this test keeps the contract importable and runnable.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_contract_shape():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 25
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle_sql keys missing from queries(): {unknown}"


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["window_start", "source", "theme_id", "strength"]


def test_sample_queries_run(spark):
    qs = entry_mod.queries()
    for name in ["word_count", "windowed_event_counts", "dedup_exact",
                 "ann_cosine_topk", "simhash_fingerprints"]:
        assert qs[name](spark, SF_DIR).count() >= 0
