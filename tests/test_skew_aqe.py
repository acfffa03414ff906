"""Evidence that AQE's runtime skew-join splitting (enabled by default
in session.py) actually fires: a join with one hot key re-plans into a
skew=true sort-merge join instead of pinning the hot partition on one
task. Complements operators/skew.py's explicit salting (which covers
aggregations and stateful keys, where AQE cannot help).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SKEW_CONF = {
    # shrink AQE's size thresholds so the ~MB test shuffle qualifies
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "50KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture()
def skew_conf(spark):
    old = {k: spark.conf.get(k) for k in SKEW_CONF}
    for k, v in SKEW_CONF.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        spark.conf.set(k, v)


def test_aqe_splits_hot_key_join(spark, skew_conf):
    pad = "x" * 64
    # 95% of the left side lands on ONE join key
    left = spark.range(0, 120_000).select(
        F.when(F.col("id") < 114_000, F.lit(0))
        .otherwise(F.col("id") % 37 + 1).alias("k"),
        F.concat(F.lit(pad), F.col("id").cast("string")).alias("payload"))
    right = spark.range(0, 38).select(
        F.col("id").alias("k"),
        F.col("id").cast("string").alias("dim"))
    joined = left.join(right, "k")
    # materialize THIS DataFrame (count() would plan a separate query);
    # after execution the adaptive plan is final and shows the re-plan
    assert len(joined.collect()) == 120_000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan
