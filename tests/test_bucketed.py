"""Co-located joins via bucketed layout: the join on the bucket key
must run with no Exchange on either side, and an AQE skew join must
actually split a pathological key."""

from __future__ import annotations

import pytest

import uuid

from pyspark.sql import functions as F

from osmexpress_spark.sources import bucketed


def _plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.slow
def test_bucketed_join_has_no_exchange(spark):
    a_name = "t_orders_" + uuid.uuid4().hex[:8]
    b_name = "t_lines_" + uuid.uuid4().hex[:8]
    orders = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("status")
    )
    lines = spark.range(0, 20000).select(
        (F.col("id") % 5000).alias("k"), (F.col("id") * 2).alias("qty")
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # forbid broadcast: the point is the shuffle-free SortMergeJoin
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bucketed.write_bucketed(orders, a_name, "k", buckets=8)
        bucketed.write_bucketed(lines, b_name, "k", buckets=8)
        j = bucketed.read_bucketed(spark, a_name).join(
            bucketed.read_bucketed(spark, b_name), "k"
        )
        assert j.count() == 20000
        plan = _plan(
            bucketed.read_bucketed(spark, a_name).join(
                bucketed.read_bucketed(spark, b_name), "k"
            )
        )
        # the entire point of the layout: no shuffle on either side
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # control: the same join over plain parquet DOES shuffle
        plain = orders.join(lines, "k")
        assert "Exchange" in _plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {a_name}")
        spark.sql(f"DROP TABLE IF EXISTS {b_name}")


@pytest.mark.slow
def test_aqe_splits_skewed_join(spark):
    """A 100:1 skewed key must trigger AQE's skew-join split (the
    runtime mitigation the session enables by default) — visible as
    skew=true on the SortMergeJoin in the final adaptive plan."""
    keys = (
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    old = {k: spark.conf.get(k, None) for k in keys}
    try:
        # shrink thresholds so the local[32] toy data registers as skew
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        # forbid broadcast so the join stays sort-merge
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # skew must be DATA, not a literal key (a literal folds into a
        # filter and the equi-join disappears): 95% of rows share key 7
        hot = spark.range(0, 200_000).select(
            F.when(F.col("id") < 190_000, 7)
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.col("id").alias("pad"),
        )
        cold = spark.range(0, 2_000).select(
            (F.col("id") % 97).alias("k"), F.col("id").alias("v")
        )
        j = hot.join(cold.hint("merge"), "k")
        # collect() executes THIS DataFrame's QueryExecution (a write
        # would spawn a separate one and leave this plan non-final)
        n = len(j.collect())
        assert n > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
