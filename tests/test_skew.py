"""Skew operators: salted two-phase agg and salted replicated join
must be result-identical to their plain forms (the salt is pure
physical fan-out), deterministic across runs, and correct under
non-broadcast join strategies (the regime they exist for)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmexpress_spark.operators import skew


@pytest.fixture(scope="module")
def skewed_df(spark):
    # one hot key (90% of rows) + long tail — the shape that pins a reducer
    rows = [(i, "hot" if i % 10 else f"cold{i % 7}", float(i % 100)) for i in range(5000)]
    return spark.createDataFrame(rows, "id long, k string, v double")


def test_salted_agg_matches_plain(spark, skewed_df):
    got = skew.salted_agg(
        skewed_df,
        keys=["k"],
        aggs={
            "n": ("count", F.lit(1)),
            "s": ("sum", F.col("v").cast("bigint")),
            "mn": ("min", F.col("v")),
            "mx": ("max", F.col("v")),
            "av": ("avg", F.col("v")),
        },
        salt_on="id",
        n_salts=8,
    )
    want = skewed_df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("bigint")).alias("s"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.avg("v").alias("av"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_agg_deterministic(spark, skewed_df):
    mk = lambda: sorted(
        map(
            tuple,
            skew.salted_agg(
                skewed_df, ["k"], {"n": ("count", F.lit(1))}, salt_on="id"
            ).collect(),
        )
    )
    assert mk() == mk()


def test_salted_join_matches_plain_without_broadcast(spark, skewed_df):
    dim = skewed_df.groupBy("k").agg(F.count(F.lit(1)).alias("total"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = skew.salted_join(skewed_df, dim, on=["k"], salt_on="id", n_salts=8)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan  # exercising the shuffle regime
        want = skewed_df.join(dim, "k")
        assert sorted(map(tuple, got.select("id", "k", "v", "total").collect())) == sorted(
            map(tuple, want.select("id", "k", "v", "total").collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_join_left_outer(spark, skewed_df):
    dim = (
        skewed_df.where(F.col("k") != "hot")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("total"))
    )
    got = skew.salted_join(
        skewed_df, dim, on=["k"], salt_on="id", n_salts=4, how="left"
    )
    want = skewed_df.join(dim, "k", "left")
    assert sorted(
        map(tuple, got.select("id", "k", "total").collect())
    ) == sorted(map(tuple, want.select("id", "k", "total").collect()))
