"""Bucketed co-located joins: the shuffle-elimination path for repeated
big-big joins at 100 TB (SURVEY §4 / BASELINE posture).

Writing both fact tables bucketed by the join key lets Spark sort-merge
join them with NO exchange on either side — the one optimization that
cannot be expressed per-query and must live in the table layout.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from queue_system_simulator_spark.schema import load_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{wh}'")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bucketdb.lineitem_b")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bucketdb.orders_b")
    )
    yield "bucketdb"
    spark.sql("DROP DATABASE bucketdb CASCADE")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    li = spark.table("bucketdb.lineitem_b")
    orders = spark.table("bucketdb.orders_b")
    # disable broadcast so the join strategy decision is about bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed SMJ: the join inputs need no Exchange; the only exchange
        # allowed is the one for the final groupBy
        join_part = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_unbucketed(spark, warehouse, sf_dir):
    li_b = spark.table("bucketdb.lineitem_b")
    orders_b = spark.table("bucketdb.orders_b")
    bucketed = (
        li_b.join(orders_b, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(18,6)")), 2).alias("q"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    plain = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(18,6)")), 2).alias("q"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
