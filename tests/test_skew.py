"""salted_join must be row-identical to the plain join while spreading a
hot key across the salt space."""

from __future__ import annotations

from pyspark.sql import functions as F

from queue_system_simulator_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # 90% of left rows share one hot key
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, "hot").otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.range(200).select(
        F.when(F.col("id") == 0, "hot").otherwise(
            F.concat(F.lit("k"), F.col("id") * 10)
        ).alias("k"),
        F.col("id").alias("rval"),
    )
    return left, right


def test_salted_join_matches_plain_inner(spark):
    left, right = _skewed_frames(spark)
    plain = left.join(right, "k").select("k", "lval", "rval")
    salted = salted_join(left, right, "k", salt=8).select("k", "lval", "rval")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_spreads_hot_key(spark):
    left, right = _skewed_frames(spark)
    out = salted_join(left, right, "k", salt=8)
    # the physical join key includes the salt: the hot key's rows hash to
    # multiple partitions. Sanity: per-salt counts on the left are balanced.
    from queue_system_simulator_spark.operators.skew import SALT_COL

    salted_left = left.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8))
    )
    counts = [
        r.n
        for r in salted_left.filter(F.col("k") == "hot")
        .groupBy(SALT_COL)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(counts) == 8  # hot key present in every salt bucket
    assert max(counts) < 2 * min(counts)  # roughly uniform
    assert out.count() > 0
