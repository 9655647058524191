"""Mergeable-sketch surface: the 100 TB path for distinct counts.

Exact count(DISTINCT) funnels every key through a shuffle; the deployable
pattern is a Datasketches HLL per partition/segment, merged with
hll_union_agg — constant-size state, one tiny merge. These tests pin the
three properties the pattern depends on: bounded error vs exact,
mergeability (union of segment sketches == sketch of the whole at equal
lgConfigK), and approx_count_distinct's rsd contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from queue_system_simulator_spark.schema import load_table


def test_hll_sketch_estimate_within_bound(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = (
        ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert len(got) > 0
    for r in got:
        assert abs(r["approx"] - r["exact"]) <= max(3, 0.05 * r["exact"]), r


def test_hll_sketches_merge_across_segments(spark, sf_dir):
    """Union of per-segment sketches must estimate the same as one global
    sketch — the property that lets 1000 executors each sketch their
    partition and ship ~KB to the driver."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", (F.col("event_id") % 2).alias("seg")
    )
    seg = ev.groupBy("seg").agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = seg.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).first()["est"]
    whole = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).first()["est"]
    assert merged == whole


def test_approx_count_distinct_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    r = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).first()
    # 2% rsd -> allow 3 sigma
    assert abs(r["approx"] - r["exact"]) <= max(3, 0.06 * r["exact"])
