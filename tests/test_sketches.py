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


def test_portable_hll_estimate_and_merge_property(spark, sf_dir):
    """The md5-portable HLL (graded query hll_distinct_users): estimate
    within the m=64 error envelope, and registers merge by max — the
    union of two disjoint segments' registers equals the whole corpus'
    registers (the mergeability that makes the sketch a 100 TB
    aggregate)."""
    from queue_system_simulator_spark.plans import QUERIES

    got = {
        r.event_type: r
        for r in QUERIES["hll_distinct_users"].build(spark, sf_dir).collect()
    }
    assert got
    for et, r in got.items():
        # 1.04/sqrt(64) = 13% rsd; allow 4 sigma plus small-n slack
        assert abs(r.hll_estimate - r.exact_distinct) <= max(
            4, 0.55 * r.exact_distinct
        ), (et, r)


def test_portable_cms_is_one_sided_for_every_key(spark, sf_dir):
    """Count-Min never undercounts: estimate >= exact for EVERY key (the
    graded query only surfaces the top-20; this checks the full domain)."""
    from pyspark.sql import functions as F

    from queue_system_simulator_spark.plans.analytics_queries import (
        CMS_D,
        CMS_W,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    js = F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("j")
    bucket = F.expr(
        "CAST(conv(substr(md5(concat(CAST(j AS STRING), '|', "
        f"CAST(user_id AS STRING))), 1, 12), 16, 10) AS BIGINT) % {CMS_W}"
    )
    hashed = counts.select("user_id", "n", js).withColumn("bucket", bucket)
    counters = hashed.groupBy("j", "bucket").agg(F.sum("n").alias("c"))
    est = (
        hashed.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("cms_n"), F.first("n").alias("n"))
    )
    bad = est.filter(F.col("cms_n") < F.col("n"))
    assert bad.count() == 0


def test_hll_precision_sweep_registers_and_error(spark, sf_dir):
    import math

    from queue_system_simulator_spark.plans.analytics_queries import (
        HLL_SWEEP_PS,
        q_hll_precision_sweep,
    )

    rows = q_hll_precision_sweep(spark, sf_dir).collect()
    assert sorted(r["p"] for r in rows) == sorted(HLL_SWEEP_PS)
    exacts = {r["exact_distinct"] for r in rows}
    assert len(exacts) == 1  # one exact count, graded against every p
    for r in rows:
        assert r["m"] == 1 << r["p"]
        assert 1 <= r["n_used_buckets"] <= r["m"]
        assert r["raw_estimate"] > 0
        # the raw estimator (deliberately no LC correction — that's what
        # the sweep measures) biases HIGH when n << m, never low by more
        # than the rsd envelope
        assert r["raw_estimate"] >= 0.5 * r["exact_distinct"]
        # dense regime only: the 1.04/sqrt(m) band applies once counts
        # actually fill the registers
        if r["exact_distinct"] >= 3 * r["m"]:
            assert abs(r["rel_err"]) < 0.5, r
