"""Structured Streaming ↔ batch equivalence (the unified-engine contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from queue_system_simulator_spark.schema import load_table
from queue_system_simulator_spark.streaming.stream import (
    run_available_now,
    sliding_api_load,
    stream_events,
    tumbling_counts,
)


def test_tumbling_counts_match_batch(spark, sf_dir):
    streamed = run_available_now(tumbling_counts(stream_events(spark, sf_dir)))
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(
            ((F.unix_micros("ts") - F.unix_micros("ts") % 60_000_000) / 1_000_000)
            .cast("long")
            .alias("window_start_s"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )
    s = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert s == b


def test_sliding_api_load_runs(spark, sf_dir):
    out = run_available_now(sliding_api_load(stream_events(spark, sf_dir)))
    rows = out.collect()
    assert rows
    # every event lands in window/slide = 4 sliding windows
    total = sum(r["calls_in_window"] for r in rows)
    n_events = load_table(spark, sf_dir, "events").count()
    assert total == n_events * 4
