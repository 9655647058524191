"""Structured-Streaming-backed queries, oracle-checked against batch SQL.

``streaming_tumbling_counts`` runs a real streaming query (file source →
watermark → tumbling window → memory sink, Trigger.AvailableNow) and is
verified against the equivalent batch bucketing in DuckDB — proving the
stream and batch paths agree (Spark's unified-engine contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from queue_system_simulator_spark.plans.registry import register
from queue_system_simulator_spark.streaming.stream import (
    run_available_now,
    stream_events,
    tumbling_counts,
)


@register(
    "streaming_tumbling_counts",
    oracle="""
SELECT (epoch_us(ts) // 60000000) * 60 AS window_start_s,
       event_type,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
    description="Structured Streaming tumbling 60 s window counts + exact "
    "decimal sums per event_type, drained via Trigger.AvailableNow — "
    "stream/batch equivalence is the oracle check itself.",
)
def q_streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = stream_events(spark, sf_dir)
    return run_available_now(tumbling_counts(stream))
