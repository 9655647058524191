"""Seeded synthetic request-log generator (SURVEY §2 A6).

Reference (``/root/reference/scripts/generate_sample_data.py:10-39``): for
``users × max_requests_per_user`` rows, pick a random user, draw inter-arrival
gaps U(0.1, 1.0) s accumulated from the fixed epoch, processing_time
``round(U(1.0, 10.0), 1)``, rendered ISO-8601 with a ``Z``.

Spark-first: ``spark.range`` + ``rand(seed)`` + a running-sum window — fully
distributed, no driver loop.  The cumulative arrival is per-user (matching
the reference, which accumulates per user before interleaving).  At scale the
range source parallelizes perfectly and the only shuffle is the per-user
window, partitioned by ``user_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from queue_system_simulator_spark.schema import REFERENCE_EPOCH


def generate_sample_requests(
    spark: SparkSession,
    num_users: int = 5,
    max_requests_per_user: int = 5,
    seed: int = 42,
    epoch: str = REFERENCE_EPOCH,
) -> DataFrame:
    """Deterministic synthetic request log.

    Returns columns ``user_id, request_time, processing_time`` matching
    REQUEST_SCHEMA, sorted by request_time (reference sorts its CSV output,
    ``generate_sample_data.py:32``).
    """
    n = num_users * max_requests_per_user
    base = (
        spark.range(n)
        .withColumn("user_id", F.concat(F.lit("user_"), (F.col("id") % num_users)))
        .withColumn("gap", F.rand(seed) * 0.9 + 0.1)  # U(0.1, 1.0)
        .withColumn("proc", F.round(F.rand(seed + 1) * 9.0 + 1.0, 1))  # U(1,10)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("offset_s", F.sum("gap").over(w))
        .select(
            "user_id",
            F.timestamp_add(
                "MILLISECOND",
                (F.col("offset_s") * 1000).cast("long"),
                F.lit(epoch).cast("timestamp"),
            ).alias("request_time"),
            F.col("proc").alias("processing_time"),
        )
        .orderBy("request_time")
    )
