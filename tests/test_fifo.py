"""Cross-check the FIFO closed-form window recurrence against the DES
kernel on randomized inputs (SURVEY §7 step 4 cross-check B) plus
queue-theory invariants."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from queue_system_simulator_spark.operators.fifo import fifo_k1_timeline
from queue_system_simulator_spark.operators.kernel import SimParams, simulate_events


def random_requests(rng, n, span_us=60_000_000):
    rows = []
    for i in range(n):
        rows.append(
            {
                "user_id": "g",
                "seq": i,
                "sim_arrival_time": float(rng.randrange(span_us)),
                # centi-second multiples: the closed form quantizes the
                # 2-decimal seconds contract to exact integer µs
                "processing_time": float(rng.randrange(1, 500) * 10_000),
            }
        )
    return rows


def test_closed_form_matches_kernel_randomized(spark):
    rng = random.Random(7)
    for trial in range(5):
        rows = random_requests(rng, 40)
        # kernel in FIFO/k=1 (µs-as-double: exact integer arithmetic)
        kern = simulate_events(
            sorted(rows, key=lambda r: (r["sim_arrival_time"], r["seq"])),
            SimParams(num_workers=1, queue_mode="fifo"),
        )
        kern_by_seq = {
            r["seq"]: (
                r["start_processing_time_by_worker"],
                r["finish_processing_time_by_worker"],
            )
            for r in kern
        }
        # closed form on Spark
        df = spark.createDataFrame(
            [
                (
                    "g",
                    r["seq"],
                    int(r["sim_arrival_time"]),
                    r["processing_time"] / 1_000_000,
                )
                for r in rows
            ],
            "user_id string, event_id long, ts_us long, processing_time double",
        ).withColumn("request_time", F.timestamp_micros("ts_us"))
        tl = fifo_k1_timeline(df, group_col="user_id")
        for r in tl.collect():
            ks, kf = kern_by_seq[r["seq"]]
            assert r["start_us"] == int(ks), (trial, r["seq"])
            assert r["finish_us"] == int(kf), (trial, r["seq"])


def test_fifo_invariants(spark, sf_dir):
    from queue_system_simulator_spark.schema import events_as_requests

    tl = fifo_k1_timeline(events_as_requests(spark, sf_dir))
    bad = tl.filter(
        (F.col("start_us") < F.col("arrival_us"))
        | (F.col("finish_us") != F.col("start_us") + F.col("proc_us"))
        | (F.col("queuing_us") < 0)
    )
    assert bad.count() == 0
    # single-server: service intervals within a group never overlap
    from pyspark.sql import Window

    w = Window.partitionBy("group_id").orderBy("arrival_us", "seq")
    overlap = tl.withColumn("prev_finish", F.lag("finish_us").over(w)).filter(
        F.col("prev_finish").isNotNull() & (F.col("start_us") < F.col("prev_finish"))
    )
    assert overlap.count() == 0
