"""End-to-end pipeline: the engine's equivalent of the reference CLI
``python main.py <csv> [-w N] [-q M]`` (``/root/reference/main.py:17-159``).

Stages (SURVEY §3.1): scan/validate → empty guard → epoch-relative arrival
derivation (+ pre-epoch warning count) → DES kernel → sentinel-aware result
ordering → G1–G5 statistics → console rendering (NaN→"N/A", api counts
key-sorted).

A reference user switches by calling ``run_pipeline(spark, csv_path)`` —
same semantics, but every stage before/after the kernel is a distributed
DataFrame op, and the kernel itself shards across independent runs when
``run_col`` is provided (the scale axis the single-process reference lacks).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from queue_system_simulator_spark.operators.kernel import SimParams, simulate
from queue_system_simulator_spark.operators.statistics import (
    NUM_EXTERNAL_APIS,
    simulation_statistics,
)
from queue_system_simulator_spark.operators.transforms import (
    result_order,
    with_sim_arrival_time,
)
from queue_system_simulator_spark.schema import REFERENCE_EPOCH
from queue_system_simulator_spark.sources.csv_source import read_requests_csv


@dataclass
class PipelineResult:
    timeline: DataFrame | None  # ordered per-request lifecycle (D2 order)
    scalar_stats: DataFrame | None  # one-row G1-G3+G5 frame
    api_counts: DataFrame | None  # long-format zero-filled G4 frame
    negative_arrivals: int
    input_rows: int

    @property
    def empty(self) -> bool:
        return self.input_rows == 0


def run_pipeline(
    spark: SparkSession,
    csv_path: str,
    num_workers: int = 1,
    queue_size: int | None = None,
    queue_mode: str = "priority",
    seed: int = 42,
    epoch: str = REFERENCE_EPOCH,
    run_col: str | None = None,
) -> PipelineResult:
    """Scan → simulate → aggregate, reference semantics end to end.

    ``queue_size`` is honoured only in ``fifo`` mode — in priority mode it
    is accepted and ignored, the reference's dead-config quirk
    (SURVEY §2 quirk 1, ``/root/reference/src/simulator.py:47-53``).
    ``run_col`` names a column that partitions the input into independent
    simulations (scenario sweep); None = one global run like the CLI.
    """
    df = read_requests_csv(spark, csv_path)
    # Capture file position at scan time: the reference preserves CSV input
    # order via a *stable* arrival sort (/root/reference/src/simulator.py:41),
    # so duplicate (arrival, user) rows need a deterministic tiebreaker or
    # ``seq`` — and with it the simulated timeline — changes across runs and
    # task retries.  monotonically_increasing_id() over a deterministic scan
    # split encodes (partition, offset) and is stable for a given file.
    df = df.withColumn("__input_pos", F.monotonically_increasing_id())
    n_input = df.count()
    if n_input == 0:  # header-only/empty file → exit path (main.py:45-49)
        return PipelineResult(None, None, None, 0, 0)

    df = with_sim_arrival_time(df, epoch)
    n_negative = df.filter(F.col("sim_arrival_time") < 0).count()

    group_cols = [run_col] if run_col else ["__run"]
    if not run_col:
        df = df.withColumn("__run", F.lit(0))
    df = df.withColumn(
        "seq",
        F.row_number().over(
            Window.partitionBy(*group_cols).orderBy(
                "sim_arrival_time", "user_id", "__input_pos"
            )
        ),
    )
    params = SimParams(
        num_workers=num_workers, queue_mode=queue_mode, queue_max_size=queue_size,
        seed=seed,
    )
    timeline = simulate(
        df.select(*group_cols, "user_id", "seq", "sim_arrival_time",
                  "processing_time"),
        params,
        group_cols=group_cols,
    )
    if not run_col:
        timeline = timeline.drop("__run")
    scalar, api = simulation_statistics(timeline, spark, NUM_EXTERNAL_APIS)
    return PipelineResult(result_order(timeline), scalar, api, n_negative, n_input)


def _fmt(v) -> str:
    """NaN/null → "N/A" like the reference's renderer (main.py:123-138)."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "N/A"
    if isinstance(v, float):
        return f"{v:.6f}".rstrip("0").rstrip(".")
    return str(v)


def render_report(result: PipelineResult) -> list[str]:
    """Console-report lines (A7): scalar stats then api counts key-sorted."""
    if result.empty:
        return ["no requests parsed — nothing to simulate"]
    s = result.scalar_stats.collect()[0].asDict()
    lines = [
        f"total requests: {result.input_rows}",
        f"requests with pre-epoch timestamps: {result.negative_arrivals}",
        f"processed: {_fmt(s['processed'])}",
        f"rejected: {_fmt(s['rejected'])}",
        f"average queuing time: {_fmt(s['avg_queuing_time'])}",
    ]
    for p in ("p50", "p75", "p90", "p99"):
        lines.append(f"queuing time {p}: {_fmt(s[p])}")
    lines.append(
        f"priority queue enqueued: {_fmt(s['priority_queue_enqueued_total'])}"
    )
    lines.append(f"normal queue enqueued: {_fmt(s['normal_queue_enqueued_total'])}")
    for row in sorted(result.api_counts.collect(), key=lambda r: r["api_id"]):
        lines.append(f"{row['api_key']}: {row['usage_count']}")
    return lines
