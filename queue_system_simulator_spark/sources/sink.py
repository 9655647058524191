"""Sinks: partitioned Parquet datalake writes + reference CSV sink.

The engine's default sink (BASELINE.json posture: "Structured Streaming +
S3/Parquet for datalake") is partition-pruned Parquet:

* ``write_datalake`` — partition by low-cardinality query-filter columns
  (date, run_id, tenant); readers prune partitions for free, and each
  partition's files stay independently re-writable (idempotent backfills).
* ``write_requests_csv`` — the reference's CSV sink
  (``/root/reference/scripts/generate_sample_data.py:34-38``): header +
  rows; ``single_file=True`` mirrors its one-file output via coalesce(1)
  (driver-side convenience only — never at scale).

Scale notes: ``maxRecordsPerFile`` bounds file sizes without an extra
shuffle; sorting within partitions before write gives row-group-level
min/max pruning on the sort key (poor man's Z-order for one dimension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_datalake(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_within: list[str] | None = None,
    max_records_per_file: int | None = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """Write a partitioned Parquet table the way a 100 TB deployment would."""
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_requests_csv(
    df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite"
) -> None:
    """Reference-parity CSV sink (header row, ISO-8601 timestamps render
    via the session's UTC timezone)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", True).csv(path)
