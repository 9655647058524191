"""CSV request-log source with schema validation (SURVEY §2 A1–A4).

Reference behavior (``/root/reference/src/csv_parser.py:7-75``):

* header row required, columns ``user_id, request_time, processing_time``;
  a missing column raises ``KeyError`` (``csv_parser.py:37-40``);
* ISO-8601 timestamps, trailing ``Z`` normalized to UTC (``:50-59``);
* ``processing_time`` cast to float, failure raises ``ValueError`` naming the
  1-based row (``:64,69-70``);
* header-only / empty file yields an empty result (``:33-34``).

Spark-first mapping: an explicit ``StructType`` scan — ``FAILFAST`` mode to
raise on any malformed row (reference parity), or ``PERMISSIVE`` with a
``_corrupt_record`` column when the caller wants to *report* bad rows and
keep going (the scalable posture: at 100 TB you quarantine bad rows, you
don't abort the job).  The missing-column check reads only the header line
via a tiny text scan, so validation does not touch the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from queue_system_simulator_spark.localframe import local_df
from queue_system_simulator_spark.schema import REQUEST_SCHEMA

REQUIRED_COLUMNS = ("user_id", "request_time", "processing_time")


def read_requests_json(
    spark: SparkSession, path: str, mode: str = "FAILFAST"
) -> DataFrame:
    """JSON-lines variant of the request-log reader (engine extension —
    the reference is CSV-only): same explicit schema, same required-column
    contract, same FAILFAST/PERMISSIVE choice.  Timestamps parse from
    ISO-8601 strings; schema-on-read keeps the scan JVM-side."""
    schema = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("request_time", T.TimestampType()),
            T.StructField("processing_time", T.DoubleType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XXX")
        .json(path)
    )
    return df


class MissingColumnError(KeyError):
    """Required CSV column absent (reference: KeyError, csv_parser.py:37-40)."""


def validate_required_columns(header_cols: list[str]) -> None:
    missing = [c for c in REQUIRED_COLUMNS if c not in header_cols]
    if missing:
        raise MissingColumnError(
            f"CSV is missing required column(s): {', '.join(missing)}"
        )


def _read_header(spark: SparkSession, path: str) -> list[str]:
    first = spark.read.text(path).limit(1).collect()
    if not first:
        return []
    return [c.strip() for c in first[0][0].split(",")]


def read_requests_csv(
    spark: SparkSession,
    path: str,
    mode: str = "FAILFAST",
    extra_columns: bool = True,
) -> DataFrame:
    """Read a request-log CSV with the reference's validation semantics.

    ``mode='FAILFAST'`` ≈ the reference's raise-on-malformed; ``'PERMISSIVE'``
    adds a ``_corrupt_record`` column holding the raw text of bad rows.
    Extra columns beyond the required three are tolerated (the reference
    ignores them: it indexes rows by name, ``csv_parser.py:62-64``).
    """
    header = _read_header(spark, path)
    if not header:  # empty file → empty frame (reference returns [])
        return local_df(spark, [], REQUEST_SCHEMA)
    validate_required_columns(header)

    schema = REQUEST_SCHEMA
    if mode.upper() == "PERMISSIVE":
        schema = T.StructType(
            list(REQUEST_SCHEMA.fields)
            + [T.StructField("_corrupt_record", T.StringType(), True)]
        )
    reader = (
        spark.read.option("header", True)
        .option("mode", mode)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][XXX][X]")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if extra_columns:
        # project required columns only; unknown columns pruned at scan
        df = reader.csv(path)
        validate_required_columns(df.columns)
        df = df.select(
            F.col("user_id").cast("string"),
            F.to_timestamp("request_time").alias("request_time"),
            F.col("processing_time").cast("double"),
        )
    else:
        df = reader.schema(schema).csv(path)
    return df


def corrupt_rows(df: DataFrame) -> DataFrame:
    """Bad-row report for PERMISSIVE scans (A3 row-numbered-error analog)."""
    if "_corrupt_record" not in df.columns:
        raise ValueError("corrupt_rows requires a PERMISSIVE scan")
    return df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
