"""Seeded synthetic request-log generator (SURVEY §2 A6).

Reference (``/root/reference/scripts/generate_sample_data.py:10-39``): for
``users × max_requests_per_user`` rows, pick a random user, draw inter-arrival
gaps U(0.1, 1.0) s accumulated from the fixed epoch, processing_time
``round(U(1.0, 10.0), 1)``, rendered ISO-8601 with a ``Z``.

Spark-first AND engine-portable: uniforms are derived from md5 of
``(seed, row id, stream tag)`` instead of ``rand(seed)`` — Spark's and
DuckDB's (and any engine's) md5 agree bit-for-bit, so the generated table
is identical across engines, runs, task retries, and repartitionings,
which makes the generator itself hash-gradeable against a SQL oracle
(``rand(seed)`` streams are engine-internal by contract and never match).
Same pattern as ``dataset_split`` / ``priority_sample_by_source``.

All randomness is integer-exact: a 32-bit value is assembled from the first
8 md5 nibbles, then reduced mod the discrete range (gap in whole
milliseconds ∈ [100, 1000], processing in deciseconds ∈ [10, 100] — the
reference's U(0.1,1.0) s and round(U(1.0,10.0),1) supports on a 1 ms /
0.1 s lattice).  The per-user cumulative arrival is an integer-ms window
sum — associativity-free, so Spark's running sum and DuckDB's window
aggregation agree exactly (same argument as operators/fifo.py).

At scale: ``spark.range`` parallelizes perfectly, every derived column is
map-side JVM codegen, and the only shuffle is the per-user window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from queue_system_simulator_spark.schema import REFERENCE_EPOCH

#: ISO-8601 with microseconds and a literal Z, the reference's output format
#: (``generate_sample_data.py:29``).
ISO_Z_SPARK = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"


def u32_hash_sql(key_expr: str, pos_fn: str = "instr") -> str:
    """A 32-bit uniform integer from the first 8 md5 nibbles of ``key_expr``.

    Pure-SQL and portable: nibble = position of the hex char in the hex
    alphabet (Spark ``instr``, DuckDB ``strpos`` — pass ``pos_fn``), summed
    with power-of-16 weights.  Both engines produce the identical integer
    for the identical key string.
    """
    terms = " + ".join(
        # BIGINT per term: nibble 8+ at weight 16^7 would overflow INT32
        f"CAST({pos_fn}('0123456789abcdef', "
        f"substr(md5({key_expr}), {i}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (8 - i)}"
        for i in range(1, 9)
    )
    return f"({terms})"


def _gen_key(seed: int, tag: str, id_expr: str) -> str:
    return f"concat('gen|{seed}|', CAST({id_expr} AS STRING), '|{tag}')"


def generate_sample_requests(
    spark: SparkSession,
    num_users: int = 5,
    max_requests_per_user: int = 5,
    seed: int = 42,
    epoch: str = REFERENCE_EPOCH,
) -> DataFrame:
    """Deterministic synthetic request log.

    Returns columns ``user_id, request_time, processing_time`` matching
    REQUEST_SCHEMA (plus ``seq``/``request_time_iso`` for stable grading),
    sorted by request_time (reference sorts its CSV output,
    ``generate_sample_data.py:32``).
    """
    n = num_users * max_requests_per_user
    gap_u32 = F.expr(u32_hash_sql(_gen_key(seed, "gap", "id")))
    proc_u32 = F.expr(u32_hash_sql(_gen_key(seed, "proc", "id")))
    base = spark.range(n).select(
        F.col("id").alias("seq"),
        F.concat(F.lit("user_"), (F.col("id") % num_users)).alias("user_id"),
        # U(0.1, 1.0) s on a 1 ms lattice, integer-exact
        (gap_u32 % 901 + 100).alias("gap_ms"),
        # round(U(1.0, 10.0), 1) s on a 0.1 s lattice, integer-exact
        (proc_u32 % 91 + 10).alias("proc_ds"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("offset_ms", F.sum("gap_ms").over(w))
        .select(
            "seq",
            "user_id",
            F.timestamp_add(
                "MILLISECOND", F.col("offset_ms"), F.lit(epoch).cast("timestamp")
            ).alias("request_time"),
            (F.col("proc_ds") / 10.0).alias("processing_time"),
        )
        .orderBy("request_time")
    )


def generate_sample_requests_oracle_sql(
    num_users: int = 5,
    max_requests_per_user: int = 5,
    seed: int = 42,
    epoch: str = REFERENCE_EPOCH,
) -> str:
    """The DuckDB twin of :func:`generate_sample_requests`.

    Emits the arrival as integer epoch-milliseconds plus the ISO-8601-Z
    string (the reference's CSV rendering) rather than a raw timestamp, so
    the cross-engine comparison is on exact integers/strings.
    """
    n = num_users * max_requests_per_user
    epoch_lit = epoch.replace("T", " ").replace("Z", "").split("+")[0]
    key = (
        lambda tag: f"concat('gen|{seed}|', CAST(id AS VARCHAR), '|{tag}')"
    )
    return f"""
WITH ids AS (
  SELECT range AS id FROM range(0, {n})
), base AS (
  SELECT id AS seq,
         concat('user_', CAST(id % {num_users} AS VARCHAR)) AS user_id,
         {u32_hash_sql(key("gap"), pos_fn="strpos")} % 901 + 100 AS gap_ms,
         {u32_hash_sql(key("proc"), pos_fn="strpos")} % 91 + 10 AS proc_ds
  FROM ids
), cum AS (
  SELECT *,
         CAST(SUM(gap_ms) OVER (PARTITION BY user_id ORDER BY seq
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS offset_ms
  FROM base
)
SELECT seq, user_id,
       offset_ms,
       strftime(TIMESTAMP '{epoch_lit}' + to_milliseconds(offset_ms),
                '%Y-%m-%dT%H:%M:%S.%f') || 'Z' AS request_time_iso,
       proc_ds / 10.0 AS processing_time
FROM cum
"""
