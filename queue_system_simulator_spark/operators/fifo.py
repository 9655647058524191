"""Closed-form single-server FIFO queue as pure window SQL (SURVEY §2 E1
special case).

For an unbounded FIFO queue with one server the DES recurrence

    start_i  = max(arrival_i, finish_{i-1})
    finish_i = start_i + proc_i

has the closed form (prefix trick)

    start_i = Pe_i + max_{j<=i} (arrival_j − Pe_j),   Pe_i = Σ_{m<i} proc_m

which is one cumulative sum + one running max — fully expressible with
window functions, hence DuckDB-oracle-able and embarrassingly parallel
across groups (each ``user_id``/``run_id`` is an independent queue).

**Exactness:** all arithmetic is done in integer *microseconds* (timestamps
via ``unix_micros``; processing seconds are 2-decimal data → exact in
centi-seconds).  Integer windows are associativity-free, so Spark's running
accumulation and DuckDB's segment-tree window aggregation produce identical
results bit-for-bit — no float-rounding tolerance needed anywhere.

Scale: one shuffle (hash by group column) feeding both window functions,
which share the same partitioning+ordering so Catalyst evaluates them in a
single Window exec.  No driver-side work; holds at 100 TB provided a single
group's rows fit one task (same constraint as the reference kernel,
SURVEY §4).

Reference parity: recurrence semantics from ``/root/reference/src/worker.py:88-111``
(start = dequeue time, finish = start + processing_time) and FIFO ordering
``/root/reference/src/queue_manager.py:7-95``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICROS = 1_000_000


def fifo_k1_timeline(
    requests: DataFrame,
    group_col: str = "user_id",
    ts_col: str = "request_time",
    proc_col: str = "processing_time",
    order_col: str = "event_id",
) -> DataFrame:
    """Exact single-server FIFO timeline per group, integer-µs arithmetic.

    Output grain: one row per request with arrival/start/finish/queuing in
    both integer microseconds (exact, hashable) and double seconds.
    """
    df = requests.select(
        F.col(group_col).alias("group_id"),
        F.col(order_col).alias("seq"),
        F.unix_micros(F.col(ts_col)).alias("arrival_us"),
        # 2-decimal seconds → exact integer µs via centi-second rounding;
        # clamped at 0 because the DES clock never runs backward (a negative
        # duration would otherwise silently diverge kernel vs closed form)
        F.greatest(
            F.round(F.col(proc_col) * 100).cast("long") * 10_000, F.lit(0)
        ).alias("proc_us"),
    )
    w = Window.partitionBy("group_id").orderBy("arrival_us", "seq")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df = (
        df.withColumn("cum_proc_us", F.sum("proc_us").over(run))
        .withColumn("prefix_us", F.col("cum_proc_us") - F.col("proc_us"))
        .withColumn("slack_us", F.col("arrival_us") - F.col("prefix_us"))
        .withColumn("max_slack_us", F.max("slack_us").over(run))
        .withColumn("start_us", F.col("max_slack_us") + F.col("prefix_us"))
        .withColumn("finish_us", F.col("start_us") + F.col("proc_us"))
        .withColumn("queuing_us", F.col("start_us") - F.col("arrival_us"))
    )
    return df.select(
        "group_id",
        "seq",
        "arrival_us",
        "proc_us",
        "start_us",
        "finish_us",
        "queuing_us",
        (F.col("arrival_us") / MICROS).alias("arrival_s"),
        (F.col("start_us") / MICROS).alias("start_s"),
        (F.col("finish_us") / MICROS).alias("finish_s"),
        (F.col("queuing_us") / MICROS).alias("queuing_s"),
    )


def fifo_k1_timeline_sql(
    source_sql: str,
    group_col: str = "user_id",
    ts_col: str = "ts",
    proc_col: str = "value",
    order_col: str = "event_id",
    epoch_us_fn: str = "epoch_us",
) -> str:
    """The DuckDB-dialect twin of :func:`fifo_k1_timeline`.

    Structurally identical integer-µs expressions so results match the Spark
    plan bit-for-bit.  ``epoch_us_fn`` exists so tests can reuse the text.
    """
    return f"""
WITH base AS (
  SELECT CAST({group_col} AS VARCHAR) AS group_id,
         {order_col} AS seq,
         {epoch_us_fn}({ts_col}) AS arrival_us,
         greatest(CAST(round({proc_col} * 100) AS BIGINT) * 10000, 0) AS proc_us
  FROM ({source_sql})
), win AS (
  SELECT *,
         -- DuckDB widens SUM(BIGINT) to HUGEINT; the driver's hasher is
         -- type-sensitive, so pin every derived time column back to BIGINT
         CAST(SUM(proc_us) OVER w AS BIGINT) AS cum_proc_us
  FROM base
  WINDOW w AS (PARTITION BY group_id ORDER BY arrival_us, seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), pre AS (
  SELECT *, cum_proc_us - proc_us AS prefix_us,
         arrival_us - (cum_proc_us - proc_us) AS slack_us
  FROM win
), mx AS (
  SELECT *, MAX(slack_us) OVER w AS max_slack_us
  FROM pre
  WINDOW w AS (PARTITION BY group_id ORDER BY arrival_us, seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT group_id, seq, arrival_us, proc_us,
       max_slack_us + prefix_us AS start_us,
       max_slack_us + prefix_us + proc_us AS finish_us,
       max_slack_us + prefix_us - arrival_us AS queuing_us,
       arrival_us / 1000000 AS arrival_s,
       (max_slack_us + prefix_us) / 1000000 AS start_s,
       (max_slack_us + prefix_us + proc_us) / 1000000 AS finish_s,
       (max_slack_us + prefix_us - arrival_us) / 1000000 AS queuing_s
FROM mx
"""
