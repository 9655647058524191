"""Queries exercising the DES kernel (SURVEY §2 E) through
``groupBy().applyInPandas``.

``kernel_fifo_k1`` is the oracle bridge: the kernel run in FIFO/k=1 mode is
checked bit-for-bit against the closed-form window SQL (the E1 special
case), so at least one full kernel path is DuckDB-verified — the
reference-faithful priority/limiter path is covered by seeded golden tests
(tests/test_kernel.py) and a rows-only driver check.

Exactness: the kernel is fed *integer microseconds represented as doubles*
(exact up to 2^53 ≫ any timestamp here), so its Python arithmetic
(max/add/subtract) is exact and matches the closed form's integer math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from queue_system_simulator_spark.operators.fifo import fifo_k1_timeline_sql
from queue_system_simulator_spark.operators.kernel import SimParams, simulate
from queue_system_simulator_spark.plans.registry import register
from queue_system_simulator_spark.schema import load_table

_KERNEL_FIFO_ORACLE = f"""
SELECT group_id AS user_id, seq, arrival_s, start_s, finish_s, queuing_s
FROM ({fifo_k1_timeline_sql("SELECT * FROM events")})
"""


def _events_micro(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").cast("string").alias("user_id"),
        F.col("event_id").alias("seq"),
        F.unix_micros("ts").cast("double").alias("sim_arrival_time"),
        (F.round(F.col("value") * 100).cast("long") * 10_000)
        .cast("double")
        .alias("processing_time"),
    )


@register(
    "kernel_fifo_k1",
    oracle=_KERNEL_FIFO_ORACLE,
    description="The DES kernel (applyInPandas, one group per user) in "
    "FIFO/k=1 mode, verified bit-for-bit against the closed-form window "
    "recurrence — the kernel↔SQL oracle bridge (SURVEY §7 step 4 cross-check B).",
)
def q_kernel_fifo_k1(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_micro(spark, sf_dir)
    params = SimParams(num_workers=1, queue_mode="fifo", queue_max_size=None)
    res = simulate(df, params, group_cols=["user_id"], shards=64)
    m = 1_000_000
    return res.select(
        "user_id",
        "seq",
        (F.col("sim_arrival_time") / m).alias("arrival_s"),
        (F.col("start_processing_time_by_worker") / m).alias("start_s"),
        (F.col("finish_processing_time_by_worker") / m).alias("finish_s"),
        (
            (
                F.col("start_processing_time_by_worker")
                - F.col("arrival_time_in_queue")
            )
            / m
        ).alias("queuing_s"),
    )


#: Exact DuckDB twin of the k=1 bounded-FIFO kernel (E1 admission control).
#: Sequential state per group = (finish of last admitted job, start times of
#: jobs still waiting).  An arrival at t sees queue depth = #{starts >= t}
#: (jobs started before t are in service or done; the dequeue scheduled at
#: exactly t happens AFTER the arrival drain in the kernel's fixed-point
#: loop, so starts == t still count as waiting — reference
#: /root/reference/src/simulator.py:195-258 pass ordering).  Reject at
#: depth >= Q with the −1 sentinel (simulator.py:213-215), else
#: start = max(arrival, last_finish) — the Lindley recurrence.  The
#: recursive CTE steps one request per group per iteration; every group
#: advances in lockstep, so recursion depth = max requests per group.
_BOUNDED_Q = 3

_KERNEL_BOUNDED_ORACLE = f"""
WITH RECURSIVE req AS (
  SELECT CAST(user_id AS VARCHAR) AS user_id,
         event_id AS seq,
         epoch_us(ts) AS a_us,
         CAST(round(value * 100) AS BIGINT) * 10000 AS p_us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
),
sim AS (
  SELECT user_id,
         CAST(0 AS BIGINT) AS rn,
         CAST(NULL AS BIGINT) AS seq,
         CAST(NULL AS BIGINT) AS a_us,
         CAST(NULL AS BIGINT) AS s_us,
         CAST(NULL AS BIGINT) AS f_us,
         FALSE AS rejected,
         CAST(0 AS BIGINT) AS f_last,
         CAST([] AS BIGINT[]) AS waiting_starts
  FROM (SELECT DISTINCT user_id FROM req)
  UNION ALL
  SELECT r.user_id, r.rn, r.seq, r.a_us,
         CASE WHEN len(list_filter(s.waiting_starts, x -> x >= r.a_us))
                   >= {_BOUNDED_Q}
              THEN NULL ELSE greatest(r.a_us, s.f_last) END,
         CASE WHEN len(list_filter(s.waiting_starts, x -> x >= r.a_us))
                   >= {_BOUNDED_Q}
              THEN -1 ELSE greatest(r.a_us, s.f_last) + r.p_us END,
         len(list_filter(s.waiting_starts, x -> x >= r.a_us)) >= {_BOUNDED_Q},
         CASE WHEN len(list_filter(s.waiting_starts, x -> x >= r.a_us))
                   >= {_BOUNDED_Q}
              THEN s.f_last ELSE greatest(r.a_us, s.f_last) + r.p_us END,
         CASE WHEN len(list_filter(s.waiting_starts, x -> x >= r.a_us))
                   >= {_BOUNDED_Q}
              THEN list_filter(s.waiting_starts, x -> x >= r.a_us)
              ELSE list_append(list_filter(s.waiting_starts, x -> x >= r.a_us),
                               greatest(r.a_us, s.f_last)) END
  FROM sim s JOIN req r ON r.user_id = s.user_id AND r.rn = s.rn + 1
)
SELECT user_id, seq,
       a_us / 1000000 AS arrival_s,
       s_us / 1000000 AS start_s,
       CASE WHEN rejected THEN -1.0 ELSE f_us / 1000000 END AS finish_s,
       CASE WHEN rejected THEN 'rejected' ELSE 'success' END AS status
FROM sim WHERE rn > 0
"""


@register(
    "kernel_fifo_bounded_oracle",
    oracle=_KERNEL_BOUNDED_ORACLE,
    description="Bounded-FIFO admission control (E1), driver-graded: the "
    "DES kernel with k=1, queue_max_size=3 checked against an exact "
    "sequential-recurrence oracle (recursive CTE carrying per-group "
    "(last_finish, waiting-start list) state). Arrivals hitting a full "
    "queue get the reference's −1 finish sentinel "
    "(/root/reference/src/simulator.py:213-215).",
)
def q_kernel_fifo_bounded_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_micro(spark, sf_dir)
    # rate limiter disabled (one API, effectively infinite RPM): this query
    # isolates E1 admission semantics; E5/E6 limiter paths are graded by
    # rate_limit_sliding and covered by tests/test_kernel.py
    params = SimParams(
        num_workers=1,
        queue_mode="fifo",
        queue_max_size=_BOUNDED_Q,
        num_apis=1,
        rpm_limit=1_000_000_000,
    )
    res = simulate(df, params, group_cols=["user_id"], shards=64)
    m = 1_000_000
    rejected = F.col("finish_processing_time_by_worker") == -1.0
    return res.select(
        "user_id",
        "seq",
        (F.col("sim_arrival_time") / m).alias("arrival_s"),
        F.when(rejected, F.lit(None)).otherwise(
            F.col("start_processing_time_by_worker") / m
        ).alias("start_s"),
        F.when(rejected, F.lit(-1.0)).otherwise(
            F.col("finish_processing_time_by_worker") / m
        ).alias("finish_s"),
        "status",
    )


@register(
    "kernel_fifo_bounded",
    oracle=None,  # admission control feeds back through queue occupancy —
    # a recurrence on the full system state, not window-expressible; covered
    # by invariants in tests/test_kernel.py and the driver's rows-only check
    description="Bounded-FIFO mode with LIVE admission control (SURVEY §2 "
    "quirk 1's other branch): queue_max_size=3, k=2 workers — arrivals "
    "hitting a full queue get the reference's −1 finish sentinel and "
    "status='rejected', sorted last (D2). Exercises E1 rejection + C1 "
    "split + sentinel ordering end-to-end.",
)
def q_kernel_fifo_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_micro(spark, sf_dir)
    params = SimParams(num_workers=2, queue_mode="fifo", queue_max_size=3)
    res = simulate(df, params, group_cols=["user_id"], shards=64)
    m = 1_000_000
    rejected = F.col("finish_processing_time_by_worker") == -1.0
    return res.select(
        "user_id",
        "seq",
        (F.col("sim_arrival_time") / m).alias("arrival_s"),
        F.when(rejected, F.lit(None)).otherwise(
            F.col("start_processing_time_by_worker") / m
        ).alias("start_s"),
        F.when(rejected, F.lit(-1.0)).otherwise(
            F.col("finish_processing_time_by_worker") / m
        ).alias("finish_s"),
        "status",
    )


@register(
    "kernel_priority_sim",
    oracle=None,  # RNG-coupled priority dequeue + limiter feedback: not
    # SQL-expressible; covered by seeded golden tests instead
    description="Full reference semantics: priority two-class queue "
    "(threshold 20 s, bias 0.8, seeded RNG), k=4 workers, 5 APIs × 60 RPM "
    "sliding-window limiter with round-robin fallback — one independent "
    "simulation per user-shard group (scenario-sweep parallelism).",
)
def q_kernel_priority_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    df = ev.select(
        # one independent scenario per user-shard; 32 shards = one per core
        # locally, and the axis that scales to millions of runs on a cluster
        (F.col("user_id") % 32).alias("run_id"),
        F.col("user_id").cast("string").alias("user_id"),
        F.col("event_id").alias("seq"),
        ((F.unix_micros("ts") - F.lit(1_704_067_200_000_000)) / 1_000_000).alias(
            "sim_arrival_time"
        ),
        F.col("value").alias("processing_time"),
    )
    params = SimParams(
        num_workers=4,
        queue_mode="priority",
        priority_threshold_seconds=20.0,
        priority_bias=0.8,
        num_apis=5,
        rpm_limit=60,
        seed=42,
    )
    res = simulate(df, params, group_cols=["run_id"])
    return res.select(
        "run_id",
        "seq",
        "user_id",
        "sim_arrival_time",
        "processing_time",
        "arrival_time_in_queue",
        "start_processing_time_by_worker",
        "finish_processing_time_by_worker",
        "used_api_id",
        "status",
        "priority_enqueued_total",
        "normal_enqueued_total",
    )


@register(
    "kernel_param_sweep",
    oracle=None,  # RNG/limiter-coupled like the single-scenario kernel runs
    description="Scenario-sweep: ONE job simulates a 6-cell parameter grid "
    "(workers 1/2/4 x RPM 30/60) x 8 user-shards = 48 independent DES "
    "groups, each group reading its own params from columns "
    "(simulate_sweep); output is per-scenario aggregate stats. This is the "
    "100 TB posture made literal - a million-cell sweep is just a million "
    "groups.",
)
def q_kernel_param_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from queue_system_simulator_spark.operators.kernel import simulate_sweep

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        (F.col("user_id") % 8).alias("tenant"),
        F.col("user_id").cast("string").alias("user_id"),
        F.col("event_id").alias("seq"),
        ((F.unix_micros("ts") - F.lit(1_704_067_200_000_000)) / 1_000_000).alias(
            "sim_arrival_time"
        ),
        F.col("value").alias("processing_time"),
    )
    grid = spark.createDataFrame(
        [(k, rpm) for k in (1, 2, 4) for rpm in (30, 60)], "k int, rpm int"
    )
    swept = base.crossJoin(F.broadcast(grid))
    params = SimParams(queue_mode="priority", seed=42)
    res = simulate_sweep(
        swept,
        params,
        group_cols=["k", "rpm", "tenant"],
        param_cols={"num_workers": "k", "rpm_limit": "rpm"},
    )
    qt = F.col("start_processing_time_by_worker") - F.col("arrival_time_in_queue")
    return (
        res.groupBy("k", "rpm")
        .agg(
            F.count(F.lit(1)).alias("processed"),
            F.round(F.avg(qt), 6).alias("avg_queuing_time"),
            F.sum(
                F.when(F.col("status") == "failed_api_limit", 1).otherwise(0)
            ).cast("long").alias("n_api_limited"),
        )
        .orderBy("k", "rpm")
    )


#: Exact DuckDB twin of the STRICT-priority (bias=1.0) two-class kernel
#: (E2 with the probabilistic dequeue pinned deterministic): single worker,
#: priority class = processing < 20 s (micros-scale), dequeue always
#: prefers priority then falls back (reference corrected dequeue,
#: /root/reference/src/queue_manager.py:188-221, rng.random() < 1.0 always
#: true), FIFO within class, arrivals at exactly the dequeue instant are
#: eligible (drain-before-dequeue pass ordering, simulator.py:195-258).
#: The recursive CTE serves ONE job per group per step: state = (last
#: finish, pending list of (cls, a_us, seq, p_us) structs); the next
#: service instant is max(last_finish, earliest pending arrival), the
#: served job is the lexicographic min struct among those arrived by then.
_KERNEL_PRIORITY_ORACLE = """
WITH RECURSIVE req AS (
  SELECT CAST(user_id AS VARCHAR) AS user_id,
         event_id AS seq,
         epoch_us(ts) AS a_us,
         CAST(round(value * 100) AS BIGINT) * 10000 AS p_us,
         CASE WHEN CAST(round(value * 100) AS BIGINT) * 10000 < 20000000
              THEN 0 ELSE 1 END AS cls
  FROM events
),
sim AS (
  SELECT user_id,
         CAST(0 AS BIGINT) AS step,
         CAST(NULL AS BIGINT) AS seq,
         CAST(NULL AS BIGINT) AS a_us,
         CAST(NULL AS BIGINT) AS s_us,
         CAST(NULL AS BIGINT) AS f_us,
         CAST(NULL AS BIGINT) AS cls,
         CAST(0 AS BIGINT) AS f_last,
         pending
  FROM (
    SELECT user_id,
           list(struct_pack(cls := cls, a_us := a_us, seq := seq,
                            p_us := p_us)) AS pending
    FROM req GROUP BY user_id
  )
  UNION ALL
  SELECT user_id, step + 1,
         c.seq, c.a_us, cut, cut + c.p_us, c.cls,
         cut + c.p_us,
         list_filter(pending, x -> x.seq <> c.seq)
  FROM (
    SELECT user_id, step, f_last, pending, cut,
           list_sort(list_filter(pending, x -> x.a_us <= cut))[1] AS c
    FROM (
      SELECT *,
             greatest(f_last,
                      list_min(list_transform(pending, x -> x.a_us))) AS cut
      FROM sim
      WHERE len(pending) > 0
    )
  )
)
SELECT user_id, seq,
       a_us / 1000000 AS arrival_s,
       s_us / 1000000 AS start_s,
       f_us / 1000000 AS finish_s,
       (s_us - a_us) / 1000000 AS queuing_s,
       CAST(cls = 0 AS BOOLEAN) AS is_priority,
       step AS service_order
FROM sim WHERE step > 0
"""


@register(
    "kernel_priority_oracle",
    oracle=_KERNEL_PRIORITY_ORACLE,
    description="Two-class priority kernel (E2), driver-graded: the DES "
    "kernel with queue_mode=priority and the probabilistic dequeue pinned "
    "deterministic (bias=1.0 -> always prefer the priority class, the "
    "reference's corrected dequeue with rng.random()<1.0 always true), "
    "k=1, limiter disabled — checked against an exact recursive-CTE "
    "oracle that serves one job per step from a pending-list state. "
    "Grades the E2 routing (processing<threshold -> priority, FIFO within "
    "class, drain-before-dequeue eligibility) that kernel_priority_sim "
    "can only rows-check (its bias<1 path is RNG-coupled by design).",
)
def q_kernel_priority_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_micro(spark, sf_dir)
    params = SimParams(
        num_workers=1,
        queue_mode="priority",
        priority_bias=1.0,
        # _events_micro passes processing_time in MICROSECONDS; the
        # threshold must be on the same scale (20 s = 2e7 µs)
        priority_threshold_seconds=20_000_000.0,
        num_apis=1,
        rpm_limit=1_000_000_000,
    )
    res = simulate(df, params, group_cols=["user_id"], shards=64)
    m = 1_000_000
    w = Window.partitionBy("user_id").orderBy(
        "start_processing_time_by_worker", "seq"
    )
    return res.select(
        "user_id",
        "seq",
        (F.col("sim_arrival_time") / m).alias("arrival_s"),
        (F.col("start_processing_time_by_worker") / m).alias("start_s"),
        (F.col("finish_processing_time_by_worker") / m).alias("finish_s"),
        (
            (F.col("start_processing_time_by_worker") - F.col("sim_arrival_time"))
            / m
        ).alias("queuing_s"),
        (F.col("processing_time") < 20_000_000.0).alias("is_priority"),
        F.row_number().over(w).cast("long").alias("service_order"),
    )


#: Exact DuckDB twin of the k=2 FIFO kernel (E3 k-worker semantics, timing
#: view): FIFO service order == arrival order, so the recursive CTE steps
#: one request per group (like the bounded oracle) carrying the two
#: busy-until slots as state.  Request i starts at
#: max(arrival_i, min(busy)) — the earliest-free worker; the worker-id
#: ascending scan (quirk 4) decides WHICH slot when both are free, which
#: affects ids only, not times, so the timing recurrence replaces the
#: freed min slot.  Limiter disabled to isolate E3.
_KERNEL_K2_ORACLE = """
WITH RECURSIVE req AS (
  SELECT CAST(user_id AS VARCHAR) AS user_id,
         event_id AS seq,
         epoch_us(ts) AS a_us,
         CAST(round(value * 100) AS BIGINT) * 10000 AS p_us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
),
sim AS (
  SELECT user_id,
         CAST(0 AS BIGINT) AS rn,
         CAST(NULL AS BIGINT) AS seq,
         CAST(NULL AS BIGINT) AS a_us,
         CAST(NULL AS BIGINT) AS s_us,
         CAST(NULL AS BIGINT) AS f_us,
         CAST(0 AS BIGINT) AS busy1,
         CAST(0 AS BIGINT) AS busy2
  FROM (SELECT DISTINCT user_id FROM req)
  UNION ALL
  SELECT r.user_id, r.rn, r.seq, r.a_us,
         greatest(r.a_us, least(s.busy1, s.busy2)),
         greatest(r.a_us, least(s.busy1, s.busy2)) + r.p_us,
         least(greatest(r.a_us, least(s.busy1, s.busy2)) + r.p_us,
               greatest(s.busy1, s.busy2)),
         greatest(greatest(r.a_us, least(s.busy1, s.busy2)) + r.p_us,
                  greatest(s.busy1, s.busy2))
  FROM sim s JOIN req r ON r.user_id = s.user_id AND r.rn = s.rn + 1
)
SELECT user_id, seq,
       a_us / 1000000 AS arrival_s,
       s_us / 1000000 AS start_s,
       f_us / 1000000 AS finish_s,
       (s_us - a_us) / 1000000 AS queuing_s
FROM sim WHERE rn > 0
"""


@register(
    "kernel_fifo_k2_oracle",
    oracle=_KERNEL_K2_ORACLE,
    description="k-worker semantics (E3), driver-graded: the DES kernel "
    "with k=2 workers in FIFO mode against the exact two-slot recurrence "
    "start_i = max(arrival_i, min(busy_until)) — FIFO preserves arrival "
    "order, so a recursive CTE stepping one request per group carries "
    "both busy-until slots as state. Worker-id assignment (ascending "
    "scan, quirk 4) affects only which physical worker serves, never the "
    "times; the limiter is disabled to isolate E3.",
)
def q_kernel_fifo_k2_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_micro(spark, sf_dir)
    params = SimParams(
        num_workers=2,
        queue_mode="fifo",
        queue_max_size=None,
        num_apis=1,
        rpm_limit=1_000_000_000,
    )
    res = simulate(df, params, group_cols=["user_id"], shards=64)
    m = 1_000_000
    return res.select(
        "user_id",
        "seq",
        (F.col("sim_arrival_time") / m).alias("arrival_s"),
        (F.col("start_processing_time_by_worker") / m).alias("start_s"),
        (F.col("finish_processing_time_by_worker") / m).alias("finish_s"),
        (
            (F.col("start_processing_time_by_worker") - F.col("sim_arrival_time"))
            / m
        ).alias("queuing_s"),
    )
