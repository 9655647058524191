"""The discrete-event simulation kernel (SURVEY §2 E1–E7) as a grouped,
ordered, stateful Pandas UDF.

One simulation run (queue + k servers + sliding-window rate limiter) is a
single coupled feedback system and inherently sequential — so the engine
runs it as plain Python *inside* ``groupBy(run cols).applyInPandas``:
parallelism comes from many independent groups (scenario sweeps, tenants),
which is exactly the 100 TB posture (SURVEY §4).  Each group's event list
must fit one task; the per-group state is O(k + N·RPM).

Clean-room reimplementation of the reference semantics:

* event-driven clock: fixed-point inner loop (drain arrivals → step workers
  → repeat until quiescent), then jump to ``min(next arrival, min
  busy_until)``; clock starts at the first arrival
  (``/root/reference/src/simulator.py:62-73,195-258``).
* bounded FIFO admission control: enqueue refused when full → finish = −1
  sentinel, row completes immediately (``simulator.py:213-215``,
  ``queue_manager.py:30-52``).
* two-class priority queue: route ``processing_time < threshold`` → priority
  else normal (null → normal); dequeue draws ONE ``rng.random()`` per
  attempt whenever any item exists, prefers the chosen class, falls back to
  the other (the reference's *corrected* dequeue,
  ``queue_manager.py:188-221``); ``is_full`` always False in priority mode
  (``queue_manager.py:249-256`` — the dead ``queue_max_size`` quirk,
  SURVEY §2 quirk 1).
* workers scanned in ascending id order every step — deterministic task →
  worker assignment (``simulator.py:219``, quirk 4).  A worker first checks
  completion (finish = busy_until), and only starts a new task on a later
  pass of the fixed-point loop (``worker.py:69-88``).
* per-API sliding-window limiter: evict timestamps with ``now − ts > 60``;
  allow if fewer than RPM remain (``api_client.py:17-24``); round-robin
  fallback from the *last successful* index, one draw per API, all N
  exhausted → the call fails but the task still consumes its full
  processing_time with ``used_api_id`` null (``api_client.py:26-90``,
  ``worker.py:102-104`` — quirk 2: API failure ≠ rejection).
* result order: by finish (−1 sentinel sorts last as +inf), tie-break by
  arrival-in-queue (``simulator.py:260-265``).

Determinism under Spark task retry: the RNG is seeded per group as
``Random((seed, group_key))`` — re-running a task reproduces the identical
timeline (quirk 3).
"""

from __future__ import annotations

import random
from collections import deque
from dataclasses import dataclass, replace
from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

REJECTED = -1.0


@dataclass(frozen=True)
class SimParams:
    num_workers: int = 1
    queue_mode: str = "priority"  # "priority" | "fifo"
    queue_max_size: int | None = None  # honoured only in fifo mode (quirk 1)
    priority_threshold_seconds: float = 20.0
    priority_bias: float = 0.8
    num_apis: int = 5
    rpm_limit: int = 60
    seed: int = 42

    def __post_init__(self) -> None:
        if not (0.0 <= self.priority_bias <= 1.0):
            raise ValueError("priority_bias must be within [0, 1]")
        if self.queue_mode not in ("priority", "fifo"):
            raise ValueError(f"unknown queue_mode: {self.queue_mode}")


class _BoundedFifo:
    """Bounded FIFO with admission control (E1)."""

    def __init__(self, max_size: int | None):
        self.items: deque = deque()
        self.max_size = max_size

    def is_full(self) -> bool:
        return self.max_size is not None and len(self.items) >= self.max_size

    def enqueue(self, item) -> bool:
        if self.is_full():
            return False
        self.items.append(item)
        return True

    def dequeue(self):
        return self.items.popleft() if self.items else None

    def __len__(self) -> int:
        return len(self.items)

    def is_empty(self) -> bool:
        return not self.items


class _PriorityStrategy:
    """Two-class queue with probabilistic biased dequeue (E2)."""

    def __init__(self, threshold: float, bias: float, rng: random.Random):
        self.prio: deque = deque()
        self.norm: deque = deque()
        self.threshold = threshold
        self.bias = bias
        self.rng = rng
        self.priority_enqueued = 0
        self.normal_enqueued = 0

    def is_full(self) -> bool:
        return False  # quirk 1: unbounded regardless of queue_max_size

    def enqueue(self, item) -> bool:
        proc = item["processing_time"]
        if proc is not None and proc == proc and proc < self.threshold:
            self.prio.append(item)
            self.priority_enqueued += 1
        else:
            self.norm.append(item)
            self.normal_enqueued += 1
        return True

    def dequeue(self):
        has_p, has_n = bool(self.prio), bool(self.norm)
        if not has_p and not has_n:
            return None
        # one RNG draw per attempt, even when only one class has items —
        # draw order is observable semantics (SURVEY §2 quirk 3)
        chose_priority = self.rng.random() < self.bias
        if chose_priority:
            return self.prio.popleft() if has_p else self.norm.popleft()
        return self.norm.popleft() if has_n else self.prio.popleft()

    def __len__(self) -> int:
        return len(self.prio) + len(self.norm)

    def is_empty(self) -> bool:
        return not self.prio and not self.norm


class _RateLimiter:
    """Per-API sliding 60 s window + round-robin fallback (E5/E6)."""

    WINDOW = 60.0

    def __init__(self, num_apis: int, rpm_limit: int):
        self.num_apis = num_apis
        self.rpm_limit = rpm_limit
        self.stamps: list[deque] = [deque() for _ in range(num_apis)]
        self.current = 0

    def _allowed(self, idx: int, now: float) -> bool:
        q = self.stamps[idx]
        while q and now - q[0] > self.WINDOW:
            q.popleft()
        return len(q) < self.rpm_limit

    def acquire(self, now: float) -> int | None:
        """Return the 1-based api id that served the call, or None if every
        API is saturated.  Sticks to the last successful API."""
        start = self.current
        for attempt in range(self.num_apis):
            idx = (start + attempt) % self.num_apis
            if self._allowed(idx, now):
                self.stamps[idx].append(now)
                self.current = idx
                return idx + 1
            self.current = (idx + 1) % self.num_apis
        return None


def simulate_events(
    rows: Iterable[dict[str, Any]], params: SimParams, rng_seed: Any = None
) -> list[dict[str, Any]]:
    """Run one DES over ``rows`` (dicts with ``sim_arrival_time`` /
    ``processing_time`` + passthrough keys).  Pure Python; unit-testable
    without Spark.  Numeric type agnostic: feed integer microseconds for
    exact arithmetic or float seconds for reference parity.
    """
    rng = random.Random(rng_seed if rng_seed is not None else params.seed)
    pending = sorted(
        (dict(r) for r in rows),
        key=lambda r: (r["sim_arrival_time"], r.get("seq", 0)),
    )
    if params.queue_mode == "fifo":
        queue: Any = _BoundedFifo(params.queue_max_size)
    else:
        queue = _PriorityStrategy(
            params.priority_threshold_seconds, params.priority_bias, rng
        )
    limiter = _RateLimiter(params.num_apis, params.rpm_limit)

    k = params.num_workers
    busy_until = [0.0] * k
    current: list[dict | None] = [None] * k
    completed: list[dict] = []

    now = 0.0
    if pending and pending[0]["sim_arrival_time"] >= 0:
        now = pending[0]["sim_arrival_time"]

    def workers_busy() -> bool:
        return any(t is not None for t in current)

    while pending or not queue.is_empty() or workers_busy():
        acted = True
        while acted:
            acted = False
            # drain arrivals with t <= now
            n_arrived = 0
            for req in pending:
                if req["sim_arrival_time"] <= now:
                    n_arrived += 1
                else:
                    break
            if n_arrived:
                acted = True
                for req in pending[:n_arrived]:
                    req["arrival_time_in_queue"] = now
                    if queue.is_full():
                        req["finish_processing_time_by_worker"] = REJECTED
                        req["start_processing_time_by_worker"] = 0.0
                        req["used_api_id"] = None
                        req["status"] = "rejected"
                        completed.append(req)
                    else:
                        queue.enqueue(req)
                del pending[:n_arrived]
            # step workers in id order; completion and next-start happen on
            # separate fixed-point passes (reference worker.py:69-88)
            for w in range(k):
                task = current[w]
                if task is not None and now >= busy_until[w]:
                    task["finish_processing_time_by_worker"] = busy_until[w]
                    completed.append(task)
                    current[w] = None
                    acted = True
                    continue
                if task is None and not queue.is_empty():
                    task = queue.dequeue()
                    if task is None:
                        continue
                    current[w] = task
                    task["start_processing_time_by_worker"] = now
                    api_id = limiter.acquire(now)
                    task["used_api_id"] = api_id
                    task["status"] = "success" if api_id else "failed_api_limit"
                    # API failure still consumes full processing time (quirk 2)
                    busy_until[w] = now + task["processing_time"]
                    acted = True
        # advance the clock to the next event
        nxt = None
        if pending:
            nxt = pending[0]["sim_arrival_time"]
        for w in range(k):
            if current[w] is not None and (nxt is None or busy_until[w] < nxt):
                nxt = busy_until[w]
        if nxt is None or nxt <= now:
            break
        now = nxt

    completed.sort(
        key=lambda r: (
            r["finish_processing_time_by_worker"]
            if r["finish_processing_time_by_worker"] != REJECTED
            else float("inf"),
            r["arrival_time_in_queue"],
        )
    )
    if isinstance(queue, _PriorityStrategy):
        for r in completed:
            r["priority_enqueued_total"] = queue.priority_enqueued
            r["normal_enqueued_total"] = queue.normal_enqueued
    else:
        pe = sum(1 for r in completed if r["status"] != "rejected")
        for r in completed:
            r["priority_enqueued_total"] = 0
            r["normal_enqueued_total"] = pe
    return completed


KERNEL_RESULT_FIELDS = [
    ("seq", T.LongType()),
    ("user_id", T.StringType()),
    ("sim_arrival_time", T.DoubleType()),
    ("processing_time", T.DoubleType()),
    ("arrival_time_in_queue", T.DoubleType()),
    ("start_processing_time_by_worker", T.DoubleType()),
    ("finish_processing_time_by_worker", T.DoubleType()),
    ("used_api_id", T.IntegerType()),
    ("status", T.StringType()),
    ("priority_enqueued_total", T.LongType()),
    ("normal_enqueued_total", T.LongType()),
]


def kernel_result_schema(group_cols: list[str], group_types: list[T.DataType]) -> T.StructType:
    fields = [
        T.StructField(c, t, True) for c, t in zip(group_cols, group_types)
    ] + [
        T.StructField(n, t, True)
        for n, t in KERNEL_RESULT_FIELDS
        if n not in group_cols
    ]
    return T.StructType(fields)


def simulate(
    df: DataFrame,
    params: SimParams,
    group_cols: list[str] | None = None,
    shards: int | None = None,
) -> DataFrame:
    """Distributed DES: one independent simulation per distinct group.

    ``df`` needs ``user_id, seq, sim_arrival_time, processing_time`` plus the
    group columns.  Returns the enriched timeline (SIM_RESULT shape + status
    and per-class enqueue totals).

    ``shards``: when the grouping is fine (thousands of small independent
    runs), per-group ``applyInPandas`` overhead (Arrow batch + pandas
    construction per group) dominates the actual DES work.  Setting
    ``shards=N`` hash-buckets groups into N coarse Arrow batches and runs
    the per-group simulations inside each batch — identical results (the
    per-group seed still derives from the GROUP key, so timelines and task
    retries are unaffected), ~order-of-magnitude less per-call overhead.
    At 100 TB pick N ≈ a few × total cores.
    """
    group_cols = group_cols or ["run_id"]
    in_schema = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    out_schema = kernel_result_schema(group_cols, [in_schema[c] for c in group_cols])
    result_cols = [c for c, _ in KERNEL_RESULT_FIELDS]

    def run_one(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        keys = tuple(k.item() if hasattr(k, "item") else k for k in keys)
        rows = pdf.to_dict("records")
        # stable derived seed: identical on Spark task retry (quirk 3)
        seed_str = f"{params.seed}|" + "|".join(repr(k) for k in keys)
        out = simulate_events(rows, params, rng_seed=seed_str)
        res = pd.DataFrame(out, columns=result_cols)
        res["used_api_id"] = res["used_api_id"].astype("Int32")
        for c, v in zip(group_cols, keys):
            if c in res.columns:
                res[c] = v
            else:
                res.insert(0, c, v)
        return res[[c for c in out_schema.names]]

    if shards is None:
        # pin the Python stage's partition count (see below for why)
        slots = max(int(df.sparkSession.sparkContext.defaultParallelism), 1)
        return (
            df.repartition(slots, *group_cols)
            .groupBy(*group_cols)
            .applyInPandas(run_one, out_schema)
        )

    shard_col = "__kernel_shard"
    sharded = df.withColumn(
        shard_col, F.pmod(F.xxhash64(*group_cols), F.lit(shards))
    )

    def run_shard(_keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=[shard_col])
        outs = [
            run_one(gk if isinstance(gk, tuple) else (gk,), gpdf)
            for gk, gpdf in pdf.groupby(group_cols, sort=True)
        ]
        return pd.concat(outs, ignore_index=True)

    # Explicit repartition(shards, shard_col) pins the Python stage's
    # partition count: a bare groupBy's exchange is AQE-coalesced by BYTES
    # (advisory/minPartitionSize), which is the wrong proxy for the
    # CPU-bound DES work behind it — measured at sf0.1: the 2.6 MB kernel
    # shuffle coalesced to 2 post-shuffle partitions, serializing 64
    # shards' simulations onto 2 cores (guide §2: partitioning must match
    # the compute distribution, not the byte distribution).  The count is
    # the shards parameter itself — already scale-adaptive (callers size
    # it ~2x cores) — and hashpartitioning(shard_col, shards) satisfies
    # the groupBy's clustering requirement, so no second exchange.
    return (
        sharded.repartition(shards, shard_col)
        .groupBy(shard_col)
        .applyInPandas(run_shard, out_schema)
    )


def simulate_sweep(
    df: DataFrame,
    base_params: SimParams,
    group_cols: list[str],
    param_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Parameter-sweep DES: each group carries its OWN scenario parameters
    in columns (constant within the group) — one Spark job simulates every
    (scenario × tenant) combination concurrently.

    ``param_cols`` maps SimParams field → column name, e.g.
    ``{"num_workers": "k", "rpm_limit": "rpm"}``.  This is the 100 TB
    posture made literal: a million-cell sweep is just a million groups.
    """
    param_cols = param_cols or {}
    group_cols = list(group_cols)
    in_schema = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    out_schema = kernel_result_schema(group_cols, [in_schema[c] for c in group_cols])
    result_cols = [c for c, _ in KERNEL_RESULT_FIELDS]

    def run_group(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        keys = tuple(k.item() if hasattr(k, "item") else k for k in keys)
        overrides = {
            field: pdf[col].iloc[0].item()
            if hasattr(pdf[col].iloc[0], "item")
            else pdf[col].iloc[0]
            for field, col in param_cols.items()
        }

        params = replace(base_params, **overrides)
        rows = pdf.drop(columns=list(param_cols.values())).to_dict("records")
        seed_str = f"{params.seed}|" + "|".join(repr(k) for k in keys)
        out = simulate_events(rows, params, rng_seed=seed_str)
        res = pd.DataFrame(out, columns=result_cols)
        res["used_api_id"] = res["used_api_id"].astype("Int32")
        for c, v in zip(group_cols, keys):
            if c in res.columns:
                res[c] = v
            else:
                res.insert(0, c, v)
        return res[[c for c in out_schema.names]]

    # same Python-stage partition pinning as simulate(): the sweep's groups
    # ARE the parallelism axis — never let byte-based AQE coalescing pack
    # them onto a couple of cores
    slots = max(int(df.sparkSession.sparkContext.defaultParallelism), 1)
    return (
        df.repartition(slots, *group_cols)
        .groupBy(*group_cols)
        .applyInPandas(run_group, out_schema)
    )
