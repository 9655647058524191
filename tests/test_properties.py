"""Property-based invariants for the DES kernel (hypothesis).

The reference ships only example-based tests (SURVEY §5); these properties
pin the semantics for arbitrary workloads:

* FIFO/k=1 kernel ≡ the closed-form recurrence (the E1 special case that
  the SQL oracle is built on) on ANY input;
* lifecycle invariants (start ≥ arrival, finish = start + proc, input
  conservation) for any worker count / queue mode / seed;
* at most k tasks ever in service simultaneously;
* the rate limiter never admits more than RPM calls per API in any sliding
  60 s window.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from queue_system_simulator_spark.operators.kernel import (
    SimParams,
    _RateLimiter,
    simulate_events,
)

# integer-second arrivals/durations keep the arithmetic exact
_events = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(1, 500)),
    min_size=1,
    max_size=60,
)


def _mk(rows):
    return [
        {"seq": i, "sim_arrival_time": float(a), "processing_time": float(p)}
        for i, (a, p) in enumerate(rows)
    ]


@settings(max_examples=60, deadline=None)
@given(_events)
def test_fifo_k1_matches_closed_form(rows):
    out = simulate_events(
        _mk(rows), SimParams(num_workers=1, queue_mode="fifo", queue_max_size=None)
    )
    by_arrival = sorted(out, key=lambda r: (r["sim_arrival_time"], r["seq"]))
    prev_finish = 0.0
    first = True
    for r in by_arrival:
        expected_start = (
            r["sim_arrival_time"]
            if first
            else max(r["sim_arrival_time"], prev_finish)
        )
        first = False
        assert r["start_processing_time_by_worker"] == expected_start
        assert (
            r["finish_processing_time_by_worker"]
            == expected_start + r["processing_time"]
        )
        prev_finish = r["finish_processing_time_by_worker"]


@settings(max_examples=40, deadline=None)
@given(
    _events,
    st.integers(1, 4),
    st.sampled_from(["fifo", "priority"]),
    st.integers(0, 3),
)
def test_lifecycle_invariants(rows, k, mode, seed):
    out = simulate_events(
        _mk(rows), SimParams(num_workers=k, queue_mode=mode, seed=seed)
    )
    assert sorted(r["seq"] for r in out) == list(range(len(rows)))  # conservation
    for r in out:
        assert r["status"] != "rejected"  # unbounded queues never reject
        assert r["arrival_time_in_queue"] >= r["sim_arrival_time"]
        assert r["start_processing_time_by_worker"] >= r["arrival_time_in_queue"]
        assert (
            r["finish_processing_time_by_worker"]
            == r["start_processing_time_by_worker"] + r["processing_time"]
        )


@settings(max_examples=40, deadline=None)
@given(_events, st.integers(1, 3))
def test_at_most_k_in_service(rows, k):
    out = simulate_events(_mk(rows), SimParams(num_workers=k, queue_mode="fifo"))
    # sweep service intervals [start, finish): concurrency must stay <= k
    points = []
    for r in out:
        points.append((r["start_processing_time_by_worker"], 1))
        points.append((r["finish_processing_time_by_worker"], -1))
    active = 0
    for _, delta in sorted(points, key=lambda p: (p[0], p[1])):
        active += delta
        assert active <= k


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 600), min_size=1, max_size=300),
    st.integers(1, 3),
    st.integers(1, 10),
)
def test_rate_limiter_window_bound(times, num_apis, rpm):
    lim = _RateLimiter(num_apis=num_apis, rpm_limit=rpm)
    granted: list[tuple[float, int]] = []
    for t in sorted(times):
        api = lim.acquire(float(t))
        if api is not None:
            granted.append((float(t), api))
    for now, api in granted:
        in_window = [
            t for t, a in granted if a == api and now - t <= 60.0 and t <= now
        ]
        assert len(in_window) <= rpm


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(0, 10_000_000), min_size=1, max_size=400),
    st.lists(st.floats(0.0, 1.0), min_size=1, max_size=4),
)
def test_distributed_percentiles_match_numpy(vals, ps):
    """Rank selection must equal numpy's linear-interpolation percentile for
    any value multiset (duplicates, constants, singletons) and any p in
    [0, 1] — the contract fifo_stats_distributed stakes its oracle on."""
    import numpy as np
    import pytest

    from queue_system_simulator_spark.operators.statistics import (
        exact_percentiles_distributed,
    )
    from queue_system_simulator_spark.session import get_spark

    spark = get_spark()
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = exact_percentiles_distributed(df, "v", ps=tuple(ps))
    want = [float(np.percentile(np.array(vals, dtype="float64"), p * 100))
            for p in ps]
    # rel covers the ≤1-ulp lerp-formula difference vs numpy (numpy flips
    # interpolation direction at frac >= 0.5); graded queries round to the
    # 1e-6 grid, far coarser than this bound
    assert got == pytest.approx(want, rel=1e-12, abs=1e-9)


def test_dp_noise_is_deterministic_and_centered(spark, sf_dir):
    """The seeded-Laplace release must be run-stable (same noise each
    build — the md5 seed, not rand()) and decompose exactly."""
    from queue_system_simulator_spark.plans.analytics_queries import (
        q_dp_noisy_counts,
    )

    a = {r["event_type"]: r for r in q_dp_noisy_counts(spark, sf_dir).collect()}
    b = {r["event_type"]: r for r in q_dp_noisy_counts(spark, sf_dir).collect()}
    assert a.keys() == b.keys() and len(a) > 0
    for k in a:
        assert a[k]["noise"] == b[k]["noise"]
        assert abs(a[k]["noisy_count"] - (a[k]["true_count"] + a[k]["noise"])) < 2e-6
        assert a[k]["epsilon"] == 1.0
        # Laplace(1) at these counts: noise is small relative to the count
        assert abs(a[k]["noise"]) < 30
