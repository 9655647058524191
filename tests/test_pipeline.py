"""End-to-end pipeline vs the reference's own shipped workload.

Runs the engine's CLI-equivalent on the reference repo's
``sample_requests.csv`` (read-only input — 25 rows, 5 users) and asserts
the same externally-observable outcomes the reference's e2e test pins
(all 25 complete, none rejected; ``/root/reference/tests/test_simulator.py:136-213``),
plus renderer and empty-input behavior.
"""

from __future__ import annotations

import math

from queue_system_simulator_spark.pipeline import render_report, run_pipeline

SAMPLE_CSV = "/root/reference/sample_requests.csv"


def test_sample_workload_completes(spark):
    res = run_pipeline(spark, SAMPLE_CSV, num_workers=1)
    assert res.input_rows == 25
    assert res.negative_arrivals == 0
    s = res.scalar_stats.collect()[0]
    assert s.processed == 25 and s.rejected == 0
    assert (
        s.priority_queue_enqueued_total + s.normal_queue_enqueued_total == 25
    )
    tl = res.timeline.collect()
    assert len(tl) == 25
    # D2 ordering: finish ascending (no rejects here)
    finishes = [r.finish_processing_time_by_worker for r in tl]
    assert finishes == sorted(finishes)
    # api usage totals: every processed request used some api (no limiter
    # pressure at this load), zero-filled to the 5-API domain
    api = {r.api_key: r.usage_count for r in res.api_counts.collect()}
    assert set(api) == {f"api_{i}" for i in range(1, 6)}
    assert sum(api.values()) == 25


def test_more_workers_never_increase_queuing(spark):
    r1 = run_pipeline(spark, SAMPLE_CSV, num_workers=1)
    r4 = run_pipeline(spark, SAMPLE_CSV, num_workers=4)
    q1 = r1.scalar_stats.collect()[0].avg_queuing_time
    q4 = r4.scalar_stats.collect()[0].avg_queuing_time
    assert q4 <= q1 + 1e-12


def test_render_report_shape(spark):
    res = run_pipeline(spark, SAMPLE_CSV)
    lines = render_report(res)
    assert lines[0] == "total requests: 25"
    assert any(line.startswith("api_5:") for line in lines)


def test_empty_csv_short_circuits(spark, tmp_path):
    p = tmp_path / "empty.csv"
    p.write_text("user_id,request_time,processing_time\n")
    res = run_pipeline(spark, str(p))
    assert res.empty
    assert render_report(res) == ["no requests parsed — nothing to simulate"]


def test_fifo_bounded_mode_rejects_and_renders_nan_safe(spark, tmp_path):
    # burst of simultaneous arrivals against a 1-slot queue, 1 worker
    rows = ["user_id,request_time,processing_time"] + [
        f"user_a,2023-01-01T00:00:00Z,{5.0 + i}" for i in range(6)
    ]
    p = tmp_path / "burst.csv"
    p.write_text("\n".join(rows) + "\n")
    res = run_pipeline(spark, str(p), queue_mode="fifo", queue_size=1)
    s = res.scalar_stats.collect()[0]
    assert s.rejected > 0 and s.processed + s.rejected == 6
    assert not math.isnan(s.avg_queuing_time)
    assert render_report(res)  # renders without error


def test_run_col_scenario_sweep(spark, tmp_path):
    # run_col partitions the log into independent simulations: per-user
    # FIFO queues never interact, so each user's timeline is the
    # single-user closed form
    rows = ["user_id,request_time,processing_time"]
    for u in ("a", "b"):
        for i in range(4):
            rows.append(f"user_{u},2023-01-01T00:00:0{i}Z,10.0")
    p = tmp_path / "two_runs.csv"
    p.write_text("\n".join(rows) + "\n")
    res = run_pipeline(
        spark, str(p), queue_mode="fifo", run_col="user_id", num_workers=1
    )
    tl = res.timeline.collect()
    assert len(tl) == 8
    by_user = {}
    for r in tl:
        by_user.setdefault(r.user_id, []).append(r)
    for u, urows in by_user.items():
        urows.sort(key=lambda r: r.sim_arrival_time)
        prev_finish = None
        for i, r in enumerate(urows):
            expected_start = (
                r.sim_arrival_time
                if i == 0
                else max(r.sim_arrival_time, prev_finish)
            )
            assert r.start_processing_time_by_worker == expected_start
            prev_finish = r.finish_processing_time_by_worker


def test_duplicate_arrival_rows_get_stable_seq(spark, tmp_path):
    # Two users sharing identical (request_time, user_id) pairs: seq must be
    # a total order anchored to file position, so repeated runs produce the
    # identical timeline (the reference's stable arrival sort preserves CSV
    # input order, /root/reference/src/simulator.py:41).
    p = tmp_path / "dups.csv"
    p.write_text(
        "user_id,request_time,processing_time\n"
        + "".join(
            f"user_{i % 2},2023-01-01T00:00:05Z,{3.0 + i}\n" for i in range(6)
        )
    )
    runs = [run_pipeline(spark, str(p)) for _ in range(2)]
    timelines = [
        [
            (r.user_id, r.processing_time, r.start_processing_time_by_worker)
            for r in res.timeline.collect()
        ]
        for res in runs
    ]
    assert timelines[0] == timelines[1]
    # per-row service times differ, so a deterministic seq fixes which row
    # starts first: the file's first row (proc=3.0) must be served first.
    assert timelines[0][0][1] == 3.0
