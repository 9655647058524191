"""Scan-layer tests: CSV validation semantics (SURVEY §2 A1–A4; reference
``/root/reference/tests/test_csv_parser.py``) and the seeded generator (A6)."""

from __future__ import annotations

import pytest
from py4j.protocol import Py4JJavaError

from queue_system_simulator_spark.sources import (
    generate_sample_requests,
    read_requests_csv,
)
from queue_system_simulator_spark.sources.csv_source import (
    MissingColumnError,
    corrupt_rows,
)

VALID = """user_id,request_time,processing_time
user_a,2023-01-01T00:00:00.500000Z,2.5
user_b,2023-01-01T00:00:01Z,1.0
"""


def write(tmp_path, body, name="in.csv"):
    p = tmp_path / name
    p.write_text(body)
    return str(p)


def test_valid_csv(spark, tmp_path):
    df = read_requests_csv(spark, write(tmp_path, VALID))
    rows = df.orderBy("user_id").collect()
    assert len(rows) == 2
    assert rows[0]["user_id"] == "user_a"
    assert rows[0]["processing_time"] == 2.5
    assert rows[0]["request_time"].microsecond == 500000


def test_header_only(spark, tmp_path):
    df = read_requests_csv(
        spark, write(tmp_path, "user_id,request_time,processing_time\n")
    )
    assert df.count() == 0


def test_empty_file(spark, tmp_path):
    df = read_requests_csv(spark, write(tmp_path, ""))
    assert df.count() == 0
    assert df.columns == ["user_id", "request_time", "processing_time"]


def test_missing_column_raises(spark, tmp_path):
    path = write(tmp_path, "user_id,request_time\nu,2023-01-01T00:00:00Z\n")
    with pytest.raises(MissingColumnError):
        read_requests_csv(spark, path)


def test_extra_columns_tolerated(spark, tmp_path):
    body = (
        "user_id,request_time,processing_time,extra\n"
        "u,2023-01-01T00:00:00Z,1.0,x\n"
    )
    df = read_requests_csv(spark, write(tmp_path, body))
    assert df.columns == ["user_id", "request_time", "processing_time"]
    assert df.count() == 1


def test_malformed_float_failfast(spark, tmp_path):
    body = "user_id,request_time,processing_time\nu,2023-01-01T00:00:00Z,not_a_float\n"
    df = read_requests_csv(spark, write(tmp_path, body), extra_columns=False)
    with pytest.raises(Py4JJavaError):
        df.collect()


def test_permissive_reports_corrupt_rows(spark, tmp_path):
    body = (
        "user_id,request_time,processing_time\n"
        "good,2023-01-01T00:00:00Z,1.0\n"
        "bad,2023-01-01T00:00:00Z,not_a_float\n"
    )
    df = read_requests_csv(
        spark, write(tmp_path, body), mode="PERMISSIVE", extra_columns=False
    )
    df = df.cache()  # single-pass corrupt-record capture
    bad = corrupt_rows(df).collect()
    assert len(bad) == 1 and "not_a_float" in bad[0][0]


def test_generator_deterministic_and_sorted(spark):
    a = generate_sample_requests(spark, num_users=5, max_requests_per_user=5, seed=42)
    b = generate_sample_requests(spark, num_users=5, max_requests_per_user=5, seed=42)
    ra, rb = a.collect(), b.collect()
    assert ra == rb
    assert len(ra) == 25
    ts = [r["request_time"] for r in ra]
    assert ts == sorted(ts)
    for r in ra:
        assert 1.0 <= r["processing_time"] <= 10.0
