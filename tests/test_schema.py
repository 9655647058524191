"""load_table must normalize events.ts across parquet timestamp encodings.

The driver regenerates /root/testdata between rounds and has already
switched events.ts once (round 1: INT64 TIMESTAMP(NANOS); round 2:
timestamp[us] isAdjustedToUTC=false -> Spark TIMESTAMP_NTZ).  Whatever the
file stores, every downstream operator sees one stable session-tz TIMESTAMP
with identical microsecond values.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from queue_system_simulator_spark.schema import load_table

_ROWS = [
    (1, dt.datetime(2024, 1, 1, 0, 0, 5), 7, "view", 1.5, "{}"),
    (2, dt.datetime(2024, 1, 1, 0, 1, 30), 8, "click", 2.5, "{}"),
]


def _write_events(tmp_path, ts_type):
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in _ROWS]).cast(ts_type),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS]),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array([r[5] for r in _ROWS]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize(
    "ts_type",
    [
        pa.timestamp("ns"),          # round-1 layout: nanosAsLong -> bigint
        pa.timestamp("us"),          # round-2 layout: reads as TIMESTAMP_NTZ
        pa.timestamp("us", tz="UTC"),  # adjusted-to-UTC: reads as TIMESTAMP
    ],
    ids=["nanos", "micros-ntz", "micros-utc"],
)
def test_load_table_normalizes_ts(spark, tmp_path, ts_type):
    sf_dir = _write_events(tmp_path, ts_type)
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {r["event_id"]: r["ts"] for r in df.select("event_id", "ts").collect()}
    assert got == {r[0]: r[1] for r in _ROWS}
