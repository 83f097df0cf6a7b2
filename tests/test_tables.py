"""load_table's events-layout dispatch (tables.py): the nanos retry
must trigger only for the nanos schema-conversion error, and every
layout must land on a plain session timestamp column."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from b3_analytics_engine_spark.tables import load_table

_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _write_events(tmp_path, ts_array):
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}']),
            "ts": ts_array,
        }
    )
    pq.write_table(table, os.path.join(str(tmp_path), "events.parquet"))


def test_nanos_layout_retries_and_converts(spark, tmp_path):
    # TIMESTAMP(NANOS) physical layout: the plain read fails with the
    # Parquet conversion error, load_table retries with nanosAsLong
    # and converts the raw long to a session timestamp.
    _write_events(
        tmp_path,
        pa.array([1700000000_000_000_000, 1700000060_500_000_000],
                 pa.timestamp("ns")),
    )
    try:
        df = load_table(spark, str(tmp_path), "events")
        assert df.schema["ts"].dataType.typeName() == "timestamp"
        vals = [r["ts"] for r in df.orderBy("event_id").collect()]
        assert vals[0].second == 20  # 1700000000 = ...:13:20 UTC epoch
        assert (vals[1] - vals[0]).total_seconds() == 60.5
    finally:
        spark.conf.unset(_CONF)


def test_missing_path_raises_without_nanos_retry(spark, tmp_path):
    # A nonexistent path must surface the original read error and NOT
    # flip the session-wide nanos conf (the old bare-except retry
    # produced a second, confusing error with the conf left set).
    with pytest.raises(Exception) as ei:
        load_table(spark, str(tmp_path / "nowhere"), "events")
    assert "Illegal Parquet type" not in str(ei.value)
    assert spark.conf.get(_CONF, "false") == "false"
