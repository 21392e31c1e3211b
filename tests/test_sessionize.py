"""Gap-based sessionization: boundary and ordering behavior."""

from __future__ import annotations

import datetime as dt

import pytest

from mongo_iceberg_lakehouse_spark.operators.relational import sessionize


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, 0) + dt.timedelta(minutes=minute)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: 0, 10, 45 (gap 35 > 30 -> new), 70 (gap 25 -> same)
        (1, 1, _ts(0)), (1, 2, _ts(10)), (1, 3, _ts(45)), (1, 4, _ts(70)),
        # user 2: exactly-30-minute gap is NOT a new session (strict >)
        (2, 5, _ts(0)), (2, 6, _ts(30)),
    ]
    return spark.createDataFrame(rows, ["user_id", "event_id", "ts"])


def test_sessionize_gap_assignment(events):
    out = sessionize(events, "user_id", "ts", "event_id", gap_minutes=30)
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1, 6: 1}


def test_sessionize_is_per_key(events):
    out = sessionize(events, "user_id", "ts", "event_id")
    # both users start at session 1 independently
    firsts = (
        out.groupBy("user_id").min("session_id").collect()
    )
    assert all(r["min(session_id)"] == 1 for r in firsts)
