"""Unit tests for functions/temporal.py — as-of join + sessionization.

Semantics references: DuckDB ASOF JOIN (the driver oracle runs it
side-by-side) and the classic 30-minute web-session gap rule.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.functions.temporal import asof_join, sessionize


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def facts(spark):
    return spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 00:00:00"), 1),
            ("u1", _ts("2024-01-01 00:05:00"), 2),
            ("u1", _ts("2024-01-01 00:10:00"), 3),
            ("u2", _ts("2024-01-01 00:07:00"), 4),
            ("u3", _ts("2024-01-01 00:01:00"), 5),  # no snapshot at all
        ],
        "k string, ts timestamp, fact_id int",
    )


@pytest.fixture()
def snaps(spark):
    return spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 00:00:00"), 10.0),  # equal-ts: visible
            ("u1", _ts("2024-01-01 00:06:00"), 20.0),
            ("u2", _ts("2024-01-01 00:09:00"), 30.0),  # after u2's only fact
        ],
        "k string, ts timestamp, snap_val double",
    )


class TestAsofJoin:
    def test_inner_semantics(self, facts, snaps):
        rows = {
            r.fact_id: r.snap_val
            for r in asof_join(facts, snaps, on="k").collect()
        }
        # fact 1 at 00:00 sees the equal-ts snapshot (<=, not <)
        # facts 1,2 precede the 00:06 snapshot; fact 3 follows it
        assert rows == {1: 10.0, 2: 10.0, 3: 20.0}

    def test_left_keeps_unmatched(self, facts, snaps):
        rows = {
            r.fact_id: r.snap_val
            for r in asof_join(facts, snaps, on="k", how="left").collect()
        }
        assert rows[4] is None and rows[5] is None  # no preceding snapshot
        assert rows[1] == 10.0

    def test_column_passthrough(self, facts, snaps):
        out = asof_join(facts, snaps, on="k")
        assert out.columns == ["k", "ts", "fact_id", "snap_val"]

    def test_requires_value_column(self, facts, spark):
        empty_snaps = spark.createDataFrame([], "k string, ts timestamp")
        with pytest.raises(ValueError):
            asof_join(facts, empty_snaps, on="k")

    def test_single_exchange_plan(self, facts, snaps):
        """The whole as-of is one shuffle on the key — no join operator,
        no range-join candidate explosion."""
        plan = asof_join(facts, snaps, on="k")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Join" not in plan
        assert plan.count("Exchange") == 1


class TestSessionize:
    def test_gap_splits(self, spark):
        df = spark.createDataFrame(
            [
                ("a", _ts("2024-01-01 00:00:00")),
                ("a", _ts("2024-01-01 00:20:00")),   # 20 min: same session
                ("a", _ts("2024-01-01 01:00:00")),   # 40 min: new session
                ("b", _ts("2024-01-01 00:00:00")),   # keys independent
            ],
            "user_id string, ts timestamp",
        )
        out = {(r.user_id, r.ts.minute + 60 * r.ts.hour): r.session_idx
               for r in sessionize(df, key="user_id", gap_s=1800).collect()}
        assert out == {("a", 0): 1, ("a", 20): 1, ("a", 60): 2, ("b", 0): 1}

    def test_exact_boundary_is_same_session(self, spark):
        # gap strictly-greater-than rule: exactly gap_s stays merged,
        # one microsecond more splits
        df = spark.createDataFrame(
            [
                ("a", _ts("2024-01-01 00:00:00")),
                ("a", _ts("2024-01-01 00:30:00")),           # == gap
                ("a", _ts("2024-01-01 01:00:00.000001")),    # gap + 1us
            ],
            "user_id string, ts timestamp",
        )
        idx = [r.session_idx for r in
               sessionize(df, key="user_id", gap_s=1800)
               .orderBy("ts").collect()]
        assert idx == [1, 1, 2]

    def test_ntz_timestamps(self, spark):
        # the driver tables carry TIMESTAMP_NTZ; unix_micros needs a cast
        df = spark.createDataFrame(
            [("a", _ts("2024-01-01 00:00:00")),
             ("a", _ts("2024-01-01 02:00:00"))],
            "user_id string, ts timestamp_ntz",
        )
        idx = [r.session_idx for r in
               sessionize(df, key="user_id", gap_s=1800)
               .orderBy("ts").collect()]
        assert idx == [1, 2]

    def test_tiebreak_makes_order_total(self, spark):
        df = spark.createDataFrame(
            [("a", _ts("2024-01-01 00:00:00"), i) for i in range(4)],
            "user_id string, ts timestamp, event_id int",
        )
        out = sessionize(df, key="user_id", gap_s=1,
                         order_tiebreak="event_id").collect()
        assert {r.session_idx for r in out} == {1}  # zero gaps: one session

    def test_single_exchange_plan(self, spark):
        df = spark.createDataFrame(
            [("a", _ts("2024-01-01 00:00:00"))],
            "user_id string, ts timestamp")
        plan = sessionize(df, key="user_id")._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Exchange") == 1
