"""Unit tests for functions/temporal.py — as-of join + sessionization.

Semantics references: DuckDB ASOF JOIN (the driver oracle runs it
side-by-side) and the classic 30-minute web-session gap rule.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.functions.temporal import (
    asof_join, gapfill_locf, range_join, rollup_time_bucket, sessionize,
)


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

    def test_value_column_collision_raises(self, facts, spark):
        # both sides carrying 'fact_id' would emit two identically-named
        # output columns (ambiguous downstream) — refuse like range_join
        clash = spark.createDataFrame(
            [("a", "2026-01-01 00:00:00", 1)],
            "k string, ts string, fact_id int",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        with pytest.raises(ValueError, match="collide"):
            asof_join(facts, clash, on="k")

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


class TestRangeJoin:
    def _frames(self, spark):
        facts = spark.createDataFrame(
            [(1, _ts("2024-01-01 00:30:00")),
             (2, _ts("2024-01-01 02:00:00")),   # == an interval end: excluded
             (3, _ts("2024-01-01 01:59:59")),
             (4, _ts("2024-01-02 00:00:00"))],  # matches nothing
            "event_id int, ts timestamp")
        iv = spark.createDataFrame(
            [(10, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 02:00:00")),
             (11, _ts("2024-01-01 01:00:00"), _ts("2024-01-01 03:00:00"))],
            "iv_id int, t_start timestamp, t_end timestamp")
        return facts, iv

    def test_half_open_semantics(self, spark):
        facts, iv = self._frames(spark)
        pairs = {(r.event_id, r.iv_id)
                 for r in range_join(facts, iv, bucket_s=3600).collect()}
        # overlapping intervals both match; end instant is exclusive;
        # start instant is inclusive
        assert pairs == {(1, 10), (3, 10), (3, 11), (2, 11)}

    def test_matches_cross_join_reference(self, spark):
        facts, iv = self._frames(spark)
        expect = {
            (r.event_id, r.iv_id)
            for r in facts.crossJoin(iv)
            .filter("t_start <= ts AND ts < t_end").collect()
        }
        for bucket_s in (60, 3600, 86400 * 7):  # bucket width is perf-only
            got = {(r.event_id, r.iv_id)
                   for r in range_join(facts, iv, bucket_s=bucket_s).collect()}
            assert got == expect, bucket_s

    def test_no_duplicate_pairs(self, spark):
        facts, iv = self._frames(spark)
        out = range_join(facts, iv, bucket_s=60).collect()  # many buckets/iv
        pairs = [(r.event_id, r.iv_id) for r in out]
        assert len(pairs) == len(set(pairs))

    def test_column_collision_raises(self, spark):
        facts, iv = self._frames(spark)
        with pytest.raises(ValueError):
            range_join(facts, iv.withColumnRenamed("iv_id", "event_id"))

    def test_empty_and_inverted_intervals_ignored(self, spark):
        facts = spark.createDataFrame(
            [(1, _ts("2024-01-01 00:30:00"))], "event_id int, ts timestamp")
        iv = spark.createDataFrame(
            [(10, _ts("2024-01-01 00:30:00"), _ts("2024-01-01 00:30:00")),
             (11, _ts("2024-01-01 01:00:00"), _ts("2024-01-01 00:00:00")),
             (12, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"))],
            "iv_id int, t_start timestamp, t_end timestamp")
        out = [r.iv_id for r in range_join(facts, iv, bucket_s=3600).collect()]
        assert out == [12]  # zero-length + inverted both match nothing

    def test_broadcast_keeps_facts_unshuffled(self, spark):
        facts, iv = self._frames(spark)
        plan = range_join(facts, iv, bucket_s=3600)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan


class TestRollupTimeBucket:
    def test_candlestick(self, spark):
        df = spark.createDataFrame(
            [("a", _ts("2024-01-01 00:05:00"), 3),
             ("a", _ts("2024-01-01 00:20:00"), 1),
             ("a", _ts("2024-01-01 00:50:00"), 2),   # same hour bucket
             ("a", _ts("2024-01-01 01:10:00"), 9),   # next bucket
             ("b", _ts("2024-01-01 00:30:00"), 7)],
            "k string, ts timestamp, v long")
        out = {(r.k, r.bucket_ts.hour): r
               for r in rollup_time_bucket(df, "k", "ts", "v", 3600).collect()}
        a0 = out[("a", 0)]
        assert (a0.n_events, a0.v_min, a0.v_max, a0.v_sum) == (3, 1, 3, 6)
        assert (a0.v_first, a0.v_last) == (3, 2)  # open at 00:05, close 00:50
        assert out[("a", 1)].n_events == 1
        assert out[("b", 0)].v_sum == 7

    def test_bucket_ts_is_bucket_start(self, spark):
        df = spark.createDataFrame(
            [("a", _ts("2024-01-01 13:59:59"), 1)],
            "k string, ts timestamp, v long")
        [r] = rollup_time_bucket(df, "k", "ts", "v", 3600).collect()
        assert r.bucket_ts == _ts("2024-01-01 13:00:00")

    def test_tiebreak_orders_equal_timestamps(self, spark):
        df = spark.createDataFrame(
            [("a", _ts("2024-01-01 00:00:00"), 1, 5),
             ("a", _ts("2024-01-01 00:00:00"), 2, 8)],
            "k string, ts timestamp, seq int, v long")
        [r] = rollup_time_bucket(df, "k", "ts", "v", 3600,
                                 tiebreak="seq").collect()
        assert (r.v_first, r.v_last) == (5, 8)

    def test_single_shuffle(self, spark):
        df = spark.createDataFrame(
            [("a", _ts("2024-01-01 00:00:00"), 1)],
            "k string, ts timestamp, v long")
        plan = rollup_time_bucket(df, "k", "ts", "v", 3600) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


class TestGapfillLocf:
    def test_fills_gaps_and_carries_forward(self, spark):
        df = spark.createDataFrame(
            [("a", _ts("2024-01-01 00:10:00"), 5),
             ("a", _ts("2024-01-01 03:10:00"), 7)],  # 2 empty hours between
            "k string, ts timestamp, v long")
        out = sorted(gapfill_locf(df, "k", "ts", "v", 3600).collect(),
                     key=lambda r: r.bucket_ts)
        assert [r.bucket_ts.hour for r in out] == [0, 1, 2, 3]
        assert [r.n_events for r in out] == [1, 0, 0, 1]
        assert [r.value_locf for r in out] == [5, 5, 5, 7]

    def test_locf_uses_latest_in_bucket(self, spark):
        df = spark.createDataFrame(
            [("a", _ts("2024-01-01 00:10:00"), 5),
             ("a", _ts("2024-01-01 00:40:00"), 6),  # later in same bucket
             ("a", _ts("2024-01-01 02:00:00"), 9)],
            "k string, ts timestamp, v long")
        out = sorted(gapfill_locf(df, "k", "ts", "v", 3600).collect(),
                     key=lambda r: r.bucket_ts)
        assert [r.value_locf for r in out] == [6, 6, 9]

    def test_keys_get_independent_grids(self, spark):
        df = spark.createDataFrame(
            [("a", _ts("2024-01-01 00:00:00"), 1),
             ("a", _ts("2024-01-01 05:00:00"), 2),
             ("b", _ts("2024-01-01 02:00:00"), 3)],
            "k string, ts timestamp, v long")
        out = gapfill_locf(df, "k", "ts", "v", 3600)
        counts = {r.k: r.n for r in
                  out.groupBy("k").agg(F.count("*").alias("n")).collect()}
        assert counts == {"a": 6, "b": 1}
