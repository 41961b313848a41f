"""As-of and range joins: tie, boundary, and bucket-edge semantics."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.operators.asof import asof_join
from asctb_ct_label_mapper_spark.operators.rangejoin import range_join


def ts(minute: int, second: int = 0):
    return datetime(2024, 1, 1, 10, minute, second)


def test_asof_backward_inclusive_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, "a", ts(0)), (2, "a", ts(5)), (3, "a", ts(10)), (4, "b", ts(10))],
        "event_id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", ts(5), 50.0), ("a", ts(8), 80.0)],
        "k string, ts timestamp, v double",
    )
    rows = {r["event_id"]: r for r in
            asof_join(left, right, ["k"], right_value_cols=["v"]).collect()}
    assert rows[1]["v"] is None and rows[1]["ts_asof"] is None  # before any right
    assert rows[2]["v"] == 50.0 and rows[2]["ts_asof"] == ts(5)  # INCLUSIVE tie
    assert rows[3]["v"] == 80.0  # latest prior, not first
    assert rows[4]["v"] is None  # key isolation: b never saw a marker


def test_asof_left_rows_all_preserved(spark):
    left = spark.createDataFrame(
        [(i, "k", ts(i)) for i in range(7)], "event_id long, k string, ts timestamp"
    )
    right = spark.createDataFrame([("k", ts(3), 1.0)], "k string, ts timestamp, v double")
    out = asof_join(left, right, ["k"], right_value_cols=["v"]).collect()
    assert len(out) == 7
    matched = {r["event_id"] for r in out if r["v"] is not None}
    assert matched == {3, 4, 5, 6}


def test_range_join_boundaries_inclusive(spark):
    points = spark.createDataFrame(
        [(1, "k", ts(0)), (2, "k", ts(5)), (3, "k", ts(10)), (4, "k", ts(10, 1))],
        "event_id long, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("k", ts(5), ts(10))], "k string, s timestamp, e timestamp"
    )
    got = {r["event_id"] for r in
           range_join(points, intervals, ["k"], "ts", "s", "e").collect()}
    assert got == {2, 3}  # both ends inclusive, outside rows excluded


def test_range_join_interval_spanning_buckets_no_dups(spark):
    """An interval longer than the bucket occupies several buckets, but a
    point matches it exactly once (it meets the interval only in its own
    bucket)."""
    points = spark.createDataFrame(
        [(1, "k", ts(7))], "event_id long, k string, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [("k", ts(0), ts(59))], "k string, s timestamp, e timestamp"
    )
    out = range_join(points, intervals, ["k"], "ts", "s", "e", bucket="2 minutes").collect()
    assert len(out) == 1


def test_range_join_overlapping_intervals_all_match(spark):
    points = spark.createDataFrame(
        [(1, "k", ts(6))], "event_id long, k string, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [("k", ts(0), ts(10)), ("k", ts(5), ts(7)), ("k", ts(8), ts(9))],
        "k string, s timestamp, e timestamp",
    )
    out = range_join(points, intervals, ["k"], "ts", "s", "e").collect()
    assert len(out) == 2  # the two windows containing 10:06


def test_range_join_plans_hash_equi_join(spark):
    """The physical plan must be a hash equi-join on (key, bucket), not a
    BroadcastNestedLoopJoin theta-join."""
    points = spark.createDataFrame(
        [(1, "k", ts(1))], "event_id long, k string, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [("k", ts(0), ts(2))], "k string, s timestamp, e timestamp"
    )
    plan = range_join(points, intervals, ["k"], "ts", "s", "e")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
