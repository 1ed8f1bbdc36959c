"""Interval join (operators/interval.py): closed-bound semantics,
width-invariance (bucketing must never change results), guards, and the
no-nested-loop plan claim."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from featherstore_spark.operators.interval import interval_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, 0)


@pytest.fixture()
def frames(spark):
    pts = spark.createDataFrame(
        [(1, _ts(0), 100), (1, _ts(30), 101), (1, _ts(31), 102), (2, _ts(30), 103)],
        "user_id: long, ts: timestamp, event_id: long",
    )
    iv = spark.createDataFrame(
        [(1, _ts(0), _ts(30), 900), (2, _ts(45), _ts(59), 901)],
        "user_id: long, start_ts: timestamp, end_ts: timestamp, promo_id: long",
    )
    return pts, iv


def test_closed_bounds_and_key_isolation(spark, frames):
    pts, iv = frames
    got = {
        (r["event_id"], r["promo_id"])
        for r in interval_join(pts, iv, on="user_id", width="5 minutes").collect()
    }
    # ts==start and ts==end both match; ts just past end does not; user 2's
    # point is outside user 2's window and must NOT borrow user 1's window
    assert got == {(100, 900), (101, 900)}


def test_width_invariance(spark, frames):
    pts, iv = frames
    ref = sorted(
        (r["event_id"], r["promo_id"])
        for r in interval_join(pts, iv, on="user_id", width="1 hour").collect()
    )
    for width in ("30 seconds", "7 minutes", "auto"):
        got = sorted(
            (r["event_id"], r["promo_id"])
            for r in interval_join(pts, iv, on="user_id", width=width).collect()
        )
        assert got == ref, width


def test_left_join_keeps_unmatched_points(spark, frames):
    pts, iv = frames
    out = interval_join(pts, iv, on="user_id", width="5 minutes", how="left")
    rows = {r["event_id"]: r["promo_id"] for r in out.collect()}
    assert rows == {100: 900, 101: 900, 102: None, 103: None}


def test_null_and_inverted_intervals_never_match(spark):
    pts = spark.createDataFrame([(1, _ts(10), 1)], "user_id: long, ts: timestamp, event_id: long")
    iv = spark.createDataFrame(
        [(1, None, _ts(30), 1), (1, _ts(20), _ts(5), 2)],
        "user_id: long, start_ts: timestamp, end_ts: timestamp, promo_id: long",
    )
    assert interval_join(pts, iv, on="user_id", width="1 minute").count() == 0


def test_ambiguous_columns_raise(spark, frames):
    pts, iv = frames
    bad = iv.withColumnRenamed("promo_id", "event_id")
    with pytest.raises(ValueError, match="ambiguous"):
        interval_join(pts, bad, on="user_id")


def test_pathological_span_fails_loudly(spark):
    pts = spark.createDataFrame([(1, _ts(0), 1)], "user_id: long, ts: timestamp, event_id: long")
    iv = spark.createDataFrame(
        [(1, dt.datetime(2000, 1, 1), dt.datetime(2030, 1, 1), 1)],
        "user_id: long, start_ts: timestamp, end_ts: timestamp, promo_id: long",
    )
    with pytest.raises(Exception, match="spans more than"):
        interval_join(pts, iv, on="user_id", width="1 second", max_span_buckets=100).collect()


def test_plan_is_equi_join(spark, frames):
    pts, iv = frames
    plan = (
        interval_join(pts, iv, on="user_id", width="5 minutes")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
