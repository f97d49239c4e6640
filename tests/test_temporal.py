"""Temporal operator tests: as-of join semantics and sessionization."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.operators.temporal import (
    asof_join,
    session_stats,
    sessionize,
)


def _ts(minute: int, second: int = 0):
    return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(
        minutes=minute, seconds=second
    )


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(20)), (3, 200, _ts(5)), (4, 100, _ts(2))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(51, 100, _ts(3)), (52, 100, _ts(10)), (53, 100, _ts(15)), (54, 300, _ts(1))],
        "rid long, user_id long, ts timestamp_ntz",
    )
    out = {
        r.event_id: r.rid_asof
        for r in asof_join(left, right, on="ts", by=["user_id"], value_cols=["rid"]).collect()
    }
    assert out[1] == 52      # exact-timestamp tie is INCLUSIVE (right first)
    assert out[2] == 53      # latest prior among several
    assert out[3] is None    # other user's rows never leak
    assert out[4] is None    # nothing at or before ts


def test_asof_join_one_shuffle_no_range_join(spark):
    left = spark.createDataFrame([(1, 1, _ts(1))], "event_id long, user_id long, ts timestamp_ntz")
    right = spark.createDataFrame([(2, 1, _ts(0))], "rid long, user_id long, ts timestamp_ntz")
    plan = asof_join(left, right, on="ts", by=["user_id"], value_cols=["rid"])._jdf.queryExecution().executedPlan().toString()
    # the union-window form: a Window over the by-key, and NO join node
    assert "Window" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_sessionize_gap_boundaries(spark):
    rows = [
        (1, 7, _ts(0)), (2, 7, _ts(29)),   # gap 29 min -> same session
        (3, 7, _ts(59, 1)),                # 30 min + 1s -> NEW session
        (4, 7, _ts(89, 1)),                # exactly 30:00 gap -> same (strict >)
        (5, 8, _ts(0)),                    # other user: own numbering
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp_ntz")
    s = {r.event_id: r.session_idx for r in sessionize(df, gap_minutes=30).collect()}
    assert s[1] == 1 and s[2] == 1
    assert s[3] == 2
    assert s[4] == 2
    assert s[5] == 1


def test_session_stats_rollup(spark):
    rows = [
        (1, 7, _ts(0), 1.0), (2, 7, _ts(10), 2.5),
        (3, 7, _ts(59), 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double"
    )
    out = {
        (r.user_id, r.session_idx): (r.n_events, r.total_value)
        for r in session_stats(df, gap_minutes=30).collect()
    }
    assert out[(7, 1)] == (2, 3.5)
    assert out[(7, 2)] == (1, 4.0)
