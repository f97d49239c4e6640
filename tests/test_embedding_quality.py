"""Row-level embedding validation (operators/stats.embedding_quality)."""

from __future__ import annotations

import math

from opengauss_tools_datachecker_spark.operators.stats import embedding_quality


def test_embedding_quality_flags_each_issue(spark):
    nan = float("nan")
    rows = [
        (1, [1.0, 2.0, 3.0]),          # clean
        (2, None),                      # null_vector
        (3, [1.0, 2.0]),                # wrong_dim
        (4, [nan, 2.0, 3.0]),           # nonfinite (count 1)
        (5, [0.0, 0.0, 0.0]),           # zero_norm
        (6, [nan, math.inf, 3.0]),      # nonfinite (count 2)
        (7, [0.0, 0.0]),                # wrong_dim AND zero_norm
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sorted(
        (r["vec_id"], r["issue"], r["observed"])
        for r in embedding_quality(df, expected_dim=3).collect()
    )
    assert out == [
        (2, "null_vector", "0"),
        (3, "wrong_dim", "2"),
        (4, "nonfinite", "1"),
        (5, "zero_norm", "0"),
        (6, "nonfinite", "2"),
        (7, "wrong_dim", "2"),
        (7, "zero_norm", "0"),
    ]


def test_embedding_quality_clean_table_is_empty(spark):
    df = spark.createDataFrame(
        [(i, [float(i + 1), 1.0]) for i in range(50)], "vec_id long, embedding array<double>"
    )
    assert embedding_quality(df, expected_dim=2).count() == 0
    # map-only: no Exchange in the plan
    plan = embedding_quality(df, expected_dim=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
