"""Per-partition column statistics (N1) + run metrics aggregation (A1-A3).

Generalizes two reference behaviors:
- the NULL-sentinel handling of canonicalization (SURVEY.md §1.4) →
  measured per-partition null rates;
- driver-side StatAggregation (count/sum/max/min/avg/TPS ring buffer,
  /root/reference src/main/java/com/gauss/common/stats/
  StatAggregation.java:45-126) → one groupBy().agg() over the data
  itself.

One Spark job computes every column's stats for every bucket: a single
wide groupBy (map-side partial agg, one shuffle keyed by bucket) then an
unpivot to long form. Distinct counts use HyperLogLog
(approx_count_distinct) — mergeable sketches, no second shuffle, the
only sane choice at 10^12 rows (BASELINE.json north_star names HLL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(
    df: DataFrame,
    group_col: str = "bucket",
    cols: list[str] | None = None,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """Long-form stats: (bucket, column, n_rows, n_null, null_rate, min, max, approx_distinct)."""
    cols = cols or [c for c in df.columns if c != group_col]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nn"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
            F.approx_count_distinct(c, rsd=approx_rsd).alias(f"{c}__ad"),
        ]
    wide = df.groupBy(group_col).agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__min, {c}__max, {c}__ad" for c in cols
    )
    long = wide.selectExpr(
        group_col,
        "__n as n_rows",
        f"stack({len(cols)}, {stack_args}) as (column, n_null, min, max, approx_distinct)",
    )
    return long.select(
        group_col,
        "column",
        "n_rows",
        "n_null",
        (F.col("n_null") / F.col("n_rows")).alias("null_rate"),
        "min",
        "max",
        "approx_distinct",
    )


def metric_summary(metrics: DataFrame, value_col: str, by: list[str] | None = None) -> DataFrame:
    """count/min/max/avg/sum — the StatAggregation analog as one agg."""
    g = metrics.groupBy(*by) if by else metrics.groupBy()
    return g.agg(
        F.count(value_col).alias("n"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
        F.avg(value_col).alias("avg_v"),
        F.sum(value_col).alias("sum_v"),
    )
