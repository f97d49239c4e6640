"""Robust numeric-outlier detection (median / MAD).

A validation engine needs a per-row numeric anomaly check alongside the
distribution-level drift tests: drift (N4) flags a whole bucket whose
histogram moved; this operator flags the individual rows whose value
sits outside a robust band around their group's center. Median + MAD
(scaled by the 1.4826 normal-consistency constant) instead of
mean + stddev so a handful of extreme rows cannot mask themselves by
inflating the threshold — the exact failure mode of z-scores on
corrupt data.

Scale notes (10^12 rows): the stats side aggregates down to one row
per group (map-side combined) and is broadcast back — the data table
is scanned twice (once per percentile pass) and shuffled zero times
for the flagging join. ``approx=True`` switches both percentile passes
to ``approx_percentile`` (single-pass sketch, default accuracy 1/10000)
for scans where two exact sort-based percentiles are too expensive;
the flagging join is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Phi^-1(0.75): MAD * 1.4826 estimates sigma for normal data.
MAD_SIGMA = 1.4826


def robust_stats(
    df: DataFrame,
    value_col: str | Column,
    by: list[str],
    approx: bool = False,
) -> DataFrame:
    """Per-group (median, mad): two percentile aggregations, the second
    over absolute deviations from the broadcast first."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    pct = F.approx_percentile if approx else F.percentile
    med = df.groupBy(*by).agg(pct(v.cast("double"), F.lit(0.5)).alias("med"))
    dev = df.join(F.broadcast(med), by).select(
        *by, "med", F.abs(v.cast("double") - F.col("med")).alias("_absdev")
    )
    return dev.groupBy(*by).agg(
        F.first("med").alias("med"),
        pct(F.col("_absdev"), F.lit(0.5)).alias("mad"),
    )


def robust_outliers(
    df: DataFrame,
    value_col: str | Column,
    by: list[str],
    k: float = 3.0,
    approx: bool = False,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Rows where |value - group median| > k * 1.4826 * MAD.

    Output: the input columns plus ``med``, ``mad`` — callers project.
    Groups with MAD = 0 (more than half the group identical) flag every
    deviating row, the standard Hampel-filter semantics. Pass a
    precomputed ``stats`` frame (e.g. from a clean baseline snapshot)
    to detect rows anomalous vs HISTORY rather than vs their own —
    possibly already-corrupt — cohort.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    s = stats if stats is not None else robust_stats(df, value_col, by, approx=approx)
    joined = df.join(F.broadcast(s), by)
    return joined.filter(
        F.abs(v.cast("double") - F.col("med")) > F.lit(k * MAD_SIGMA) * F.col("mad")
    )
