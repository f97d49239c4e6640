"""Distribution-drift detection (N4): histograms + chi²/KS/PSI/W1 per
partition.

No reference analog; mandated by BASELINE.json north_star:
"distribution-drift detection on lang/content-length histograms using a
two-sample chi-square/KS computed in vectorized pandas-Arrow UDFs" —
extended with PSI (monitoring-dashboard score) and Wasserstein-1
(total CDF displacement, complements KS's max gap).

Design for 10^12 rows: the raw data is reduced to histograms FIRST with
a plain groupBy (one shuffle, map-side combine → output is
#buckets × #categories rows, i.e. tiny). The statistics then run in
``applyInPandas`` over the *histogram* rows, one pandas group per
bucket — the pandas UDF never sees raw data, so its cost is O(buckets ×
categories) regardless of input scale. scipy-free: chi² critical values
via the Wilson–Hilferty cube approximation; KS critical via the
asymptotic c(α)·sqrt((n+m)/nm) formula.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_Z = {0.10: 1.2815515655, 0.05: 1.6448536270, 0.01: 2.3263478740}
_KS_C = {0.10: 1.224, 0.05: 1.358, 0.01: 1.628}


def chi2_critical(df_: int, alpha: float) -> float:
    """Wilson–Hilferty approximation of the chi² quantile (scipy-free)."""
    z = _Z.get(alpha, 1.6448536270)
    k = float(df_)
    return k * (1.0 - 2.0 / (9.0 * k) + z * math.sqrt(2.0 / (9.0 * k))) ** 3


def categorical_histogram(df: DataFrame, value_col: str, by: str = "bucket") -> DataFrame:
    """(bucket, value, n) — one shuffle, fully combined map-side."""
    return df.groupBy(by, F.col(value_col).alias("value")).agg(F.count(F.lit(1)).alias("n"))


def length_histogram(df: DataFrame, length_expr, by: str = "bucket") -> DataFrame:
    """log2-bucketed length histogram: (bucket, value=log2bin, n).

    log2 bins keep the category count ~40 for any content length range,
    so downstream KS cost is constant at any data scale.
    """
    bin_col = F.floor(F.log2(F.greatest(length_expr.cast("double"), F.lit(1.0)))).cast("string")
    return df.groupBy(by, bin_col.alias("value")).agg(F.count(F.lit(1)).alias("n"))


def histogram_cube(df: DataFrame, cat_col: str, length_expr, by: str = "bucket") -> DataFrame:
    """Joint (bucket, category, log2-length-bin) histogram in ONE pass.

    Both drift inputs (the categorical histogram and the length
    histogram) are marginals of this tiny cube (≤ buckets × categories
    × ~40 bins rows), so the raw table is scanned and shuffled exactly
    once per side instead of once per histogram. The two marginal
    aggregations read the same Exchange — Spark's ReuseExchange rule
    computes the cube subtree a single time within one job.
    """
    len_bin = F.floor(F.log2(F.greatest(length_expr.cast("double"), F.lit(1.0)))).cast("string")
    return df.groupBy(by, F.col(cat_col).alias("_cat"), len_bin.alias("_len_bin")).agg(
        F.count(F.lit(1)).alias("n")
    )


def cube_marginal(cube: DataFrame, which: str, by: str = "bucket") -> DataFrame:
    """(bucket, value, n) marginal of :func:`histogram_cube` — same shape
    as categorical_histogram / length_histogram output."""
    col = "_cat" if which == "cat" else "_len_bin"
    return cube.groupBy(by, F.col(col).alias("value")).agg(F.sum("n").alias("n"))


def _two_sample_chi2(obs: np.ndarray, ref: np.ndarray) -> tuple[float, int]:
    """Two-sample chi² homogeneity statistic over aligned category counts."""
    mask = (obs + ref) > 0
    obs, ref = obs[mask], ref[mask]
    n1, n2 = obs.sum(), ref.sum()
    if n1 == 0 or n2 == 0 or len(obs) < 2:
        return 0.0, max(len(obs) - 1, 1)
    k1 = math.sqrt(n2 / n1)
    k2 = math.sqrt(n1 / n2)
    stat = float(((k1 * obs - k2 * ref) ** 2 / (obs + ref)).sum())
    return stat, len(obs) - 1


def _ks_from_histograms(obs: np.ndarray, ref: np.ndarray) -> tuple[float, float, float]:
    """KS D-statistic between two binned samples + critical value."""
    n1, n2 = obs.sum(), ref.sum()
    if n1 == 0 or n2 == 0:
        return 0.0, float("inf"), 0.0
    d = float(np.abs(np.cumsum(obs) / n1 - np.cumsum(ref) / n2).max())
    return d, n1, n2


#: PSI zero-bin smoothing floor (industry convention: clamp empty-bin
#: proportions rather than drop the bin, so one-sided mass is penalized)
PSI_EPS = 1e-6


def _psi_from_histograms(obs: np.ndarray, ref: np.ndarray) -> float:
    """Population Stability Index over aligned category counts:
    Σ (p−q)·ln(p/q) with proportions floored at PSI_EPS."""
    n1, n2 = obs.sum(), ref.sum()
    if n1 == 0 or n2 == 0:
        return 0.0
    p = np.maximum(obs / n1, PSI_EPS)
    q = np.maximum(ref / n2, PSI_EPS)
    return float(((p - q) * np.log(p / q)).sum())


def _w1_from_histograms(obs: np.ndarray, ref: np.ndarray) -> float:
    """Wasserstein-1 (earth-mover) distance between two binned
    distributions with unit spacing between adjacent ordered bins:
    Σ |CDF_p − CDF_q| over the bins — mass-displacement in bin units.
    Counts cumulate BEFORE normalizing (cumsum(n)/N, not
    cumsum(n/N)) so the arithmetic matches a SQL windowed-sum
    replay bit-for-bit."""
    n1, n2 = obs.sum(), ref.sum()
    if n1 == 0 or n2 == 0:
        return 0.0
    return float(np.abs(np.cumsum(obs) / n1 - np.cumsum(ref) / n2).sum())


def drift_verdicts(
    per_bucket_hist: DataFrame,
    reference_hist: DataFrame | None = None,
    test: str = "chi2",
    alpha: float = 0.01,
    numeric_order: bool = False,
    psi_threshold: float = 0.2,
    w1_threshold: float = 0.25,
) -> DataFrame:
    """Per-bucket two-sample drift test (``test`` ∈ chi2 | ks | psi | w1).
    Output: (bucket, statistic, threshold, drifted).

    W1 complements KS (max CDF gap) with total mass displacement —
    sensitive to broad small shifts KS under-weights; like PSI it has
    no sampling distribution, so ``w1_threshold`` is a bin-units
    rule-of-thumb (0.25 = a quarter-bin of displaced mass). Only
    meaningful with ordered bins (``numeric_order=True`` or naturally
    ordered values).

    PSI has no sampling distribution; its threshold is the standard
    rule-of-thumb scale (0.1 watch, 0.2 act) via ``psi_threshold``.

    Input histograms are (bucket, value, n). With ``reference_hist``
    (the baseline snapshot's per-bucket histogram — the normal mode:
    buckets are repo-hashed, so their lang mixes legitimately differ
    *across* buckets; drift is bucket-now vs bucket-at-baseline), each
    bucket is tested against its own reference row set. Without it,
    falls back to bucket-vs-rest-of-table (cross-sectional anomaly
    mode — expect false positives on naturally heterogeneous buckets).

    The histogram alignment runs in Spark; only O(categories) test math
    per bucket runs in pandas.
    """
    if reference_hist is not None:
        obs = per_bucket_hist.select("bucket", "value", F.col("n").alias("n_obs"))
        ref = reference_hist.select("bucket", "value", F.col("n").alias("n_ref"))
        joined = (
            obs.join(ref, ["bucket", "value"], "full_outer")
            .select(
                "bucket",
                "value",
                F.coalesce("n_obs", F.lit(0)).alias("n"),
                F.coalesce("n_ref", F.lit(0)).alias("n_reference"),
            )
        )
    else:
        # Full-domain alignment: a category entirely absent from a bucket
        # must appear as an obs=0 row (ref = total mass), or PSI/W1/KS
        # silently ignore exactly the one-sided-mass case they exist to
        # penalize. The (buckets × global values) grid is histogram-sized
        # (tiny at any input scale), so the crossJoin is broadcast-cheap.
        totals = per_bucket_hist.groupBy("value").agg(F.sum("n").alias("n_total"))
        grid = per_bucket_hist.select("bucket").distinct().crossJoin(F.broadcast(totals))
        joined = grid.join(per_bucket_hist, ["bucket", "value"], "left").select(
            "bucket",
            "value",
            F.coalesce("n", F.lit(0)).alias("n"),
            (F.col("n_total") - F.coalesce("n", F.lit(0))).alias("n_reference"),
        )

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if numeric_order:
            pdf = pdf.sort_values("value", key=lambda s: s.astype(float))
        else:
            pdf = pdf.sort_values("value")
        obs = pdf["n"].to_numpy(dtype=np.float64)
        ref = pdf["n_reference"].to_numpy(dtype=np.float64)
        bucket = int(pdf["bucket"].iloc[0])
        if test == "chi2":
            stat, dof = _two_sample_chi2(obs, ref)
            thr = chi2_critical(dof, alpha)
        elif test == "ks":
            d, n1, n2 = _ks_from_histograms(obs, ref)
            stat = d
            thr = (
                _KS_C.get(alpha, 1.358) * math.sqrt((n1 + n2) / (n1 * n2))
                if n1 > 0 and n2 > 0
                else float("inf")
            )
        elif test == "psi":
            stat = _psi_from_histograms(obs, ref)
            thr = psi_threshold
        elif test == "w1":
            stat = _w1_from_histograms(obs, ref)
            thr = w1_threshold
        else:
            raise ValueError(f"unknown test {test}")
        return pd.DataFrame(
            {"bucket": [bucket], "statistic": [stat], "threshold": [thr], "drifted": [stat > thr]}
        )

    return joined.groupBy("bucket").applyInPandas(
        per_bucket, schema="bucket int, statistic double, threshold double, drifted boolean"
    )
