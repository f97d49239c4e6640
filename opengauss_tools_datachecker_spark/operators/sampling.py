"""Deterministic hash-based sampling (uniform and stratified).

``df.sample()`` is seed + partitioning dependent: repartition the input
and the sample changes, which makes audits unreproducible. These
operators sample by content-hash of a stable id — a row is in or out of
the sample forever, on any engine (DuckDB's md5 matches), at any
parallelism, under corpus growth. That is the property a validation
pipeline needs: re-checking "the 1% audit sample" next week must read
the SAME rows.

Shares the md5-prefix space of :mod:`.contamination` (first 8 hex chars
= uniform 32-bit value; lexicographic compare on fixed-width hex ==
numeric compare). Everything is a pure map — whole-stage codegen, no
shuffle, no state; at 10^12 rows the sample predicate rides the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.operators.contamination import _PREFIX_SPACE


def rate_bound(rate: float) -> str:
    """9-char hex threshold: prefix < bound ⇔ row sampled at ``rate``.

    FLOOR of rate·2^32, the one convention across the shared hash
    space: :func:`mixture_sample` floors its derived per-source rates
    (Spark-side F.floor) and the contamination splits truncate their
    cumulative bounds — floor is also the monotone choice (a nominally
    smaller rate can never keep more rows). The DuckDB oracles import
    this helper, so both engines move together by construction."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sampling rate must be in [0,1], got {rate}")
    return f"{min(int(rate * _PREFIX_SPACE), _PREFIX_SPACE):09x}"


def hash_prefix(id_col: str | Column, salt: str = "") -> Column:
    """md5(salt || id)'s first 8 hex chars, zero-padded to 9 so a full-
    space bound ('100000000') still compares correctly."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.lpad(F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8), 9, "0")


def hash_sample(df: DataFrame, id_col: str, rate: float, salt: str = "sample") -> DataFrame:
    """Uniform deterministic sample: keep rows whose hash prefix falls
    in the first ``rate`` of the space. Different ``salt`` values draw
    independent samples from the same ids."""
    return df.filter(hash_prefix(id_col, salt) < F.lit(rate_bound(rate)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling — e.g. downsample the dominant
    language while keeping all of a rare one (the standard corpus
    rebalancing move). ``rates`` maps stratum value → keep rate; strata
    not listed fall back to ``default_rate``.

    The per-stratum bound is a broadcast-free literal CASE chain (the
    rates dict is config-sized), compared against one shared hash —
    still a pure map over the scan.
    """
    prefix = hash_prefix(id_col, salt)
    bound = F.lit(rate_bound(default_rate))
    for value, rate in rates.items():
        bound = F.when(F.col(stratum_col) == F.lit(value), F.lit(rate_bound(rate))).otherwise(
            bound
        )
    return df.filter(prefix < bound)

def mixture_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    weight_col: str,
    targets: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "mixture",
) -> DataFrame:
    """Token-budget mixture sampling: downsample each stratum to a
    TARGET WEIGHT BUDGET (e.g. lang -> target token count) rather than
    a fixed rate — the standard corpus-mixing move when assembling a
    training set to a prescribed language/source distribution. The
    per-stratum keep rate is ``min(1, target / available)`` where
    ``available = sum(weight_col)`` over the stratum, so the SAME call
    yields the right mixture as the corpus grows; strata without a
    target keep ``default_rate``.

    Scale shape (10^12 rows): one map-side-combined groupBy down to
    |strata| rows (languages/sources — config-sized), then an unforced
    equi-join back (AQE runtime-broadcasts the tiny rates frame; no
    static hint, per the measured round-4 finding that forced hints
    pin join order before true sizes are known) and a pure-map hash
    compare. Rows keep/drop by ``md5(salt || id)`` prefix against the
    computed per-stratum bound, so membership is reproducible across
    engines, partitionings and corpus growth — and because the hash is
    shared with :func:`hash_sample`'s space, a row kept at rate r stays
    kept at any rate >= r (nested samples).

    Weight sums stay integral (no FP accumulation-order divergence)
    when ``weight_col`` is integer — the rate division is then a single
    IEEE op identical on any engine, which is what makes the DuckDB
    oracle twin byte-exact. Output: the input columns plus ``mix_rate``
    (the applied keep rate). NULL strata match null-safely and fall to
    ``default_rate``.
    """
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    for value, budget in targets.items():
        if budget < 0:
            raise ValueError(f"target for {value!r} must be >= 0, got {budget}")
    avail = df.groupBy(stratum_col).agg(F.sum(weight_col).alias("_avail"))
    tgt = F.lit(None).cast("double")
    for value, budget in targets.items():
        tgt = F.when(F.col(stratum_col) == F.lit(value), F.lit(float(budget))).otherwise(tgt)
    # the lower clamp guards a negative weight sum: an unclamped negative
    # rate would format as 16-char two's-complement hex whose lpad
    # truncation compares ABOVE every prefix — silently keeping all rows
    rate = F.when(tgt.isNull(), F.lit(float(default_rate))).otherwise(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), tgt / F.col("_avail").cast("double")))
    )
    bound = F.lpad(
        F.format_string("%x", F.floor(F.col("mix_rate") * F.lit(float(_PREFIX_SPACE)))),
        9,
        "0",
    )
    rates = avail.select(
        F.col(stratum_col).alias("_stratum"), rate.alias("mix_rate")
    ).select("_stratum", "mix_rate", bound.alias("_bound"))
    joined = df.join(rates, df[stratum_col].eqNullSafe(F.col("_stratum")), "inner")
    return joined.filter(hash_prefix(id_col, salt) < F.col("_bound")).drop("_stratum", "_bound")


def quantile_gate(
    df: DataFrame,
    score_col: str | Column,
    by: list[str],
    keep_top: float,
    approx: bool = False,
    round_to: int | None = None,
) -> DataFrame:
    """Keep the top ``keep_top`` fraction of rows per group by score —
    "top 30% quality per language", the rank-based corpus filter that a
    fixed global threshold can't express (a score that is excellent for
    one language may be mediocre for another).

    NOT a per-group window ranking: a global sort/rank per group is one
    task per group at scale (the exact footgun :mod:`.packing`
    documents). Instead the group's ``1 - keep_top`` percentile is
    aggregated down to |groups| rows and joined back (unforced — AQE
    broadcasts the tiny threshold frame), so the filter is a pure map
    over the second scan. With ``approx=False`` Spark's exact
    ``percentile`` buffers each group's values in the agg state —
    fine for config-sized groups-by-score audits and for oracle parity
    (DuckDB ``quantile_cont`` interpolates identically); at 10^12 rows
    pass ``approx=True`` (t-digest sketch, single pass, bounded state).

    Ties at the threshold all pass (``>=``), so the kept fraction can
    exceed ``keep_top`` on discrete scores. Rows whose group key is
    NULL drop out (inner equi-join). ``round_to`` rounds the threshold
    to a fixed decimal grid before comparing: interpolated percentiles
    are ulp-sensitive to the engine's fold order (``a + (b-a)*g`` vs
    ``(1-g)*a + g*b``), and pinning the decision boundary makes the
    keep set reproducible across engines — the audit property
    everything in this module exists for. Output: input columns plus
    ``gate_thr`` (the applied, post-rounding threshold).
    """
    if not 0.0 < keep_top <= 1.0:
        raise ValueError(f"keep_top must be in (0,1], got {keep_top}")
    v = (F.col(score_col) if isinstance(score_col, str) else score_col).cast("double")
    pct = F.approx_percentile if approx else F.percentile
    t = pct(v, F.lit(1.0 - keep_top))
    if round_to is not None:
        t = F.round(t, round_to)
    thr = df.groupBy(*by).agg(t.alias("gate_thr"))
    return df.join(thr, by).filter(v >= F.col("gate_thr"))
