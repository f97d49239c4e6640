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
    """9-char hex threshold: prefix < bound ⇔ row sampled at ``rate``."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sampling rate must be in [0,1], got {rate}")
    return f"{min(int(round(rate * _PREFIX_SPACE)), _PREFIX_SPACE):09x}"


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
