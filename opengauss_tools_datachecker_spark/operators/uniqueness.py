"""Uniqueness check via salted two-phase groupBy-count (N2).

Fixes the reference comparer's multiset blindness (SURVEY.md §1.4: its
FULL JOIN on checksum equality cannot see 2-vs-1 duplicate counts,
/root/reference src/main/java/com/gauss/common/db/sql/OpenGaussUtil.java:118-122).

Skew design (the north_rule's named hard requirement): a hot repo with
10^8 files makes ``groupBy(repo,path,commit)`` keys *individually* tiny
(the composite key is near-unique), but real deployments group by
prefixes too, and a pathological input can repeat one key millions of
times. The salt splits any single key's rows across ``salt_buckets``
reducers in phase 1 (map-side partial agg further combines within each
task), then phase 2 merges per-key partial counts — at most
``salt_buckets`` rows per key regardless of input skew. No single task
ever holds a hot key's full row set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key_cols: list[str], salt_buckets: int = 64) -> DataFrame:
    """Keys appearing more than once, with their total counts.

    Output: ``key_cols + (n_rows bigint)``, filtered to n_rows > 1.
    """
    # Salt must differ across physically distinct rows with identical keys:
    # monotonically_increasing_id is partition-local-unique, which is all a
    # decomposable count needs (sum of partials is exact).
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)))
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    totals = partial.groupBy(*key_cols).agg(F.sum("_partial").alias("n_rows"))
    return totals.filter(F.col("n_rows") > 1)
