"""Checksum comparison operators — the reference's entire query algebra.

The reference's 4-stage pipeline (Preparer → Extractor → Applier →
Comparer; /root/reference src/main/java/com/gauss/controller/
GaussInstance.java:96-199) collapses to two lazy DataFrames and one
join. Operators here:

- ``checksum_table``   — P1 row-checksum projection (MysqlUtil.java:71-79)
- ``symmetric_diff``   — J1 full outer join + F1 XOR-null filter
  (OpenGaussUtil.java:118-122)
- ``multiset_diff``    — J1 fixed for duplicate-blindness (SURVEY.md §1.4):
  exact multiset equality via groupBy-count on each side
- ``recover_rows``     — J2/F2 reverse row lookup: the reference batches
  digests into ``WHERE md5(...) IN (...)`` lists capped at 9999
  (GaussRecordComparer.java:38,121-140); in Spark it is one broadcast
  semi-join with no size limits and no second round-trip.

Scale notes (100 TB / 10^12 rows): the checksum projection is a pure
map (whole-stage codegen, no shuffle). The diff joins shuffle on the
digest, which is uniformly distributed by construction (it's a hash) —
no skew possible, AQE coalesces post-shuffle partitions. The missing
set is typically tiny → Spark's AQE converts the recover_rows semi-join
to broadcast automatically; we hint it explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.functions.canon import canon_column, row_checksum


def checksum_table(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str] | None = None,
    algo: str = "sha256",
    out: str = "checksum",
) -> DataFrame:
    """Project ``key_cols + digest(value_cols)`` — the Extractor/Preparer SQL.

    Unlike the reference, keys ride along with the digest so violation
    rows need no reverse lookup (SURVEY.md §3.3 Spark mapping).
    """
    value_cols = value_cols or [c for c in df.columns if c not in key_cols]
    return df.select(*key_cols, row_checksum(df, cols=value_cols, algo=algo, out=out))


def symmetric_diff(source: DataFrame, target: DataFrame, on: str = "checksum") -> DataFrame:
    """Rows present on exactly one side — reference-exact semantics.

    ``FULL JOIN ... WHERE (a IS NULL) XOR (b IS NULL)``
    (OpenGaussUtil.java:118-122). Output: ``on`` + ``side`` ∈
    {'source_only','target_only'}. Inherits the reference's
    duplicate-blindness by design; use :func:`multiset_diff` for exact
    multiset equality.
    """
    a = source.select(F.col(on).alias("checksum_a")).groupBy("checksum_a").count().drop("count")
    b = target.select(F.col(on).alias("checksum_b")).groupBy("checksum_b").count().drop("count")
    joined = a.join(b, a["checksum_a"] == b["checksum_b"], "full_outer")
    return joined.filter(F.col("checksum_a").isNull() != F.col("checksum_b").isNull()).select(
        F.coalesce("checksum_a", "checksum_b").alias(on),
        F.when(F.col("checksum_b").isNull(), F.lit("source_only"))
        .otherwise(F.lit("target_only"))
        .alias("side"),
    )


def multiset_diff(source: DataFrame, target: DataFrame, on: str = "checksum") -> DataFrame:
    """Exact multiset difference: digests whose per-side counts differ.

    Strict improvement over the reference (SURVEY.md §1.4): a row
    duplicated 2× in source and 1× in target joins cleanly in the
    reference's FULL JOIN and goes undetected; here the counts 2≠1 flag
    it. Map-side partial aggregation makes each groupBy one shuffle of
    pre-combined digests.
    """
    a = source.groupBy(on).agg(F.count("*").alias("n_source"))
    b = target.groupBy(on).agg(F.count("*").alias("n_target"))
    joined = a.join(b, on, "full_outer")
    return (
        joined.select(
            on,
            F.coalesce("n_source", F.lit(0)).alias("n_source"),
            F.coalesce("n_target", F.lit(0)).alias("n_target"),
        )
        .filter(F.col("n_source") != F.col("n_target"))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Key-level change classification between two snapshots:
    ``key_cols + change`` with change ∈ {'added','removed','modified'}.

    The incremental-validation primitive: against an Iceberg table pair
    (previous validated snapshot, current), the 'added'+'modified' set
    is exactly what the next check run must re-verify — unchanged keys
    keep their checkpointed verdicts. The reference re-extracts both
    databases in full every run (GaussInstance.java full-table
    extractors); a key-classified diff is what makes 10^12-row
    revalidation affordable.

    Plan shape: each side collapses to (keys, digest) in the scan
    (narrow projection, pure map), then ONE full-outer shuffle on the
    key columns classifies everything. No payload bytes move: the
    digest stands in for the values.
    """
    a = checksum_table(old, key_cols, value_cols, out="_digest_old")
    b = checksum_table(new, key_cols, value_cols, out="_digest_new")
    joined = a.join(b, key_cols, "full_outer")
    changed = joined.filter(
        F.col("_digest_old").isNull()
        | F.col("_digest_new").isNull()
        | (F.col("_digest_old") != F.col("_digest_new"))
    )
    return changed.select(
        *key_cols,
        F.when(F.col("_digest_old").isNull(), F.lit("added"))
        .when(F.col("_digest_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("modified"))
        .alias("change"),
    )


def column_diff(
    source: DataFrame,
    target: DataFrame,
    key_cols: list[str],
    value_cols: list[str] | None = None,
    dialect: str = "spark",
) -> DataFrame:
    """Localize WHICH columns differ for keys present on both sides.

    The reference stops at recovering whole mismatched rows
    (GaussRecordComparer.java:121-140) and leaves the user to eyeball
    the column; this emits ``key_cols + (column_name, source_value,
    target_value)``, one row per differing column, values rendered
    through the same canon matrix the digests use
    (functions/canon.canon_column) — so a column "differs" exactly
    when it changes the row digest, never more, never less. Keys
    present on only one side are :func:`snapshot_diff`'s domain
    (added/removed); this operator classifies the 'modified' set.

    Plan shape (100 TB): each side is a narrow map-side projection of
    keys + canon strings, ONE inner shuffle join on the keys
    (storage-partitioned/shuffle-free when both sides are bucketed by
    the key, sources/layout.py), a codegen any-differs filter drops
    the equal rows, and only then does ``stack`` unpivot — the
    explode runs on O(mismatched rows), not O(table).
    """
    value_cols = value_cols or [
        c for c in source.columns if c not in key_cols and c in set(target.columns)
    ]
    src_types = {f.name: f.dataType for f in source.schema.fields}
    tgt_types = {f.name: f.dataType for f in target.schema.fields}
    a = source.select(
        *key_cols,
        *[
            canon_column(c, src_types[c], dialect=dialect).alias(f"_a_{c}")
            for c in value_cols
        ],
    )
    b = target.select(
        *key_cols,
        *[
            canon_column(c, tgt_types[c], dialect=dialect).alias(f"_b_{c}")
            for c in value_cols
        ],
    )
    joined = a.join(b, key_cols, "inner")
    any_differs = None
    for c in value_cols:
        d = ~F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))
        any_differs = d if any_differs is None else (any_differs | d)
    stack_args = ", ".join(
        f"'{c}', `_a_{c}`, `_b_{c}`" for c in value_cols
    )
    unpivot = F.expr(
        f"stack({len(value_cols)}, {stack_args}) AS "
        "(column_name, source_value, target_value)"
    )
    return (
        joined.filter(any_differs)
        .select(*key_cols, unpivot)
        .filter(~F.col("source_value").eqNullSafe(F.col("target_value")))
    )


def recover_rows(
    original: DataFrame,
    missing: DataFrame,
    on: str = "checksum",
    digest_col: str = "checksum",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Fetch full original rows whose digest is in the missing set (J2).

    The reference re-queries the source DB with chunked IN-lists
    (OracleUtil.java:121-139 chunks at 999); here it's one broadcast
    semi-join — the missing set is small by definition (violations).
    ``value_cols`` must match the columns the digests were computed
    over (same contract as :func:`checksum_table`).
    """
    digests = missing.select(F.col(on).alias(digest_col)).distinct()
    with_digest = original if digest_col in original.columns else original.withColumn(
        digest_col, row_checksum(original, cols=value_cols)
    )
    return with_digest.join(F.broadcast(digests), digest_col, "left_semi").drop(digest_col)
