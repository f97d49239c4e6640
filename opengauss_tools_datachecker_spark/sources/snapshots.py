"""Snapshot metadata registry — the Iceberg `.snapshots` analog.

BASELINE.json's production target is Iceberg, whose metadata tables
(`<t>.snapshots`, `<t>.partitions`) let a planner reason about change
WITHOUT scanning data. That runtime jar is not in this image, so this
module provides the same capability over plain parquet with identical
call shape: each validated snapshot records one metadata row per
bucket — exact row count plus an order-independent content signature
(bit_xor of xxhash64(keys ‖ content digest), the same signature family
the sha256 rule's Merkle fast path uses) — and incremental planning
then diffs SIGNATURES, not data.

Scale shape: recording is one map-side-combined aggregation over the
snapshot being validated (output = n_buckets rows); `changed_buckets`
joins two n_buckets-row metadata frames. At 10^12 rows, finding the
dirty buckets between yesterday's snapshot and today's costs two
metadata reads instead of two table scans — `runner.check_incremental`
scans data only inside the buckets this diff names.

Registry layout: a parquet directory, appended per snapshot:
(snapshot_id, bucket, n_rows, sig, recorded_at).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.fixtures import KEY_COLS, bucket_of


def bucket_signatures(
    files: DataFrame, n_buckets: int, content_col: str = "content"
) -> DataFrame:
    """(bucket, n_rows, sig) for one snapshot — one combined agg pass.

    ``sig`` is order- and partitioning-independent (bit_xor is
    commutative/associative), so two snapshots with identical rows
    produce identical signatures regardless of how either was written.
    """
    bucket = (
        F.col("bucket") if "bucket" in files.columns else bucket_of("repo", n_buckets)
    )
    return (
        files.select(
            bucket.alias("bucket"),
            F.xxhash64(*KEY_COLS, F.sha2(F.col(content_col), 256)).alias("_h"),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.bit_xor("_h").alias("sig"))
    )


def record_snapshot(
    files: DataFrame,
    registry_path: str,
    snapshot_id: str,
    n_buckets: int,
    content_col: str = "content",
) -> None:
    """Append one snapshot's bucket metadata to the registry."""
    sigs = bucket_signatures(files, n_buckets, content_col)
    (
        sigs.select(
            F.lit(snapshot_id).alias("snapshot_id"),
            "bucket",
            "n_rows",
            "sig",
            F.lit(int(time.time() * 1000)).alias("recorded_at"),
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(registry_path)
    )


def snapshots(spark: SparkSession, registry_path: str) -> DataFrame:
    """The `.snapshots`-style metadata frame: one summary row per
    snapshot (id, total rows, bucket count, recorded_at)."""
    reg = spark.read.parquet(registry_path)
    return reg.groupBy("snapshot_id").agg(
        F.sum("n_rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("recorded_at").alias("recorded_at"),
    )


def changed_buckets(
    spark: SparkSession, registry_path: str, old_id: str, new_id: str
) -> DataFrame:
    """Buckets whose content differs between two recorded snapshots —
    (bucket, change) with change ∈ {'added','removed','modified'} —
    from metadata alone (no data scan).

    The planning primitive for `check_incremental`: clean buckets keep
    their carried verdicts; only the buckets named here are rescanned.
    """
    reg = spark.read.parquet(registry_path)
    a = reg.filter(F.col("snapshot_id") == old_id).select(
        "bucket", F.col("n_rows").alias("n_a"), F.col("sig").alias("sig_a")
    )
    b = reg.filter(F.col("snapshot_id") == new_id).select(
        "bucket", F.col("n_rows").alias("n_b"), F.col("sig").alias("sig_b")
    )
    j = a.join(b, "bucket", "full_outer")
    return j.filter(
        F.col("sig_a").isNull()
        | F.col("sig_b").isNull()
        | (F.col("sig_a") != F.col("sig_b"))
        | (F.col("n_a") != F.col("n_b"))
    ).select(
        "bucket",
        F.when(F.col("sig_a").isNull(), F.lit("added"))
        .when(F.col("sig_b").isNull(), F.lit("removed"))
        .otherwise(F.lit("modified"))
        .alias("change"),
    )
