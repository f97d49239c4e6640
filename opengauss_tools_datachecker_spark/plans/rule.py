"""Rule protocol, violation schema, per-partition verdicts.

Standardizes the reference's two outputs — per-row diffs (check.log,
/root/reference src/main/java/com/gauss/common/audit/RecordDiffer.java:36-60)
and per-table pass/fail (summary.log, src/main/java/com/gauss/common/
utils/GaussUtils.java:174-180) — as two DataFrames:

- violations: ``(rule_id, bucket, key, observed, expected)``
  (BASELINE.json north_star shape; a strict superset of the
  reference's RecordDiffer row)
- verdicts:   ``(bucket, rule_id, status PASS|FAIL, n_violations)``
  at partition granularity instead of table granularity.

Rules are executed over ALL pending buckets in one Spark job each —
resume granularity is the bucket, execution is vectorized across
buckets (one job per rule, never one job per bucket).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VIOLATION_COLS = ["rule_id", "bucket", "key", "observed", "expected"]


@dataclass
class CheckContext:
    """Everything a rule needs — the Spark analog of GaussContext
    (/root/reference src/main/java/com/gauss/common/model/GaussContext.java:23-39)."""

    spark: SparkSession
    files: DataFrame                     # input table (repo,path,commit,lang,content[,bucket])
    manifest: DataFrame | None = None    # (repo,path,commit,expected_sha256)
    commits: DataFrame | None = None     # parent (repo,commit)
    baseline: DataFrame | None = None    # reference snapshot (files-shaped) for drift
    baseline_cube: DataFrame | None = None  # precomputed drift histogram cube
    #   (operators.drift.histogram_cube of the baseline snapshot). At
    #   100 TB the baseline is NEVER rescanned per run — its tiny
    #   (bucket, lang, len-bin, n) cube is computed once when the
    #   baseline is blessed and checkpointed next to the control table.
    expected_schema: object | None = None  # StructType or DDL string the
    #   input table must match (schema rule); None disables the rule.
    raw_schema: object | None = None       # schema of the ORIGINAL input,
    #   recorded by the runner before the narrow shared projection —
    #   the schema rule validates this, not the projection's.
    n_buckets: int = 32
    run_id: str = "run0"
    params: dict = field(default_factory=dict)

    def files_with_bucket(self) -> DataFrame:
        # A pre-existing bucket column is trusted and MUST have been
        # computed with this context's n_buckets — mismatched bucket
        # spaces silently misattribute verdicts (drop the column to
        # re-bucket instead).
        if "bucket" in self.files.columns:
            return self.files
        from opengauss_tools_datachecker_spark.fixtures import bucket_of

        return self.files.withColumn("bucket", bucket_of("repo", self.n_buckets))


def prepare_files(
    files: DataFrame,
    n_buckets: int,
    with_digest: bool = True,
    secret_scan: bool = False,
) -> DataFrame:
    """Narrow pre-projection shared by the whole rule suite.

    ``content`` is by far the widest column; every rule needs only its
    digest and/or length. Projecting once means the suite scans content
    bytes exactly ONCE (sha256 + length in the same pass), the shared
    cache holds ~keys instead of full text, and every downstream
    shuffle carries fixed-width columns. At 10^12 rows this is the
    difference between re-reading the 100 TB column per rule and
    reading it once.
    """
    if "bucket" not in files.columns:
        from opengauss_tools_datachecker_spark.fixtures import bucket_of

        files = files.withColumn("bucket", bucket_of("repo", n_buckets))
    cols = [
        "repo",
        "path",
        "commit",
        # lang is optional input (its absence is a schema-rule finding,
        # not a crash during plan construction)
        *(["lang"] if "lang" in files.columns else []),
        "bucket",
        # 64-bit key hash computed once in the same scan: uniqueness
        # groups on it, the Merkle sub-bucket split derives from it —
        # downstream shuffles carry 8-byte longs instead of ~100-byte
        # composite string keys.
        F.xxhash64("repo", "path", "commit").alias("key_hash"),
        F.length("content").alias("content_len"),
    ]
    if with_digest:
        cols.append(F.sha2(F.col("content"), 256).alias("content_sha256"))
    if secret_scan:
        # secrets policy enabled: count credential patterns in the SAME
        # single content pass (the bytes are already in cache for the
        # digest — four more codegen regexes, zero extra I/O), so the
        # narrow projection can still drop the content column
        from opengauss_tools_datachecker_spark.functions.text import secret_counts

        cols.extend(secret_counts("content"))
    return files.select(*cols)


class Rule(Protocol):
    rule_id: str
    version: str

    def check(self, ctx: CheckContext) -> DataFrame:
        """Return a violations DataFrame with VIOLATION_COLS."""
        ...


def key_expr(*cols: str):
    """Render a composite key as one string — the violation 'key' field."""
    return F.concat_ws("|", *[F.col(c) for c in cols])


def empty_violations(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [], "rule_id string, bucket int, key string, observed string, expected string"
    )


def verdicts_from_violations(
    violations: DataFrame, ctx: CheckContext, rule_ids: list[str]
) -> DataFrame:
    """(bucket, rule_id) → PASS/FAIL + violation count.

    Dense matrix: every (bucket, rule) pair appears, PASS when no
    violation landed there — the analog of the reference printing every
    table into summary.log whether or not it failed.
    """
    buckets = ctx.spark.range(ctx.n_buckets).select(F.col("id").cast("int").alias("bucket"))
    rules = ctx.spark.createDataFrame([(r,) for r in rule_ids], "rule_id string")
    matrix = buckets.crossJoin(rules)
    counts = violations.groupBy("bucket", "rule_id").agg(F.count("*").alias("n_violations"))
    return (
        matrix.join(counts, ["bucket", "rule_id"], "left")
        .select(
            "bucket",
            "rule_id",
            F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
            F.when(F.coalesce("n_violations", F.lit(0)) > 0, F.lit("FAIL"))
            .otherwise(F.lit("PASS"))
            .alias("status"),
        )
    )
