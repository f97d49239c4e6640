"""Catalog scan + table selection + source readers (S1-S3, S9, F3).

The reference discovers tables from information_schema/USER_TABLES and
filters them with SQL-LIKE white/black lists compiled to regex
(/root/reference src/main/java/com/gauss/common/db/meta/
TableMetaGenerator.java:100-181; src/main/java/com/gauss/controller/
GaussController.java:327-397; src/main/java/com/gauss/common/utils/
LikeUtil.java:47-113). Its JDBC row-streaming extractors (S1-S3,
DbOnceFullRecordExtractor.java:109-208) are replaced by Spark's lazy
partitioned scans — no queue, no micro-batches.

Iceberg is the production format (BASELINE.json); its runtime jar is
not in this image, so the Iceberg path is gated and parquet is the
tested fallback with identical call shape.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def like_to_regex(pattern: str) -> re.Pattern:
    """SQL-LIKE wildcards (%, _) → case-insensitive regex (LikeUtil analog)."""
    out = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern) and pattern[i + 1] in "%_":
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
        i += 1
    return re.compile("^" + "".join(out) + "$", re.IGNORECASE)


def filter_tables(
    tables: list[str],
    whitelist: list[str] | None = None,
    blacklist: list[str] | None = None,
) -> list[str]:
    """White/black-list selection with LIKE semantics (GaussController:327-397).

    Whitelist empty/None → all tables pass; blacklist wins over whitelist.
    """
    white = [like_to_regex(p) for p in (whitelist or [])]
    black = [like_to_regex(p) for p in (blacklist or [])]
    selected = []
    for t in tables:
        if white and not any(rx.match(t) for rx in white):
            continue
        if any(rx.match(t) for rx in black):
            continue
        selected.append(t)
    return selected


def read_table(spark: SparkSession, location: str, fmt: str = "parquet") -> DataFrame:
    """Read a source table; Iceberg when its runtime is on the classpath.

    The JDBC analog of the reference's extractors is spark.read.jdbc —
    supported but untestable in this image (no databases); parquet is
    the tested path.
    """
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").load(location)
        except Exception as exc:  # pragma: no cover - no iceberg jar in image
            raise RuntimeError(
                "Iceberg runtime not on classpath; use fmt='parquet' or add "
                "org.apache.iceberg:iceberg-spark-runtime to spark.jars.packages"
            ) from exc
    if fmt == "jdbc":  # pragma: no cover - no databases in image
        raise NotImplementedError(
            "JDBC source: spark.read.format('jdbc').options(url=..., dbtable=...).load(); "
            "gated off — no database available in this environment"
        )
    return spark.read.format(fmt).load(location)


def list_parquet_tables(spark: SparkSession, directory: str) -> list[str]:
    """Catalog-scan analog for a directory of <table>.parquet files."""
    import os

    return sorted(
        f[: -len(".parquet")] for f in os.listdir(directory) if f.endswith(".parquet")
    )
