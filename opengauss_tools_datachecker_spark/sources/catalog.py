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


#: Per-dialect default fetch hints, mirroring the reference's statement
#: tuning: MySQL row-streams with setFetchSize(Integer.MIN_VALUE)
#: (DbOnceFullRecordExtractor.java:124), openGauss/Postgres use the
#: driver default 0 (DbOnceFullRecordExtractor.java:157), Oracle pages
#: at 200 rows (DbOnceFullRecordExtractor.java:191).
JDBC_DIALECT_FETCH = {
    "mysql": -2147483648,  # Integer.MIN_VALUE — Connector/J streaming mode
    "postgresql": 10_000,  # 0 would buffer ALL rows in the PG driver; page instead
    "opengauss": 10_000,
    "oracle": 200,
}


def jdbc_reader_options(
    url: str,
    table: str | None = None,
    query: str | None = None,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    fetch_size: int | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    session_init: str | None = None,
) -> dict[str, str]:
    """Build the DataFrameReader option map for a JDBC source (S1-S3).

    Maps the reference's extractor hints onto Spark's JDBC source:
    the per-dialect fetch sizes above (statement tuning in
    DbOnceFullRecordExtractor.java:109-208), ``SET NAMES utf8``-style
    connection setup (MysqlContinueExtractor, DbOnceFullRecordExtractor
    .java:117) as ``sessionInitStatement``, and — replacing the
    reference's single-threaded row queue entirely — Spark's partitioned
    parallel scan via partitionColumn/lowerBound/upperBound/
    numPartitions (each executor reads its own key range; this is the
    batch-drain S4 substitute at cluster scale).

    Exactly one of ``table``/``query`` is required. ``fetch_size``
    defaults from the url's dialect prefix (jdbc:<dialect>:...).
    """
    if (table is None) == (query is None):
        raise ValueError("exactly one of table= or query= is required")
    if not url.startswith("jdbc:"):
        raise ValueError(f"not a jdbc url: {url!r}")
    opts: dict[str, str] = {"url": url}
    if table is not None:
        opts["dbtable"] = table
    else:
        opts["query"] = query  # type: ignore[assignment]
    if fetch_size is None:
        dialect = url.split(":", 2)[1].lower()
        fetch_size = JDBC_DIALECT_FETCH.get(dialect, 10_000)
    opts["fetchsize"] = str(fetch_size)
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if driver is not None:
        opts["driver"] = driver
    if session_init is not None:
        opts["sessionInitStatement"] = session_init
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and num_partitions"
            )
        opts["partitionColumn"] = partition_column
        opts["lowerBound"] = str(lower_bound)
        opts["upperBound"] = str(upper_bound)
        opts["numPartitions"] = str(num_partitions)
    return opts


def read_table(
    spark: SparkSession,
    location: str | None = None,
    fmt: str = "parquet",
    jdbc_options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a source table; Iceberg when its runtime is on the classpath.

    ``fmt='jdbc'`` takes ``jdbc_options`` from :func:`jdbc_reader_options`
    (or a raw option dict). Option construction and validation are
    unit-tested without a database (no DB ships in this image); the
    terminal ``load()`` opens a connection for schema inference, so
    tests intercept it and assert the options it would carry.
    Parquet is the tested default path in this image.
    """
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").load(location)
        except Exception as exc:  # pragma: no cover - no iceberg jar in image
            raise RuntimeError(
                "Iceberg runtime not on classpath; use fmt='parquet' or add "
                "org.apache.iceberg:iceberg-spark-runtime to spark.jars.packages"
            ) from exc
    if fmt == "jdbc":
        if not jdbc_options:
            if location is None:
                raise ValueError("fmt='jdbc' requires jdbc_options (or a jdbc url + table)")
            raise ValueError(
                "fmt='jdbc' requires jdbc_options — build them with "
                "jdbc_reader_options(url=..., table=...)"
            )
        if "url" not in jdbc_options or not (
            "dbtable" in jdbc_options or "query" in jdbc_options
        ):
            raise ValueError("jdbc_options must carry url and dbtable/query")
        return spark.read.format("jdbc").options(**jdbc_options).load()
    return spark.read.format(fmt).load(location)


def list_parquet_tables(spark: SparkSession, directory: str) -> list[str]:
    """Catalog-scan analog for a directory of <table>.parquet files."""
    import os

    return sorted(
        f[: -len(".parquet")] for f in os.listdir(directory) if f.endswith(".parquet")
    )
