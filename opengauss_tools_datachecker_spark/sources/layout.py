"""Bucketed storage layout — shuffle-free comparison joins at scale.

The reference leans on the target database's own storage to make its
FULL JOIN cheap (unlogged scratch tables + query_dop, /root/reference
src/main/java/com/gauss/preparer/GaussRecordPreparer.java:115-122,
src/main/java/com/gauss/controller/GaussController.java:108-111). The
Spark analog is layout co-location: when the files table and the
manifest are both written bucketed by the comparison key, the sha256
full-outer join (and the uniqueness groupBy) read pre-partitioned data
and the Exchange disappears from the plan entirely — at 10^12 rows
that's the difference between shuffling ~100 TB of keys and shuffling
nothing. On Iceberg the same effect comes from a matching
``bucket(N, repo)`` partition transform (storage-partitioned joins);
this module provides the plain-parquet equivalent via Spark's native
bucketing, which works against the built-in catalog.

tests/test_layout.py asserts the plan property (no Exchange under the
join) rather than timing — the shuffle's absence is the invariant that
survives any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Write *df* as a bucketed (optionally sorted) parquet table.

    Bucketing metadata lives in the session catalog; readers that join
    or aggregate on ``bucket_cols`` get the data pre-partitioned
    (no Exchange) and, with ``sort_cols``, pre-sorted (no Sort).
    """
    writer = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    a plain spark.read.parquet on the files would lose it)."""
    return spark.table(table_name)
