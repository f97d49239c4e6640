"""Live-database end-to-end over JDBC (S1-S3 exercised for real).

The reference's primary mode is extracting two live databases over JDBC
(DbOnceFullRecordExtractor.java:109-208). No standalone server ships in
this image, but the Spark dist bundles Apache Derby (embedded), so this
test drives the ACTUAL JDBC code path end to end: write the corrupted
files table and the clean manifest into an embedded Derby database,
read both back through ``read_table(fmt='jdbc')`` — including a
partitioned parallel scan, the reference's row-queue replacement — and
run the full rule suite on the JDBC-backed frames.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark import fixtures as fx
from opengauss_tools_datachecker_spark.plans.rule import CheckContext
from opengauss_tools_datachecker_spark.plans.runner import run_suite
from opengauss_tools_datachecker_spark.sources.catalog import (
    jdbc_reader_options,
    read_table,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available() -> bool:
    import pyspark

    return bool(
        glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "derby-*.jar"))
    )


pytestmark = pytest.mark.skipif(
    not _derby_available(), reason="no Derby jar in the Spark dist"
)


def test_check_over_live_jdbc_database(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    clean = fx.repo_files(spark, 2000, n_repos=20, n_buckets=8).cache()
    corrupted, expected = fx.flip_bytes(clean, 0.01)
    n_expected = expected.count()
    assert n_expected > 0

    (
        corrupted.write.format("jdbc")
        .option("url", url).option("dbtable", "FILES").option("driver", DRIVER)
        .save()
    )
    (
        fx.manifest(clean).write.format("jdbc")
        .option("url", url).option("dbtable", "MANIFEST").option("driver", DRIVER)
        .save()
    )

    # partitioned parallel scan on the numeric key — each task reads its
    # own range, replacing the reference's single-threaded row queue
    files = read_table(
        spark,
        fmt="jdbc",
        jdbc_options=jdbc_reader_options(
            url=url,
            table="FILES",
            driver=DRIVER,
            partition_column="file_id",
            lower_bound=0,
            upper_bound=2000,
            num_partitions=4,
        ),
    )
    assert files.rdd.getNumPartitions() == 4
    manifest = read_table(
        spark,
        fmt="jdbc",
        jdbc_options=jdbc_reader_options(url=url, table="MANIFEST", driver=DRIVER),
    )

    ctx = CheckContext(spark=spark, files=files, manifest=manifest, n_buckets=8)
    res = run_suite(ctx)
    assert res.failed
    sha_violations = res.violations.filter(F.col("rule_id") == "sha256")
    assert sha_violations.count() == n_expected
    res.unpersist_all()


def test_clean_jdbc_database_passes(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/cleandb;create=true"
    clean = fx.repo_files(spark, 500, n_repos=10, n_buckets=4).cache()
    (
        clean.write.format("jdbc")
        .option("url", url).option("dbtable", "FILES").option("driver", DRIVER)
        .save()
    )
    files = read_table(
        spark,
        fmt="jdbc",
        jdbc_options=jdbc_reader_options(url=url, table="FILES", driver=DRIVER),
    )
    # baseline= makes drift compare bucket-now vs bucket-at-baseline;
    # without it the fallback mode flags natural bucket heterogeneity
    ctx = CheckContext(
        spark=spark, files=files, manifest=fx.manifest(clean),
        baseline=clean, n_buckets=4,
    )
    res = run_suite(ctx)
    assert not res.failed
    assert res.violations.count() == 0
    res.unpersist_all()
