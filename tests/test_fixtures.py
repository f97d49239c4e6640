from __future__ import annotations

from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark import fixtures as fx


def test_deterministic(spark):
    a = fx.repo_files(spark, 500, seed=1).orderBy("file_id").collect()
    b = fx.repo_files(spark, 500, seed=1).orderBy("file_id").collect()
    assert a == b


def test_seed_changes_content(spark):
    a = fx.repo_files(spark, 100, seed=1).orderBy("file_id").select("content").collect()
    b = fx.repo_files(spark, 100, seed=2).orderBy("file_id").select("content").collect()
    assert a != b


def test_keys_unique_and_skewed(small_files):
    n = small_files.count()
    assert small_files.select(*fx.KEY_COLS).distinct().count() == n
    top = (
        small_files.groupBy("repo").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    # Zipf-ish: the hottest repo holds far more than the uniform share
    assert top["count"] > 3 * n / 30


def test_bucket_stable_and_in_range(small_files):
    rows = small_files.select("bucket").distinct().collect()
    assert all(0 <= r.bucket < 8 for r in rows)
    again = small_files.withColumn("b2", fx.bucket_of("repo", 8)).filter("b2 != bucket")
    assert again.count() == 0


def test_manifest_matches_clean(spark, small_files):
    m = fx.manifest(small_files)
    joined = small_files.withColumn("obs", F.sha2("content", 256)).join(
        m, fx.KEY_COLS
    )
    assert joined.filter(F.col("obs") != F.col("expected_sha256")).count() == 0


def test_injectors_expected_sets(spark, small_files):
    corrupted, expected = fx.flip_bytes(small_files, 0.02)
    assert 0 < expected.count() < 0.1 * small_files.count()
    dropped, exp_drop = fx.drop_rows(small_files, 0.02)
    assert dropped.count() + exp_drop.count() == small_files.count()
    dup, exp_dup = fx.dup_keys(small_files, 0.02)
    assert dup.count() == small_files.count() + exp_dup.count()
