"""Unit tests for the round-2 extension operators: robust outliers,
deterministic hash sampling, key-level snapshot diff, and within-doc
repetition stats."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.operators.checksum import snapshot_diff
from opengauss_tools_datachecker_spark.operators.dedup import repetition_stats
from opengauss_tools_datachecker_spark.operators.outliers import (
    MAD_SIGMA,
    robust_outliers,
    robust_stats,
)
from opengauss_tools_datachecker_spark.operators.sampling import (
    hash_prefix,
    hash_sample,
    rate_bound,
    stratified_sample,
)

# ---------------------------------------------------------------- outliers


def test_robust_stats_known_values(spark):
    # group a: values 1..7 → median 4, |dev| = {3,2,1,0,1,2,3} → MAD 2
    df = spark.createDataFrame([("a", float(v)) for v in range(1, 8)], "g string, v double")
    row = robust_stats(df, "v", by=["g"]).collect()[0]
    assert row["med"] == 4.0 and row["mad"] == 2.0


def test_robust_outliers_flags_far_point_not_near(spark):
    rows = [("a", float(v)) for v in range(1, 8)] + [("a", 100.0), ("a", 4.5)]
    df = spark.createDataFrame(rows, "g string, v double")
    # med=4.25? recompute: 1..7,100,4.5 → 9 values sorted 1,2,3,4,4.5,5,6,7,100
    # median=4.5; absdev = 3.5,2.5,1.5,.5,0,.5,1.5,2.5,95.5 → MAD=1.5
    flagged = robust_outliers(df, "v", by=["g"], k=3.0)
    vals = {r["v"] for r in flagged.collect()}
    assert vals == {100.0}  # 100 is out; 4.5 and the 1..7 band are in


def test_robust_outliers_resists_masking(spark):
    # mean/stddev would be dragged by the 3 huge values; median/MAD is not
    rows = [("a", float(v)) for v in range(50)] + [("a", 1e6)] * 3
    df = spark.createDataFrame(rows, "g string, v double")
    flagged = robust_outliers(df, "v", by=["g"], k=3.0)
    assert flagged.filter(F.col("v") == 1e6).count() == 3


def test_robust_outliers_precomputed_stats(spark):
    # anomalous vs HISTORY: current cohort is uniformly shifted, so
    # within-cohort stats see nothing — baseline stats flag everything
    hist = spark.createDataFrame([("a", float(v)) for v in range(1, 8)], "g string, v double")
    cur = spark.createDataFrame([("a", 1000.0), ("a", 1001.0)], "g string, v double")
    stats = robust_stats(hist, "v", by=["g"])
    assert robust_outliers(cur, "v", by=["g"], k=3.0).count() == 0
    assert robust_outliers(cur, "v", by=["g"], k=3.0, stats=stats).count() == 2


# ---------------------------------------------------------------- sampling


def test_rate_bound_edges():
    assert rate_bound(0.0) == "000000000"
    assert rate_bound(1.0) == "100000000"
    with pytest.raises(ValueError):
        rate_bound(1.5)


def test_hash_sample_deterministic_under_repartition(spark):
    df = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.2).collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(df.repartition(13, "doc_id"), "doc_id", 0.2).collect()
    }
    assert a == b
    # rate is honored within binomial noise (p=.2, n=5000 → sd≈28)
    assert abs(len(a) - 1000) < 150


def test_hash_sample_matches_reference_md5(spark):
    # engine-portability contract: membership == md5 prefix compare
    kept = {r["doc_id"] for r in hash_sample(spark.range(100).select(
        F.col("id").alias("doc_id")), "doc_id", 0.3).collect()}
    bound = int(rate_bound(0.3), 16)
    expect = {
        i for i in range(100)
        if int(hashlib.md5(f"sample{i}".encode()).hexdigest()[:8], 16) < bound
    }
    assert kept == expect


def test_hash_sample_salts_independent(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.5, salt="s1").collect()}
    b = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.5, salt="s2").collect()}
    assert a != b
    overlap = len(a & b) / 2000  # independent draws → ≈ 0.25
    assert 0.15 < overlap < 0.35


def test_stratified_rates_and_null_stratum(spark):
    rows = [(i, "en" if i % 2 else ("de" if i % 4 else None)) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = stratified_sample(df, "doc_id", "lang", {"en": 1.0, "de": 0.0}, default_rate=0.5)
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("en") == 2000  # rate 1.0 keeps all
    assert "de" not in counts  # rate 0.0 drops all
    assert 350 < counts.get(None, 0) < 650  # NULL stratum → default 0.5 of 1000


def test_sampling_plan_is_pure_map(spark):
    df = spark.range(0, 100).select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    plan = stratified_sample(df, "doc_id", "lang", {"en": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# ------------------------------------------------------------ snapshot diff


def test_snapshot_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "z")], "k long, v1 string, v2 string"
    )
    new = spark.createDataFrame(
        [(1, "a", "x"), (2, "B", "y"), (4, "d", "w")], "k long, v1 string, v2 string"
    )
    got = {(r["k"], r["change"]) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {(2, "modified"), (3, "removed"), (4, "added")}


def test_snapshot_diff_null_values_equal(spark):
    # NULL == NULL under the sentinel digest: not a modification
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, None)], "k long, v string")
    assert snapshot_diff(old, new, ["k"]).count() == 0


def test_snapshot_diff_digest_only_shuffle(spark):
    # no payload column survives past the scan-side projection
    old = spark.createDataFrame([(1, "a")], "k long, v string")
    new = spark.createDataFrame([(1, "b")], "k long, v string")
    plan = snapshot_diff(old, new, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan or "full_outer" in plan.lower()


# -------------------------------------------------------------- repetition


def test_repetition_stats_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),        # 7 3-grams, 3 distinct
            (2, "one two three four"),        # 2 3-grams, both distinct
            (3, "too short"),                 # < 3 tokens → dropped
            (4, None),                        # NULL → dropped
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert set(rows) == {1, 2}
    assert (rows[1]["n_grams"], rows[1]["n_distinct"]) == (7, 3)
    assert rows[1]["dup_ratio"] == round(1.0 - 3.0 / 7.0, 6)
    assert rows[2]["dup_ratio"] == 0.0
