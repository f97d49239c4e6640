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


# --------------------------------------------------- mixture sampling


def _mix_docs(spark, n=400):
    # 4 strata with known char weights: en heavy, de light
    rows = [(i, ["en", "en", "de", "fr"][i % 4], 100 + (i % 7)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id bigint, lang string, n_chars bigint")


def test_mixture_rates_budget_and_cap(spark):
    from opengauss_tools_datachecker_spark.operators.sampling import mixture_sample

    d = _mix_docs(spark)
    avail = {r["lang"]: r["a"] for r in d.groupBy("lang").agg(F.sum("n_chars").alias("a")).collect()}
    # en budget = half its chars → rate 0.5; de budget = 10x its chars → capped at 1.0
    kept = mixture_sample(
        d, "doc_id", "lang", "n_chars",
        targets={"en": avail["en"] / 2.0, "de": avail["de"] * 10.0}, default_rate=0.25,
    )
    rates = {r["lang"]: r["mix_rate"] for r in kept.select("lang", "mix_rate").distinct().collect()}
    assert rates["en"] == 0.5 and rates["de"] == 1.0 and rates["fr"] == 0.25
    by_lang = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_de = d.filter(F.col("lang") == "de").count()
    assert by_lang["de"] == n_de  # rate 1.0 keeps every row
    # fractional strata keep ≈ rate of the rows (hash-uniform, wide tolerance)
    n_en = d.filter(F.col("lang") == "en").count()
    assert abs(by_lang["en"] / n_en - 0.5) < 0.2


def test_mixture_deterministic_under_repartition(spark):
    from opengauss_tools_datachecker_spark.operators.sampling import mixture_sample

    d = _mix_docs(spark)
    kw = dict(targets={"en": 5000.0}, default_rate=0.4)
    a = {r["doc_id"] for r in mixture_sample(d, "doc_id", "lang", "n_chars", **kw).collect()}
    b = {
        r["doc_id"]
        for r in mixture_sample(d.repartition(13, "n_chars"), "doc_id", "lang", "n_chars", **kw).collect()
    }
    assert a == b and a  # same keep set at any partitioning


def test_mixture_nested_samples(spark):
    # a smaller budget's keep set is a subset of a larger budget's —
    # the shared-hash nesting property the docstring promises
    from opengauss_tools_datachecker_spark.operators.sampling import mixture_sample

    d = _mix_docs(spark)
    small = {r["doc_id"] for r in mixture_sample(d, "doc_id", "lang", "n_chars",
                                                 targets={"en": 3000.0}, default_rate=0.2).collect()}
    big = {r["doc_id"] for r in mixture_sample(d, "doc_id", "lang", "n_chars",
                                               targets={"en": 9000.0}, default_rate=0.6).collect()}
    assert small <= big


def test_mixture_null_stratum_uses_default(spark):
    from opengauss_tools_datachecker_spark.operators.sampling import mixture_sample

    rows = [(i, None if i % 2 else "en", 10) for i in range(100)]
    d = spark.createDataFrame(rows, "doc_id bigint, lang string, n_chars bigint")
    kept = mixture_sample(d, "doc_id", "lang", "n_chars", targets={"en": 1e9}, default_rate=1.0)
    assert kept.count() == 100  # NULL stratum null-safe-joins and keeps at default 1.0
    dropped = mixture_sample(d, "doc_id", "lang", "n_chars", targets={"en": 1e9}, default_rate=0.0)
    assert dropped.filter(F.col("lang").isNull()).count() == 0


def test_mixture_duckdb_twin(spark):
    # the mixture arm's exact formula, replayed standalone on synthetic data
    import duckdb

    from opengauss_tools_datachecker_spark.operators.sampling import mixture_sample

    d = _mix_docs(spark)
    kept = mixture_sample(d, "doc_id", "lang", "n_chars", targets={"en": 7000.0}, default_rate=0.3)
    got = sorted((r["doc_id"], round(r["mix_rate"], 6)) for r in kept.collect())
    con = duckdb.connect()
    con.sql("CREATE TABLE docs AS SELECT * FROM (VALUES "
            + ",".join(f"({i},'{['en','en','de','fr'][i % 4]}',{100 + (i % 7)})" for i in range(400))
            + ") t(doc_id, lang, n_chars)")
    want = sorted(tuple(r) for r in con.sql("""
      WITH avail AS (SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS a FROM docs GROUP BY lang),
      rates AS (SELECT lang,
          CASE WHEN lang = 'en' THEN LEAST(1.0, 7000.0 / CAST(a AS DOUBLE)) ELSE 0.3 END AS r
        FROM avail)
      SELECT d.doc_id, ROUND(r, 6)
      FROM docs d JOIN rates USING (lang)
      WHERE lpad(substr(md5(concat('mixture', CAST(doc_id AS VARCHAR))), 1, 8), 9, '0')
            < printf('%09x', CAST(FLOOR(r * 4294967296.0) AS BIGINT))
    """).fetchall())
    assert got == want


# --------------------------------------------------- quantile gate


def test_quantile_gate_keeps_top_fraction(spark):
    from opengauss_tools_datachecker_spark.operators.sampling import quantile_gate

    # 100 distinct scores per group → exactly the top 30% + the
    # interpolated-threshold row survive
    rows = [("g", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, s double")
    kept = quantile_gate(df, "s", ["g"], keep_top=0.3)
    vals = sorted(r["s"] for r in kept.collect())
    # percentile(0.7) over 0..99 = 69.3 → keep 70..99
    assert vals == [float(v) for v in range(70, 100)]
    assert kept.select("gate_thr").distinct().collect()[0][0] == pytest.approx(69.3)


def test_quantile_gate_per_group_thresholds(spark):
    from opengauss_tools_datachecker_spark.operators.sampling import quantile_gate

    rows = [("lo", float(i)) for i in range(10)] + [("hi", float(100 + i)) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, s double")
    kept = quantile_gate(df, "s", ["g"], keep_top=0.5)
    got = {(r["g"], r["s"]) for r in kept.collect()}
    # each group keeps ITS OWN top half — a global threshold would
    # keep all of 'hi' and none of 'lo'
    assert {g for g, _ in got} == {"lo", "hi"}
    assert all(s >= 4.5 for g, s in got if g == "lo")
    assert all(s >= 104.5 for g, s in got if g == "hi")


def test_quantile_gate_ties_all_pass_and_approx_mode(spark):
    from opengauss_tools_datachecker_spark.operators.sampling import quantile_gate

    df = spark.createDataFrame([("g", 1.0)] * 50 + [("g", 2.0)] * 50, "g string, s double")
    kept = quantile_gate(df, "s", ["g"], keep_top=0.3)
    assert kept.count() == 50  # every tie at the threshold value passes
    approx = quantile_gate(df, "s", ["g"], keep_top=0.3, approx=True)
    assert approx.count() == 50  # sketch agrees on this trivial split


def test_quantile_gate_round_to_pins_threshold(spark):
    from opengauss_tools_datachecker_spark.operators.sampling import quantile_gate

    df = spark.createDataFrame([("g", float(i)) for i in range(100)], "g string, s double")
    kept = quantile_gate(df, "s", ["g"], keep_top=0.3, round_to=0)
    assert kept.select("gate_thr").distinct().collect()[0][0] == 69.0


def test_mixture_rejects_negative_target(spark):
    # an unvalidated negative target used to wrap %x into 16-char
    # two's-complement hex and keep EVERY row — the inverted sample
    import pytest as _pytest

    from opengauss_tools_datachecker_spark.operators.sampling import mixture_sample

    d = _mix_docs(spark)
    with _pytest.raises(ValueError, match="must be >= 0"):
        mixture_sample(d, "doc_id", "lang", "n_chars", targets={"en": -100.0})


def test_mixture_negative_weight_sum_clamps_to_empty(spark):
    # negative weights can push sum(weight) < 0; the rate clamp keeps the
    # bound at 0 (keep nothing) instead of hex-wrapping to keep-all
    from opengauss_tools_datachecker_spark.operators.sampling import mixture_sample

    rows = [(i, "en", -10) for i in range(50)]
    d = spark.createDataFrame(rows, "doc_id bigint, lang string, n_chars bigint")
    kept = mixture_sample(d, "doc_id", "lang", "n_chars", targets={"en": 100.0})
    assert kept.count() == 0
