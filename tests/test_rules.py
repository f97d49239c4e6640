"""Seeded-corruption end-to-end tests: the reference's implicit oracle
made explicit (FIXTURES.md §4-5) — inject a difference, expect exactly
those keys flagged by exactly that rule, all other (bucket, rule)
verdicts PASS."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark import fixtures as fx
from opengauss_tools_datachecker_spark.plans.rule import CheckContext
from opengauss_tools_datachecker_spark.plans.rules import (
    ALL_RULES,
    ColumnStatsRule,
    ContentSha256Rule,
    DriftRule,
    NumericOutlierRule,
    ReferentialRule,
    UniquenessRule,
)
from opengauss_tools_datachecker_spark.plans.runner import run_suite


@pytest.fixture(scope="module")
def base(spark, small_files):
    return {
        "manifest": fx.manifest(small_files).cache(),
        "commits": fx.repo_commits(small_files).cache(),
    }


def _ctx(spark, files, base, baseline=None, **params):
    return CheckContext(
        spark=spark,
        files=files,
        manifest=base["manifest"],
        commits=base["commits"],
        baseline=baseline,
        n_buckets=8,
        params=params,
    )


def _keys(violations):
    return {r["key"] for r in violations.collect()}


def test_clean_input_all_pass(spark, small_files, base):
    result = run_suite(_ctx(spark, small_files, base, baseline=small_files))
    assert not result.failed
    assert result.violations.count() == 0
    # opt-in rules (schema without a contract, outlier without
    # outlier_k, secrets without the policy flag) are skipped entirely —
    # count the applicable ones
    ctx = _ctx(spark, small_files, base, baseline=small_files)
    n_data_rules = sum(
        1 for r in ALL_RULES if getattr(r, "applicable", lambda _: True)(ctx)
    )
    assert n_data_rules == len(ALL_RULES) - 3
    assert len(result.verdicts) == 8 * n_data_rules


def test_flip_bytes_caught_by_sha256(spark, small_files, base):
    corrupted, expected = fx.flip_bytes(small_files, 0.02)
    v = ContentSha256Rule().check(_ctx(spark, corrupted, base))
    exp = {"|".join([r.repo, r.path, r.commit]) for r in expected.collect()}
    assert _keys(v) == exp
    # mismatches have both sides non-null
    assert v.filter(F.col("observed").isNull() | F.col("expected").isNull()).count() == 0


def test_drop_rows_caught_as_missing(spark, small_files, base):
    corrupted, expected = fx.drop_rows(small_files, 0.02)
    v = ContentSha256Rule().check(_ctx(spark, corrupted, base))
    exp = {"|".join([r.repo, r.path, r.commit]) for r in expected.collect()}
    assert _keys(v) == exp
    assert v.filter(F.col("observed").isNotNull()).count() == 0


def test_extra_rows_caught(spark, small_files, base):
    corrupted, expected = fx.extra_rows(small_files, 0.02)
    v = ContentSha256Rule().check(_ctx(spark, corrupted, base))
    exp = {"|".join([r.repo, r.path, r.commit]) for r in expected.collect()}
    assert _keys(v) == exp
    assert v.filter(F.col("expected").isNotNull()).count() == 0


def test_dup_keys_caught_by_uniqueness_not_sha256(spark, small_files, base):
    corrupted, expected = fx.dup_keys(small_files, 0.02)
    exp = {"|".join([r.repo, r.path, r.commit]) for r in expected.collect()}
    v_uni = UniquenessRule().check(_ctx(spark, corrupted, base))
    assert _keys(v_uni) == exp
    assert v_uni.filter(F.col("observed") != "2").count() == 0
    # identical-content duplicates are invisible to the sha256 join —
    # exactly the reference's blindness our uniqueness rule compensates
    v_sha = ContentSha256Rule().check(_ctx(spark, corrupted, base))
    assert v_sha.count() == 0


def test_orphan_commits_caught_by_referential(spark, small_files, base):
    corrupted, expected = fx.orphan_commits(small_files, 0.02)
    v = ReferentialRule().check(_ctx(spark, corrupted, base))
    exp = {f"{r.repo}|{r.commit}" for r in expected.collect()}
    assert _keys(v) == exp


def test_null_storm_caught_by_column_stats(spark, small_files, base):
    corrupted, _ = fx.null_storm(small_files, "lang", 0.2)
    v = ColumnStatsRule().check(_ctx(spark, corrupted, base))
    assert v.count() > 0
    assert all("lang" in r["key"] for r in v.collect())


def test_skew_lang_caught_by_drift(spark, small_files, base):
    corrupted = fx.skew_lang(small_files, bucket=3)
    v = DriftRule().check(
        _ctx(spark, corrupted, base, baseline=small_files)
    ).filter("key like 'lang_chi2%'")
    rows = v.collect()
    assert [r["bucket"] for r in rows] == [3]


def test_stretch_len_caught_by_ks(spark, small_files, base):
    corrupted = fx.stretch_len(small_files, bucket=5, factor=4)
    v = DriftRule().check(
        _ctx(spark, corrupted, base, baseline=small_files)
    ).filter("key like 'len_ks%'")
    assert [r["bucket"] for r in v.collect()] == [5]


def test_inflate_rows_caught_by_outlier_rule(spark, small_files, base):
    corrupted, expected = fx.inflate_rows(small_files, 0.01, factor=40)
    exp = {"|".join([r.repo, r.path, r.commit]) for r in expected.collect()}
    assert exp
    # exact percentiles and the approx_percentile sketch both flag every
    # injected row — the robust band cannot be dragged up by the
    # outliers themselves (the mean/stddev failure mode)
    for approx in (False, True):
        v = NumericOutlierRule().check(
            _ctx(spark, corrupted, base, outlier_k=3.0, outlier_approx=approx)
        )
        assert exp <= _keys(v)


def test_outlier_rule_opt_in(spark, small_files, base):
    ctx = _ctx(spark, small_files, base)
    assert not NumericOutlierRule.applicable(ctx)
    assert NumericOutlierRule.applicable(_ctx(spark, small_files, base, outlier_k=4.0))


def test_psi_zero_on_identical_and_positive_on_shift(spark):
    """PSI: identical histograms score ~0; a shifted bucket crosses the
    0.2 rule-of-thumb; value matches the numpy definition."""
    import math

    from opengauss_tools_datachecker_spark.operators.drift import drift_verdicts

    rows = [
        # bucket 1 matches its reference exactly
        (1, "a", 50, 50), (1, "b", 50, 50),
        # bucket 2 inverts the mix
        (2, "a", 90, 10), (2, "b", 10, 90),
    ]
    obs = spark.createDataFrame(
        [(b, v, n) for b, v, n, _ in rows], "bucket int, value string, n long"
    )
    ref = spark.createDataFrame(
        [(b, v, n) for b, v, _, n in rows], "bucket int, value string, n long"
    )
    got = {
        r["bucket"]: (r["statistic"], r["drifted"])
        for r in drift_verdicts(obs, ref, test="psi").collect()
    }
    assert got[1] == (0.0, False)
    expect = 2 * (0.9 - 0.1) * math.log(0.9 / 0.1)
    assert abs(got[2][0] - expect) < 1e-12 and got[2][1]


def test_permutation_invariance(spark, small_files, base):
    """Repartition/shuffle of the input must not change verdicts."""
    corrupted, _ = fx.flip_bytes(small_files, 0.02)
    v1 = _keys(ContentSha256Rule().check(_ctx(spark, corrupted, base)))
    v2 = _keys(ContentSha256Rule().check(_ctx(spark, corrupted.repartition(13), base)))
    assert v1 == v2


def test_hot_key_skew_uniqueness(spark, small_files, base):
    """A single key duplicated 10k times (the degenerate skew case the
    salted two-phase count exists for) is counted exactly, and no other
    key is flagged."""
    from pyspark.sql import functions as F

    one = small_files.limit(1)
    hot = one.crossJoin(spark.range(10_000).select(F.lit(1).alias("_x"))).drop("_x")
    files = small_files.unionByName(hot)
    ctx = CheckContext(spark=spark, files=files, manifest=base["manifest"], n_buckets=8)
    v = UniquenessRule().check(ctx).collect()
    key = "|".join([one.first().repo, one.first().path, one.first().commit])
    assert len(v) == 1 and v[0].key == key and v[0].observed == "10001"


def test_schema_rule_contract(spark, small_files, base):
    """N0: missing / extra / retyped columns are violations; matching
    schema passes; verdict is table-granular (bucket 0 only)."""
    from opengauss_tools_datachecker_spark.plans.rules import SchemaRule

    ddl = ("file_id bigint, repo string, path string, commit string, "
           "lang string, content string, bucket int")
    ok_ctx = CheckContext(spark=spark, files=small_files, expected_schema=ddl)
    assert SchemaRule().check(ok_ctx).count() == 0

    mutated = small_files.drop("lang").withColumn(
        "extra_col", F.lit(1)
    ).withColumn("file_id", F.col("file_id").cast("int"))
    bad_ctx = CheckContext(spark=spark, files=mutated, expected_schema=ddl)
    v = {r.key: (r.observed, r.expected) for r in SchemaRule().check(bad_ctx).collect()}
    assert v["lang"] == (None, "string")          # missing
    assert v["extra_col"] == ("int", None)        # unexpected
    assert v["file_id"] == ("int", "bigint")      # retyped
    assert all(r.bucket == 0 for r in SchemaRule().check(bad_ctx).collect())

    # through the runner: applicable only when a contract is given, and
    # the verdict matrix records it once at bucket 0
    res = run_suite(
        CheckContext(spark=spark, files=mutated, manifest=base["manifest"],
                     baseline=small_files, expected_schema=ddl, n_buckets=8),
        rules=[SchemaRule()],
    )
    assert res.verdicts == [(0, "schema", 3, "FAIL")]
    res_off = run_suite(
        CheckContext(spark=spark, files=small_files, manifest=base["manifest"],
                     baseline=small_files, n_buckets=8),
        rules=[SchemaRule()],
    )
    assert res_off.verdicts == []


@pytest.mark.parametrize("seed", [7, 101, 9999])
def test_metamorphic_clean_any_seed(spark, seed):
    """Metamorphic invariant (SURVEY §5.4): clean data yields zero
    violations for ANY generator seed, and the sha256 rule flags
    exactly the injected set after corruption of that same data."""
    clean = fx.repo_files(spark, 1500, n_repos=12, seed=seed, n_buckets=4).cache()
    manifest = fx.manifest(clean)
    assert ContentSha256Rule().check(
        CheckContext(spark=spark, files=clean, manifest=manifest, n_buckets=4)
    ).count() == 0
    corrupted, expected = fx.flip_bytes(clean, 0.01, seed=seed)
    v = ContentSha256Rule().check(
        CheckContext(spark=spark, files=corrupted, manifest=manifest, n_buckets=4)
    )
    assert _keys(v) == {"|".join([r.repo, r.path, r.commit]) for r in expected.collect()}
    clean.unpersist()


def test_drift_rule_without_lang_degrades(spark, small_files, base):
    """ADVICE r01: a table missing only the optional 'lang' column must
    not abort DriftRule plan construction — it degrades to length-KS
    drift only (lang absence is the schema rule's finding)."""
    nolang = small_files.drop("lang")
    keys = _keys(DriftRule().check(_ctx(spark, nolang, base)))
    assert all(k.startswith("len_ks|") for k in keys)
    # and with a baseline that also lacks lang (ref_len path)
    keys_b = _keys(DriftRule().check(_ctx(spark, nolang, base, baseline=nolang)))
    assert all(k.startswith("len_ks|") for k in keys_b)
    assert keys_b == set()  # identical baseline -> no drift


def test_leak_secrets_caught_by_secrets_rule(spark, small_files, base):
    from opengauss_tools_datachecker_spark.plans.rules import SecretsRule

    corrupted, injected = fx.leak_secrets(small_files, 0.02)
    exp = {"|".join([r.repo, r.path, r.commit]) for r in injected.collect()}
    v = SecretsRule().check(_ctx(spark, corrupted, base, secrets=True))
    assert _keys(v) == exp
    assert v.filter(F.col("observed") != "aws_key=1").count() == 0
    # clean content has zero hits
    assert SecretsRule().check(_ctx(spark, small_files, base, secrets=True)).count() == 0


def test_secrets_rule_opt_in(spark, small_files, base):
    from opengauss_tools_datachecker_spark.plans.rules import SecretsRule

    assert not SecretsRule.applicable(_ctx(spark, small_files, base))
    assert SecretsRule.applicable(_ctx(spark, small_files, base, secrets=True))


def test_w1_zero_on_identical_and_positive_on_shift(spark):
    from opengauss_tools_datachecker_spark.operators.drift import drift_verdicts

    base = [(0, str(v), 100) for v in range(5)]
    ident = spark.createDataFrame(base, "bucket int, value string, n long")
    v0 = drift_verdicts(ident, ident, test="w1", numeric_order=True).collect()[0]
    assert v0["statistic"] == 0.0 and not v0["drifted"]
    # shift all mass one bin to the right: W1 = 1 bin of displacement
    shifted = spark.createDataFrame(
        [(0, str(v + 1), 100) for v in range(5)], "bucket int, value string, n long"
    )
    v1 = drift_verdicts(shifted, ident, test="w1", numeric_order=True).collect()[0]
    assert abs(v1["statistic"] - 1.0) < 1e-9 and v1["drifted"]
