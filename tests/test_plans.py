"""Physical-plan assertions: the plan we want, not just the answer.

- filters/projections reach the parquet scan (pushdown + pruning)
- small parents broadcast (referential anti-join, violation recovery)
- the checksum path stays inside whole-stage codegen
- NO row-at-a-time Python anywhere (BASELINE input_hint: 'no per-row
  Python'); the only Python in any rule plan is grouped-map pandas
  (drift), which is Arrow-batched.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark import fixtures as fx
from opengauss_tools_datachecker_spark.operators.checksum import checksum_table, recover_rows
from opengauss_tools_datachecker_spark.operators.referential import orphan_keys
from opengauss_tools_datachecker_spark.plans.rule import CheckContext, prepare_files
from opengauss_tools_datachecker_spark.plans.rules import ALL_RULES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _explain(df) -> str:
    return df._jdf.queryExecution().toString()


@pytest.fixture(scope="module")
def parquet_files(spark, small_files, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "files")
    small_files.write.parquet(path)
    return spark.read.parquet(path)


def test_filter_and_projection_pushdown(parquet_files):
    q = parquet_files.filter(F.col("lang") == "python").select("repo", "path")
    plan = _explain(q)
    assert "PushedFilters" in plan and "lang" in plan.split("PushedFilters")[1][:200]
    # column pruning: content must NOT be read for a keys-only projection
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "content" not in read_schema


def test_prepared_projection_reads_content_once(parquet_files):
    prepared = prepare_files(parquet_files, 8)
    plan = _plan(prepared)
    assert plan.count("sha2(") == 1
    assert "*(1)" in plan  # whole-stage codegen stage marker


def test_checksum_stays_in_codegen_no_python(parquet_files):
    df = checksum_table(parquet_files, ["repo", "path", "commit"])
    plan = _plan(df)
    assert "*(1)" in plan  # whole-stage codegen stage marker
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_referential_broadcasts_small_parent(spark, parquet_files):
    parent = fx.repo_commits(parquet_files)
    plan = _plan(orphan_keys(parquet_files, parent, on=["repo", "commit"]))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_recovery_broadcasts_digest_set(spark):
    src = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "id long, v string")
    missing = checksum_table(src.limit(3), ["id"]).select("checksum")
    plan = _plan(recover_rows(src, missing, value_cols=["v"]))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_no_row_python_in_any_rule(spark, parquet_files, small_files):
    ctx = CheckContext(
        spark=spark,
        files=parquet_files,
        manifest=fx.manifest(small_files),
        commits=fx.repo_commits(small_files),
        baseline=small_files,
        n_buckets=8,
        # merkle off keeps the plan fully lazy for inspection; outlier_k
        # opts the (otherwise-inapplicable) outlier rule in so its plan
        # is inspected too
        params={"merkle": False, "outlier_k": 3.0},
    )
    for rule in ALL_RULES:
        plan = _plan(rule.check(ctx))
        assert "BatchEvalPython" not in plan, f"row-Python in {rule.rule_id}"
        if rule.rule_id != "drift":
            assert "FlatMapGroupsInPandas" not in plan


def test_drift_pandas_runs_on_histograms_not_rows(spark, small_files):
    from opengauss_tools_datachecker_spark.operators.drift import (
        categorical_histogram,
        drift_verdicts,
    )

    hist = categorical_histogram(small_files, "lang", by="bucket")
    plan = _plan(drift_verdicts(hist, test="chi2"))
    # the pandas stage consumes the aggregated histogram: an aggregate
    # must appear BELOW the pandas operator in the plan tree
    assert "FlatMapGroupsInPandas" in plan
    pandas_idx = plan.index("FlatMapGroupsInPandas")
    assert "HashAggregate" in plan[pandas_idx:]


def test_check_tables_multi_table_controller(spark, tmp_path):
    """GaussController analog: LIKE filtering, concurrent per-table
    suites, per-table verdicts + resumable control dirs."""
    from opengauss_tools_datachecker_spark import fixtures as fx
    from opengauss_tools_datachecker_spark.plans.rule import CheckContext
    from opengauss_tools_datachecker_spark.plans.runner import check_tables

    def ctx_for(seed, corrupt):
        clean = fx.repo_files(spark, 800, n_repos=10, seed=seed, n_buckets=4)
        files = clean
        if corrupt:
            files, _ = fx.flip_bytes(clean, 0.01, seed=seed)
        return CheckContext(
            spark=spark, files=files, manifest=fx.manifest(clean),
            baseline=clean, n_buckets=4,
        )

    ctxs = {
        "orders_a": ctx_for(1, corrupt=False),
        "orders_b": ctx_for(2, corrupt=True),
        "tmp_scratch": ctx_for(3, corrupt=True),
    }
    results = check_tables(
        ctxs,
        whitelist=["orders%"],
        blacklist=["%scratch"],
        control_dir=str(tmp_path / "ctl"),
        max_concurrent=2,
    )
    assert set(results) == {"orders_a", "orders_b"}
    assert not results["orders_a"].failed
    assert results["orders_b"].failed
    # resume: a second run recomputes nothing (all pairs checkpointed)
    results2 = check_tables(
        ctxs, whitelist=["orders%"], blacklist=["%scratch"],
        control_dir=str(tmp_path / "ctl"), max_concurrent=2,
    )
    assert all(not r.verdicts for r in results2.values())
    assert all(len(r.skipped) > 0 for r in results2.values())


def test_violation_report_cap_keeps_counts_exact(spark, small_files):
    """max_violations_per_pair caps the REPORTED rows per (bucket, rule)
    while the verdict counts stay exact (the 10^12-scale guard against
    a pathological everything-flagged run)."""
    from opengauss_tools_datachecker_spark.plans.rules import ContentSha256Rule
    from opengauss_tools_datachecker_spark.plans.runner import run_suite

    corrupted, expected = fx.flip_bytes(small_files, 0.2)
    # drop the baked 8-bucket column: this ctx re-buckets at n_buckets=4
    # (a carried bucket column MUST match ctx.n_buckets — see CheckContext)
    ctx = CheckContext(
        spark=spark, files=corrupted.drop("bucket"),
        manifest=fx.manifest(small_files),
        n_buckets=4, params={"max_violations_per_pair": 3},
    )
    res = run_suite(ctx, rules=[ContentSha256Rule()])
    n_expected = expected.count()
    assert sum(n for (_, _, n, _) in res.verdicts) == n_expected
    per_bucket = {
        r.bucket: r.n
        for r in res.violations.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    assert all(n <= 3 for n in per_bucket.values())
    assert sum(per_bucket.values()) < n_expected  # genuinely capped


def test_suite_edge_inputs(spark, small_files):
    """Degenerate inputs must behave, not crash: empty observed side
    flags every manifest key; empty-vs-empty passes; total corruption
    flags exactly every row under sha256."""
    from pyspark.sql import functions as F

    from opengauss_tools_datachecker_spark import fixtures as fx
    from opengauss_tools_datachecker_spark.plans.rule import CheckContext
    from opengauss_tools_datachecker_spark.plans.runner import run_suite

    manifest = fx.manifest(small_files)
    empty = small_files.filter(F.lit(False))

    res = run_suite(CheckContext(spark=spark, files=empty, manifest=manifest, n_buckets=8))
    assert res.failed
    assert res.violations.filter("rule_id = 'sha256'").count() == small_files.count()
    res.unpersist_all()

    res = run_suite(
        CheckContext(spark=spark, files=empty, manifest=fx.manifest(empty), n_buckets=8)
    )
    assert not res.failed and res.violations.count() == 0
    res.unpersist_all()

    allbad = small_files.withColumn("content", F.concat(F.lit("X"), F.col("content")))
    res = run_suite(CheckContext(spark=spark, files=allbad, manifest=manifest, n_buckets=8))
    assert res.failed
    assert res.violations.filter("rule_id = 'sha256'").count() == small_files.count()
    res.unpersist_all()
