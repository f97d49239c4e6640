"""Bucketed-layout plan invariants: co-located storage removes the
shuffle from the comparison join and the pre-shuffle from groupBy —
the property that makes the sha256 rule feasible at 10^12 rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark import fixtures as fx
from opengauss_tools_datachecker_spark.fixtures import KEY_COLS
from opengauss_tools_datachecker_spark.sources.layout import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    files = fx.repo_files(spark, 2000, n_repos=20, n_buckets=8)
    manifest = fx.manifest(files)
    write_bucketed(
        files.select(*KEY_COLS, F.sha2("content", 256).alias("observed")),
        "t_obs", KEY_COLS, 8, sort_cols=KEY_COLS, path=str(base / "obs"),
    )
    write_bucketed(
        manifest, "t_exp", KEY_COLS, 8, sort_cols=KEY_COLS, path=str(base / "exp"),
    )
    yield "t_obs", "t_exp"
    spark.sql("DROP TABLE IF EXISTS t_obs")
    spark.sql("DROP TABLE IF EXISTS t_exp")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    t_obs, t_exp = bucketed_pair
    obs, exp = read_bucketed(spark, t_obs), read_bucketed(spark, t_exp)
    joined = obs.join(exp.hint("merge"), KEY_COLS, "full_outer").filter(
        ~F.col("observed").eqNullSafe(F.col("expected_sha256"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    # and it still computes the right thing: clean data -> no mismatches
    assert joined.count() == 0


def test_unbucketed_join_does_shuffle(spark, bucketed_pair):
    """Control: joining against a non-bucketed source still shuffles.

    (A mere projection of a bucketed table KEEPS its distribution — the
    control must come from an unbucketed source to force the Exchange.)
    """
    t_obs, _ = bucketed_pair
    obs = read_bucketed(spark, t_obs)
    plain = fx.manifest(fx.repo_files(spark, 2000, n_repos=20, n_buckets=8))
    joined = obs.join(plain.hint("merge"), KEY_COLS, "full_outer")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_pair):
    t_obs, _ = bucketed_pair
    obs = read_bucketed(spark, t_obs)
    agg = obs.groupBy(*KEY_COLS).agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan}"
