"""Resume tests (SURVEY.md §5.3): kill after k partitions, rerun, only
unfinished partitions recompute, final verdicts identical."""

from __future__ import annotations

from opengauss_tools_datachecker_spark import fixtures as fx
from opengauss_tools_datachecker_spark.plans.checkpoint import ControlTable
from opengauss_tools_datachecker_spark.plans.rule import CheckContext
from opengauss_tools_datachecker_spark.plans.rules import ContentSha256Rule, UniquenessRule
from opengauss_tools_datachecker_spark.plans.runner import run_suite


def _ctx(spark, files, manifest, commits):
    return CheckContext(
        spark=spark, files=files, manifest=manifest, commits=commits, n_buckets=8
    )


def test_resume_skips_completed(spark, small_files, tmp_path):
    manifest = fx.manifest(small_files)
    commits = fx.repo_commits(small_files)
    corrupted, expected = fx.flip_bytes(small_files, 0.05)
    rules = [ContentSha256Rule(), UniquenessRule()]
    ctl = ControlTable(str(tmp_path / "control"))

    # simulate a partial first run: only buckets 0-3 of sha256 finished
    partial = run_suite(
        _ctx(spark, corrupted.filter("bucket < 4"), manifest, commits),
        rules=[ContentSha256Rule()],
        control=None,
        snapshot_id="snapA",
    )
    done_rows = [(b, rid, n, s) for (b, rid, n, s) in partial.verdicts if b < 4]
    ctl.record(spark, done_rows, "snapA", {"sha256": ContentSha256Rule().version})

    # resumed full run: sha256 buckets 0-3 skipped, everything else runs
    result = run_suite(
        _ctx(spark, corrupted, manifest, commits),
        rules=rules,
        control=ctl,
        snapshot_id="snapA",
    )
    assert result.skipped == {(b, "sha256") for b in range(4)}
    recomputed = {(b, r) for (b, r, _, _) in result.verdicts}
    assert all((b, "sha256") not in recomputed for b in range(4))
    assert {(b, "uniqueness") for b in range(8)} <= recomputed

    # union of both runs must equal the verdicts of one clean full run
    full = run_suite(
        _ctx(spark, corrupted, manifest, commits), rules=rules, snapshot_id="snapA"
    )
    merged = {(b, r): (n, s) for (b, r, n, s) in done_rows + result.verdicts}
    reference = {(b, r): (n, s) for (b, r, n, s) in full.verdicts}
    assert merged == reference


def test_new_snapshot_or_version_invalidates(spark, small_files, tmp_path):
    manifest = fx.manifest(small_files)
    commits = fx.repo_commits(small_files)
    ctl = ControlTable(str(tmp_path / "control2"))
    r1 = run_suite(
        _ctx(spark, small_files, manifest, commits),
        rules=[UniquenessRule()],
        control=ctl,
        snapshot_id="snapA",
    )
    assert len(r1.verdicts) == 8
    # same snapshot → all skipped
    r2 = run_suite(
        _ctx(spark, small_files, manifest, commits),
        rules=[UniquenessRule()],
        control=ctl,
        snapshot_id="snapA",
    )
    assert r2.verdicts == [] and len(r2.skipped) == 8
    # new snapshot → recompute all
    r3 = run_suite(
        _ctx(spark, small_files, manifest, commits),
        rules=[UniquenessRule()],
        control=ctl,
        snapshot_id="snapB",
    )
    assert len(r3.verdicts) == 8 and r3.skipped == set()


def test_incremental_revalidates_only_dirty_buckets(spark, small_files, tmp_path):
    from pyspark.sql import functions as F

    from opengauss_tools_datachecker_spark.plans.runner import check_incremental

    manifest = fx.manifest(small_files)
    commits = fx.repo_commits(small_files)
    rules = [ContentSha256Rule(), UniquenessRule()]
    rids = {r.rule_id for r in rules}
    ctl = ControlTable(str(tmp_path / "ctl_inc"))

    # snapshot s0: clean full run, all 8x2 pairs PASS and checkpointed
    r0 = run_suite(
        _ctx(spark, small_files, manifest, commits), rules=rules, control=ctl,
        snapshot_id="s0",
    )
    assert not r0.failed

    # snapshot s1: corrupt the content of exactly one repo (one bucket)
    one_repo = small_files.select("repo").first()["repo"]
    dirty = {
        r["bucket"]
        for r in small_files.filter(F.col("repo") == one_repo)
        .select("bucket").distinct().collect()
    }
    new_files = small_files.withColumn(
        "content",
        F.when(
            F.col("repo") == one_repo, F.concat(F.col("content"), F.lit("X"))
        ).otherwise(F.col("content")),
    )
    res = check_incremental(
        _ctx(spark, new_files, manifest, commits), small_files, ctl,
        old_snapshot_id="s0", snapshot_id="s1", rules=rules,
    )

    # every clean bucket's verdict carried forward and skipped; only the
    # dirty bucket's pairs recomputed
    assert res.skipped == {(b, rid) for b in set(range(8)) - dirty for rid in rids}
    recomputed = {(b, r) for (b, r, _, _) in res.verdicts}
    assert recomputed == {(b, rid) for b in dirty for rid in rids}

    # violations are exactly the changed repo's rows, flagged by sha256
    exp_keys = {
        "|".join([r.repo, r.path, r.commit])
        for r in small_files.filter(F.col("repo") == one_repo).collect()
    }
    got = {r["key"] for r in res.violations.collect()}
    assert got == exp_keys

    # the new snapshot's lineage is complete: all pairs recorded under s1
    versions = {r.rule_id: r.version for r in rules}
    assert ctl.completed_pairs(spark, "s1", versions) == {
        (b, rid) for b in range(8) for rid in rids
    }


def test_control_rows_carry_run_metrics(spark, small_files, tmp_path):
    """Every computed verdict checkpoints its metrics (rows seen in the
    bucket, wall seconds of the rule's materialization action); rows
    appended without metrics (older code / carried verdicts) read back
    as NULLs through the explicit schema."""
    from pyspark.sql import functions as F

    manifest = fx.manifest(small_files)
    commits = fx.repo_commits(small_files)
    ctl = ControlTable(str(tmp_path / "control"))
    run_suite(
        _ctx(spark, small_files, manifest, commits),
        rules=[ContentSha256Rule(), UniquenessRule()],
        control=ctl,
        snapshot_id="snapA",
    )
    rows = ctl.read(spark).collect()
    assert rows and all(r.elapsed_sec is not None and r.elapsed_sec > 0 for r in rows)
    by_bucket = {
        r.bucket: r.n_rows for r in rows if r.rule_id == "sha256"
    }
    counted = {
        r.bucket: r.n
        for r in small_files.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    truth = {b: counted.get(b, 0) for b in range(8)}  # empty buckets see 0 rows
    assert by_bucket == truth
    # a metrics-free append (the carried-verdict shape) reads back NULL
    ctl.record(spark, [(0, "sha256", 0, "PASS")], "snapB", {"sha256": "1"})
    carried = ctl.read(spark).filter("snapshot_id = 'snapB'").collect()
    assert len(carried) == 1 and carried[0].n_rows is None and carried[0].elapsed_sec is None
