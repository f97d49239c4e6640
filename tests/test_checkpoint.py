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
