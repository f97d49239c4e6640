"""CLI runner end-to-end: exit codes distinguish verdict-FAIL from error
(unlike the reference's System.exit(0)-on-error, CheckRecordApplier.java:62-63)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def data(spark, small_files, tmp_path_factory):
    from opengauss_tools_datachecker_spark import fixtures as fx

    root = tmp_path_factory.mktemp("cli")
    corrupted, _ = fx.flip_bytes(small_files, 0.02)
    small_files.write.parquet(str(root / "clean"))
    corrupted.write.parquet(str(root / "files"))
    fx.manifest(small_files).write.parquet(str(root / "manifest"))
    fx.repo_commits(small_files).write.parquet(str(root / "commits"))
    return root


def _run(*args) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, str(REPO / "opengauss_tools_datachecker_spark" / "run_check.py"),
         "--master", "local[4]", "--buckets", "8", *map(str, args)],
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
    )


def test_cli_fail_exit_1(data):
    r = _run("--files", data / "files", "--manifest", data / "manifest",
             "--commits", data / "commits", "--rules", "sha256,uniqueness")
    assert r.returncode == 1, r.stderr[-2000:]
    assert "FAIL bucket=" in r.stdout


def test_cli_clean_exit_0_and_resume(data):
    ctl = data / "control"
    r = _run("--files", data / "clean", "--manifest", data / "manifest",
             "--commits", data / "commits", "--control", ctl,
             "--snapshot", "s1", "--rules", "sha256")
    assert r.returncode == 0, r.stderr[-2000:]
    # second run resumes everything
    r2 = _run("--files", data / "clean", "--manifest", data / "manifest",
              "--commits", data / "commits", "--control", ctl,
              "--snapshot", "s1", "--rules", "sha256")
    assert r2.returncode == 0
    assert "8 resumed" in r2.stdout


def test_cli_error_exit_2(data):
    r = _run("--files", "/nonexistent/path", "--rules", "uniqueness")
    assert r.returncode == 2
    assert "ERROR" in r.stderr


def test_cli_jdbc_requires_url(data):
    r = _run("--files", "app.orders", "--format", "jdbc", "--rules", "uniqueness")
    assert r.returncode == 2
    assert "--jdbc-url" in r.stderr


def test_cli_incremental_mode(data, tmp_path_factory):
    ctl = tmp_path_factory.mktemp("cli_inc") / "control"
    # full clean run at s0
    r0 = _run("--files", data / "clean", "--manifest", data / "manifest",
              "--commits", data / "commits", "--rules", "sha256,uniqueness",
              "--control", ctl, "--snapshot", "s0")
    assert r0.returncode == 0, r0.stderr[-2000:]
    # incremental run at s1 against the corrupted snapshot: dirty buckets
    # recompute (FAIL), clean buckets resume from the carried verdicts
    r1 = _run("--files", data / "files", "--manifest", data / "manifest",
              "--commits", data / "commits", "--rules", "sha256,uniqueness",
              "--control", ctl, "--snapshot", "s1",
              "--incremental-from", data / "clean", "--old-snapshot", "s0")
    assert r1.returncode == 1, r1.stderr[-2000:]
    assert "resumed" in r1.stdout and "FAIL bucket=" in r1.stdout


def test_cli_incremental_requires_control(data):
    r = _run("--files", data / "files", "--incremental-from", data / "clean")
    assert r.returncode == 2
    assert "requires --control" in r.stderr


def test_cli_jdbc_end_to_end_derby(tmp_path_factory):
    """The reference's primary invocation — point the checker at a live
    database — through OUR CLI: tables live in embedded Derby, the CLI
    reads them with --format jdbc and exits 1 on the seeded corruption.
    Derby embedded allows ONE JVM per database, so the DB is prepared by
    its own short-lived subprocess before the CLI subprocess boots it."""
    import subprocess as sp

    root = tmp_path_factory.mktemp("cli_jdbc")
    prep = root / "prep.py"
    prep.write_text(f"""
import sys
sys.path.insert(0, {str(REPO)!r})
from opengauss_tools_datachecker_spark import fixtures as fx
from opengauss_tools_datachecker_spark.session import get_spark
spark = get_spark(master="local[4]", shuffle_partitions=8)
clean = fx.repo_files(spark, 3000, n_repos=20, n_buckets=8).cache()
corrupted, expected = fx.flip_bytes(clean, 0.02)
assert expected.count() > 0
url = "jdbc:derby:{root}/db;create=true"
drv = "org.apache.derby.jdbc.EmbeddedDriver"
corrupted.write.format("jdbc").option("url", url).option("dbtable", "FILES").option("driver", drv).save()
fx.manifest(clean).write.format("jdbc").option("url", url).option("dbtable", "MANIFEST").option("driver", drv).save()
spark.stop()
""")
    pr = sp.run([sys.executable, str(prep)], capture_output=True, text=True, timeout=600)
    assert pr.returncode == 0, pr.stderr[-2000:]

    r = _run("--files", "FILES", "--manifest", "MANIFEST",
             "--format", "jdbc", "--jdbc-url", f"jdbc:derby:{root}/db",
             "--rules", "sha256")
    assert r.returncode == 1, r.stderr[-2000:]
    assert "FAIL bucket=" in r.stdout


def test_cli_registry_driven_incremental(data, tmp_path_factory):
    """Day 1: full run records registry metadata. Day 2: --registry +
    --old-snapshot plans dirty buckets from recorded signatures (the
    old snapshot table is NOT passed at all)."""
    work = tmp_path_factory.mktemp("reg")
    reg, ctl = work / "registry", work / "ctl"
    r1 = _run("--files", data / "clean", "--manifest", data / "manifest",
              "--rules", "sha256", "--control", ctl, "--snapshot", "d1",
              "--registry", reg)
    assert r1.returncode == 0, r1.stderr[-2000:]

    r2 = _run("--files", data / "files", "--manifest", data / "manifest",
              "--rules", "sha256", "--control", ctl, "--snapshot", "d2",
              "--registry", reg, "--old-snapshot", "d1")
    assert r2.returncode == 1, r2.stderr[-2000:]
    assert "resumed" in r2.stdout and "FAIL bucket=" in r2.stdout
    # some clean buckets' verdicts carried forward (resumed > 0)
    resumed = int(r2.stdout.split(" resumed")[0].rsplit(" ", 1)[-1])
    assert resumed > 0


def test_cli_metadata_only_drift_via_registry(spark, data, tmp_path_factory):
    """Day 1 records the snapshot's histogram cube alongside its
    signatures; day 2 (--registry --old-snapshot, no --baseline at all)
    uses the RECORDED cube as the drift baseline — the old snapshot is
    never re-read — and flags the bucket whose length distribution was
    stretched."""
    work = tmp_path_factory.mktemp("reg_hist")
    reg, ctl = work / "registry", work / "ctl"
    r1 = _run("--files", data / "clean", "--manifest", data / "manifest",
              "--rules", "sha256", "--control", ctl, "--snapshot", "d1",
              "--registry", reg)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert (Path(str(reg) + ".hist") / "snapshot_id=d1").exists()

    from opengauss_tools_datachecker_spark import fixtures as fx

    clean = spark.read.parquet(str(data / "clean"))
    fx.stretch_len(clean, bucket=3, factor=3).write.mode("overwrite").parquet(
        str(work / "drifted")
    )
    r2 = _run("--files", work / "drifted", "--rules", "drift",
              "--control", ctl, "--snapshot", "d2",
              "--registry", reg, "--old-snapshot", "d1")
    assert r2.returncode == 1, r2.stderr[-2000:]
    assert "drift baseline: recorded histogram cube of snapshot 'd1'" in r2.stdout
    assert "FAIL bucket=3 rule=drift" in r2.stdout
    # only the stretched bucket drifts vs the recorded cube
    assert r2.stdout.count("FAIL bucket=") == 1
