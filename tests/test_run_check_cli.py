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


def test_cli_daily_ingest_composition(spark, small_files, tmp_path_factory):
    """The one-command daily-ingest story: each day's run chains
    registry-planned incremental validation with a band-index probe +
    index of that day's batch. Day 2 adds two documents — one a
    near-dup of day-1 content, one fresh — and the single command
    revalidates only the dirty buckets, probes ONLY the new documents
    (unchanged rows in dirty buckets are never re-signed), reports the
    near-dup match, and indexes the batch."""
    from pyspark.sql import functions as F

    from opengauss_tools_datachecker_spark import fixtures as fx
    from opengauss_tools_datachecker_spark.operators import dedup

    work = tmp_path_factory.mktemp("daily")
    reg, ctl, idx = work / "registry", work / "ctl", work / "bandidx"

    day1 = small_files
    day1.write.parquet(str(work / "day1"))
    fx.manifest(day1).write.parquet(str(work / "manifest1"))

    r1 = _run("--files", work / "day1", "--manifest", work / "manifest1",
              "--rules", "sha256", "--control", ctl, "--snapshot", "d1",
              "--registry", reg, "--band-index", idx)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "near-dup:" in r1.stdout and "indexed=yes" in r1.stdout

    # day 2 = day 1 + a near-dup of an existing doc + a fresh doc
    src = day1.orderBy("file_id").first()
    near = (900001, "repo_newA", "c900001", src.lang, "new/near.py",
            src.content + " trailer", None)
    fresh = (900002, "repo_newB", "c900002", "python", "new/fresh.py",
             " ".join(f"novel{i} unseen{i * 3 % 7}" for i in range(30)), None)
    extras = spark.createDataFrame(
        [near, fresh],
        "file_id long, repo string, commit string, lang string, "
        "path string, content string, bucket int",
    ).withColumn("bucket", fx.bucket_of("repo", 8))
    day2 = day1.unionByName(extras)
    day2.write.parquet(str(work / "day2"))
    fx.manifest(day2).write.parquet(str(work / "manifest2"))

    r2 = _run("--files", work / "day2", "--manifest", work / "manifest2",
              "--rules", "sha256", "--control", ctl, "--snapshot", "d2",
              "--registry", reg, "--old-snapshot", "d1", "--band-index", idx)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed" in r2.stdout                  # incremental validation ran
    assert "near-dup: 2 new docs probed" in r2.stdout  # batch = the delta only

    # the match names exactly the (near-dup doc, its day-1 original)
    new_id, src_id = [
        r["doc_id"]
        for r in spark.createDataFrame(
            [("repo_newA", "new/near.py", "c900001"),
             (src.repo, src.path, src.commit)],
            "repo string, path string, commit string",
        ).select(F.xxhash64("repo", "path", "commit").alias("doc_id")).collect()
    ]
    matches = {
        (r.new_id, r.match_id, r.origin)
        for r in spark.read.parquet(f"{idx}/matches/batch_id=d2").collect()
    }
    assert (new_id, src_id, "new_old") in matches
    assert not any(n == m for (n, m, _) in matches)  # no self-echoes
    # both days indexed; the index's stats stay exact
    batches = {
        r.batch_id
        for r in spark.read.option("basePath", f"{idx}/bands")
        .parquet(f"{idx}/bands")
        .select("batch_id").distinct().collect()
    }
    assert batches == {"d1", "d2"}
    stats = {
        (r.band_key, r.bsz)
        for r in dedup.read_band_stats(spark, str(idx)).collect()
    }
    recount = {
        (r.band_key, r.bsz)
        for r in dedup.read_band_index(spark, str(idx))
        .groupBy("band_key").agg(F.count(F.lit(1)).alias("bsz")).collect()
    }
    assert stats == recount
