"""Snapshot metadata registry: change detection from metadata alone."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark import fixtures as fx
from opengauss_tools_datachecker_spark.sources.snapshots import (
    bucket_signatures,
    changed_buckets,
    record_snapshot,
    snapshots,
)


def test_signatures_partitioning_independent(spark, small_files):
    a = bucket_signatures(small_files, 16).collect()
    b = bucket_signatures(small_files.repartition(13), 16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_changed_buckets_from_metadata_only(spark, small_files, tmp_path):
    reg = str(tmp_path / "registry")
    record_snapshot(small_files, reg, "snap1", n_buckets=16)

    # today's snapshot: one modified doc + a dropped repo's rows
    mod_key = small_files.select("repo", "path").first()
    new = small_files.withColumn(
        "content",
        F.when(
            (F.col("repo") == mod_key["repo"]) & (F.col("path") == mod_key["path"]),
            F.concat(F.lit("X"), F.col("content")),
        ).otherwise(F.col("content")),
    )
    record_snapshot(new, reg, "snap2", n_buckets=16)

    meta = {r.snapshot_id: r.n_rows for r in snapshots(spark, reg).collect()}
    assert meta["snap1"] == meta["snap2"] == small_files.count()

    got = {(r.bucket, r.change) for r in changed_buckets(spark, reg, "snap1", "snap2").collect()}
    expected_bucket = small_files.filter(
        (F.col("repo") == mod_key["repo"]) & (F.col("path") == mod_key["path"])
    ).select(F.col("bucket").alias("b")).first()["b"]
    assert got == {(expected_bucket, "modified")}


def test_changed_buckets_clean_pair_is_empty(spark, small_files, tmp_path):
    reg = str(tmp_path / "registry")
    record_snapshot(small_files, reg, "s1", n_buckets=16)
    record_snapshot(small_files.repartition(7), reg, "s2", n_buckets=16)
    assert changed_buckets(spark, reg, "s1", "s2").count() == 0


def test_count_only_change_detected(spark, small_files, tmp_path):
    # multiplicity changes move BOTH the sum signature and n_rows; the
    # exact n_rows compare is the belt-and-braces second check
    reg = str(tmp_path / "registry")
    record_snapshot(small_files, reg, "s1", n_buckets=16)
    one = small_files.limit(1)
    record_snapshot(small_files.unionByName(one).unionByName(one), reg, "s2", n_buckets=16)
    changes = changed_buckets(spark, reg, "s1", "s2").collect()
    assert len(changes) == 1 and changes[0]["change"] == "modified"


def test_duplicated_row_swap_changes_signature(spark, small_files, tmp_path):
    """{X,X} -> {Y,Y} inside one bucket preserves the row count and
    cancels under a XOR combiner; the multiset-sensitive sum signature
    must flag the bucket (duplicate rows are an expected anomaly — the
    uniqueness rule exists to catch them, so the registry may not go
    blind to them)."""
    reg = str(tmp_path / "registry")
    x = small_files.limit(1)
    key = x.first()
    snap_a = small_files.unionByName(x)  # X appears twice
    y = x.withColumn("content", F.concat(F.lit("Y"), F.col("content")))
    rest = small_files.filter(
        ~(
            (F.col("repo") == key["repo"])
            & (F.col("path") == key["path"])
            & (F.col("commit") == key["commit"])
        )
    )
    snap_b = rest.unionByName(y).unionByName(y)  # Y appears twice
    assert snap_a.count() == snap_b.count()
    record_snapshot(snap_a, reg, "sa", n_buckets=16)
    record_snapshot(snap_b, reg, "sb", n_buckets=16)
    changes = changed_buckets(spark, reg, "sa", "sb").collect()
    assert len(changes) == 1 and changes[0]["change"] == "modified"


def test_snapshot_id_charset_rejected(spark, small_files, tmp_path):
    """Ids become partition directory names: path metacharacters and
    dot-segments must be rejected before they corrupt the layout."""
    for bad in ("a/b", "a=b", "a b", "..", ""):
        with pytest.raises(ValueError):
            record_snapshot(small_files, str(tmp_path / "r"), bad, n_buckets=8)


def test_bucket_count_mismatch_rejected(spark, small_files, tmp_path):
    """Bucket ids are only comparable at equal n_buckets — a day-2 run
    with a different --buckets must fail loudly, not misplan."""
    reg = str(tmp_path / "registry")
    record_snapshot(small_files, reg, "s8", n_buckets=8)
    record_snapshot(small_files, reg, "s16", n_buckets=16)
    with pytest.raises(ValueError, match="bucket-count mismatch"):
        changed_buckets(spark, reg, "s8", "s16")
    sigs = bucket_signatures(small_files, 16)
    with pytest.raises(ValueError, match="n_buckets"):
        changed_buckets(spark, reg, "s8", new_signatures=sigs)
    with pytest.raises(ValueError, match="bucket-count mismatch"):
        changed_buckets(spark, reg, "s8", new_signatures=sigs, n_buckets=16)
    assert (
        changed_buckets(spark, reg, "s16", new_signatures=sigs, n_buckets=16).count()
        == 0
    )


def test_metadata_driven_incremental_check(spark, small_files, tmp_path):
    """End-to-end: the registry's changed_buckets feeds check_incremental
    (dirty_buckets=...) — neither snapshot is rescanned for planning,
    clean buckets carry verdicts, dirty buckets recompute."""
    from opengauss_tools_datachecker_spark.plans.checkpoint import ControlTable
    from opengauss_tools_datachecker_spark.plans.rule import CheckContext
    from opengauss_tools_datachecker_spark.plans.runner import (
        check_incremental,
        run_suite,
    )
    from opengauss_tools_datachecker_spark.plans.rules import (
        ContentSha256Rule,
        UniquenessRule,
    )

    reg = str(tmp_path / "registry")
    manifest = fx.manifest(small_files)
    rules = [ContentSha256Rule(), UniquenessRule()]
    rids = {r.rule_id for r in rules}
    ctl = ControlTable(str(tmp_path / "ctl"))

    def ctx(files):
        return CheckContext(
            spark=spark, files=files, manifest=manifest, n_buckets=8
        )

    r0 = run_suite(ctx(small_files), rules=rules, control=ctl, snapshot_id="s0")
    assert not r0.failed
    record_snapshot(small_files, reg, "s0", n_buckets=8)

    one_repo = small_files.select("repo").first()["repo"]
    new_files = small_files.withColumn(
        "content",
        F.when(
            F.col("repo") == one_repo, F.concat(F.col("content"), F.lit("X"))
        ).otherwise(F.col("content")),
    )
    record_snapshot(new_files, reg, "s1", n_buckets=8)

    dirty = {r.bucket for r in changed_buckets(spark, reg, "s0", "s1").collect()}
    expected_dirty = {
        r["bucket"]
        for r in small_files.filter(F.col("repo") == one_repo)
        .select("bucket").distinct().collect()
    }
    assert dirty == expected_dirty

    res = check_incremental(
        ctx(new_files), None, ctl, old_snapshot_id="s0", snapshot_id="s1",
        rules=rules, dirty_buckets=dirty,
    )
    assert res.skipped == {(b, rid) for b in set(range(8)) - dirty for rid in rids}
    recomputed = {(b, r) for (b, r, _, _) in res.verdicts}
    assert recomputed == {(b, rid) for b in dirty for rid in rids}


def test_record_snapshot_retry_is_idempotent(spark, small_files, tmp_path):
    """A crashed-and-retried run must replace its snapshot's metadata,
    not append duplicates (per-snapshot partition dir, overwrite)."""
    reg = str(tmp_path / "registry")
    record_snapshot(small_files, reg, "s1", n_buckets=16)
    record_snapshot(small_files, reg, "s1", n_buckets=16)  # retry
    meta = snapshots(spark, reg).collect()
    assert len(meta) == 1
    assert meta[0]["n_rows"] == small_files.count()
    record_snapshot(small_files, reg, "s2", n_buckets=16)
    assert changed_buckets(spark, reg, "s1", "s2").count() == 0


def test_histogram_registry_roundtrip(spark, small_files, tmp_path):
    from opengauss_tools_datachecker_spark.operators.drift import histogram_cube
    from opengauss_tools_datachecker_spark.sources.snapshots import (
        record_histograms,
        recorded_histograms,
    )

    cube = histogram_cube(small_files, "lang", F.length("content"))
    reg = str(tmp_path / "reg")
    record_histograms(cube, reg, "d1", n_buckets=8)
    got = recorded_histograms(spark, reg, "d1", expected_n_buckets=8)
    assert got is not None
    want = {tuple(r) for r in cube.collect()}
    assert {tuple(r) for r in got.collect()} == want
    # idempotent overwrite
    record_histograms(cube, reg, "d1", n_buckets=8)
    assert {
        tuple(r) for r in recorded_histograms(spark, reg, "d1").collect()
    } == want
    # bucket-count mismatch -> rejected, never a misaligned baseline
    with pytest.raises(ValueError, match="n_buckets"):
        recorded_histograms(spark, reg, "d1", expected_n_buckets=16)
    # missing snapshot -> None, unsafe id -> rejected
    assert recorded_histograms(spark, reg, "never") is None
    with pytest.raises(ValueError):
        record_histograms(cube, reg, "a/b", n_buckets=8)
    # the sibling .hist root never pollutes the signature registry tree
    fx_reg = str(tmp_path / "sig")
    from opengauss_tools_datachecker_spark.sources.snapshots import (
        record_snapshot,
        snapshots,
    )

    record_snapshot(small_files, fx_reg, "d1", 8)
    record_histograms(cube, fx_reg, "d1", n_buckets=8)
    assert snapshots(spark, fx_reg).count() == 1


def test_expire_snapshots_keep_last(spark, small_files, tmp_path):
    """Retention e2e: expired snapshots become unreadable (signatures
    AND histogram cubes), the newest N stay replayable, and
    changed_buckets on a surviving pair is unaffected."""
    import os
    import time

    from opengauss_tools_datachecker_spark.operators.drift import histogram_cube
    from opengauss_tools_datachecker_spark.sources.snapshots import (
        expire_snapshots,
        record_histograms,
        recorded_histograms,
        recorded_signatures,
    )

    reg = str(tmp_path / "reg")
    cube = histogram_cube(small_files, "lang", F.length("content"))
    for sid in ("s1", "s2", "s3", "s4"):
        record_snapshot(small_files, reg, sid, n_buckets=16)
        record_histograms(cube, reg, sid, n_buckets=16)
        time.sleep(0.002)  # distinct recorded_at milliseconds

    before = changed_buckets(spark, reg, "s3", "s4").count()
    n_sig_rows = recorded_signatures(spark, reg, "s3").count()
    res = expire_snapshots(spark, reg, keep_last=2)
    assert res["expired"] == ["s2", "s1"] and res["kept"] == ["s4", "s3"]

    # expired: both artifact trees gone
    for sid in ("s1", "s2"):
        assert not os.path.exists(f"{reg}/snapshot_id={sid}")
        assert not os.path.exists(f"{reg}.hist/snapshot_id={sid}")
        assert recorded_histograms(spark, reg, sid) is None
    # survivors: replayable, planning unaffected
    assert recorded_signatures(spark, reg, "s3").count() == n_sig_rows > 0
    assert recorded_histograms(spark, reg, "s4", expected_n_buckets=16) is not None
    assert changed_buckets(spark, reg, "s3", "s4").count() == before

    # idempotent rerun
    res = expire_snapshots(spark, reg, keep_last=2)
    assert res["expired"] == [] and res["kept"] == ["s4", "s3"]


def test_expire_snapshots_older_than_and_guards(spark, small_files, tmp_path):
    import time

    from opengauss_tools_datachecker_spark.sources.snapshots import (
        expire_snapshots,
    )

    reg = str(tmp_path / "reg")
    for sid in ("a1", "a2", "a3"):
        record_snapshot(small_files, reg, sid, n_buckets=8)
        time.sleep(0.002)

    with pytest.raises(ValueError, match="exactly one"):
        expire_snapshots(spark, reg)
    with pytest.raises(ValueError, match="exactly one"):
        expire_snapshots(spark, reg, keep_last=1, older_than="a2")
    with pytest.raises(ValueError, match=">= 1"):
        expire_snapshots(spark, reg, keep_last=0)
    with pytest.raises(ValueError, match="no rows"):
        expire_snapshots(spark, reg, older_than="nope")

    res = expire_snapshots(spark, reg, older_than="a2")
    assert res["expired"] == ["a1"] and res["kept"] == ["a3", "a2"]


def test_expire_snapshots_sweeps_orphan_cubes(spark, small_files, tmp_path):
    """A histogram cube whose signature partition is already gone (the
    crash window of a prior interrupted expire) is swept on the next
    run instead of outliving its snapshot."""
    import os
    import shutil
    import time

    from opengauss_tools_datachecker_spark.operators.drift import histogram_cube
    from opengauss_tools_datachecker_spark.sources.snapshots import (
        expire_snapshots,
        record_histograms,
    )

    reg = str(tmp_path / "reg")
    cube = histogram_cube(small_files, "lang", F.length("content"))
    for sid in ("b1", "b2"):
        record_snapshot(small_files, reg, sid, n_buckets=8)
        record_histograms(cube, reg, sid, n_buckets=8)
        time.sleep(0.002)
    # simulate the reverse-order crash leftover: signatures gone, cube not
    shutil.rmtree(f"{reg}/snapshot_id=b1")
    res = expire_snapshots(spark, reg, keep_last=1)
    assert res["orphan_cubes"] == ["b1"]
    assert not os.path.exists(f"{reg}.hist/snapshot_id=b1")


def test_registry_cli_expire_e2e(spark, small_files, tmp_path):
    import subprocess
    import sys
    import time
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    reg = str(tmp_path / "reg")
    for sid in ("c1", "c2", "c3"):
        record_snapshot(small_files, reg, sid, n_buckets=8)
        time.sleep(0.002)
    r = subprocess.run(
        [sys.executable,
         str(repo / "opengauss_tools_datachecker_spark" / "registry.py"),
         "expire", "--registry", reg, "--keep-last", "2",
         "--master", "local[4]"],
        capture_output=True, text=True, timeout=600, cwd=str(repo),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "expired 1 snapshot(s): c1" in r.stdout
    assert {row["snapshot_id"] for row in snapshots(spark, reg).collect()} == {"c2", "c3"}
