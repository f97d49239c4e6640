"""Snapshot metadata registry — the Iceberg `.snapshots` analog.

BASELINE.json's production target is Iceberg, whose metadata tables
(`<t>.snapshots`, `<t>.partitions`) let a planner reason about change
WITHOUT scanning data. That runtime jar is not in this image, so this
module provides the same capability over plain parquet with identical
call shape: each validated snapshot records one metadata row per
bucket — exact row count plus an order-independent content signature —
and incremental planning then diffs SIGNATURES, not data.

The signature is the MULTISET-sensitive sum of xxhash64(keys ‖ content
digest) accumulated in a decimal (commutative/associative like bit_xor,
so partitioning-independent, but a duplicated-row swap {X,X}→{Y,Y}
changes it where XOR cancels even multiplicities — duplicate rows are
an expected anomaly here, the uniqueness rule exists to catch them).
Decimal, not long: the sum must never overflow (ANSI mode would throw,
legacy mode would wrap identically on both sides but NULL on decimal),
and decimal(28,0) inputs give the sum 10 carry digits — ~10^19 rows per
bucket before saturation.

Scale shape: recording is one map-side-combined aggregation over the
snapshot being validated (output = n_buckets rows); `changed_buckets`
joins two n_buckets-row metadata frames. At 10^12 rows, finding the
dirty buckets between yesterday's snapshot and today's costs two
metadata reads instead of two table scans — `runner.check_incremental`
scans data only inside the buckets this diff names.

Registry layout: a parquet directory, appended per snapshot:
(snapshot_id, bucket, n_rows, sig, n_buckets, recorded_at).
``n_buckets`` is recorded so a day-2 run with a different --buckets
than day-1 is REJECTED instead of silently misaligning dirty-bucket
planning (bucket ids are only comparable at equal bucket counts).
"""

from __future__ import annotations

import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.fixtures import KEY_COLS, bucket_of


def bucket_signatures(
    files: DataFrame, n_buckets: int, content_col: str = "content"
) -> DataFrame:
    """(bucket, n_rows, sig) for one snapshot — one combined agg pass.

    ``sig`` is order- and partitioning-independent (sum is commutative/
    associative), so two snapshots with identical row MULTISETS produce
    identical signatures regardless of how either was written — and any
    multiset change (including duplicated-row swaps that XOR would
    cancel) changes it. See the module header for the decimal rationale.
    """
    bucket = (
        F.col("bucket") if "bucket" in files.columns else bucket_of("repo", n_buckets)
    )
    return (
        files.select(
            bucket.alias("bucket"),
            F.xxhash64(*KEY_COLS, F.sha2(F.col(content_col), 256))
            .cast("decimal(28,0)")
            .alias("_h"),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("_h").alias("sig"))
    )


#: snapshot ids become partition DIRECTORY names — restrict to a safe
#: charset so '/', '=', spaces or a '..' segment can't corrupt the
#: registry layout or escape the registry root
_SAFE_SNAPSHOT_ID = re.compile(r"[A-Za-z0-9._-]+")


def _check_snapshot_id(snapshot_id: str) -> None:
    if not _SAFE_SNAPSHOT_ID.fullmatch(snapshot_id) or snapshot_id in (".", ".."):
        raise ValueError(
            f"snapshot_id {snapshot_id!r} is not a safe partition name "
            "(allowed: [A-Za-z0-9._-]+, not '.' or '..')"
        )


def record_snapshot(
    files: DataFrame,
    registry_path: str,
    snapshot_id: str,
    n_buckets: int,
    content_col: str = "content",
    signatures: DataFrame | None = None,
) -> None:
    """Record one snapshot's bucket metadata — IDEMPOTENT per snapshot.

    Each snapshot writes its own partition directory
    (``registry_path/snapshot_id=<id>``, mode=overwrite), so a crashed
    and retried run replaces its rows instead of appending duplicates;
    readers see ``snapshot_id`` as a partition column (and snapshot
    filters prune to one directory). ``signatures`` short-circuits the
    scan when :func:`bucket_signatures` was already computed (e.g. for
    incremental planning). ``n_buckets`` is stored with the rows so a
    later run at a different bucket count is rejected, not misplanned.
    """
    _check_snapshot_id(snapshot_id)
    sigs = (
        signatures
        if signatures is not None
        else bucket_signatures(files, n_buckets, content_col)
    )
    (
        sigs.select(
            "bucket",
            "n_rows",
            "sig",
            F.lit(int(n_buckets)).alias("n_buckets"),
            F.lit(int(time.time() * 1000)).alias("recorded_at"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{registry_path}/snapshot_id={snapshot_id}")
    )


def snapshots(spark: SparkSession, registry_path: str) -> DataFrame:
    """The `.snapshots`-style metadata frame: one summary row per
    snapshot (id, total rows, bucket count, recorded_at)."""
    reg = spark.read.parquet(registry_path)
    return reg.groupBy("snapshot_id").agg(
        F.sum("n_rows").alias("n_rows"),
        F.max("n_buckets").alias("n_buckets"),
        F.count(F.lit(1)).alias("n_buckets_present"),
        F.max("recorded_at").alias("recorded_at"),
    )


def recorded_signatures(
    spark: SparkSession, registry_path: str, snapshot_id: str
) -> DataFrame:
    """One recorded snapshot's (bucket, n_rows, sig) frame — a single
    partition directory read."""
    reg = spark.read.parquet(registry_path)
    return reg.filter(F.col("snapshot_id") == snapshot_id).select(
        "bucket", "n_rows", "sig"
    )


def _recorded_n_buckets(spark: SparkSession, registry_path: str, snapshot_id: str) -> int:
    reg = spark.read.parquet(registry_path)
    if "n_buckets" not in reg.columns:
        # the n_buckets column arrived together with the multiset-sum
        # signature format — its absence marks a registry whose sig
        # values are the old XOR longs, which must not be compared
        # against new sums either
        raise ValueError(
            f"registry {registry_path!r} predates the n_buckets/"
            "multiset-sum format: re-record its snapshots with the "
            "current code (or run a full, non-incremental validation)"
        )
    row = reg.filter(F.col("snapshot_id") == snapshot_id).select("n_buckets").first()
    if row is None:
        raise ValueError(f"snapshot {snapshot_id!r} has no rows in the registry")
    return int(row["n_buckets"])


def changed_buckets(
    spark: SparkSession,
    registry_path: str,
    old_id: str,
    new_id: str | None = None,
    new_signatures: DataFrame | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Buckets whose content differs between two snapshots —
    (bucket, change) with change ∈ {'added','removed','modified'} —
    from metadata alone (no data scan).

    The new side is either a recorded snapshot (``new_id``) or a
    not-yet-recorded :func:`bucket_signatures` frame
    (``new_signatures``, which then requires ``n_buckets`` — the count
    the frame was bucketed with) — the latter lets a run PLAN its dirty
    buckets before validating, and record the signatures only after the
    run completes. The planning primitive for `check_incremental`:
    clean buckets keep their carried verdicts; only the buckets named
    here are rescanned.

    Raises ValueError when the two sides were bucketed with different
    counts: bucket ids are only comparable at equal ``n_buckets``, and
    a silent mismatch would misplan the dirty set.
    """
    if (new_id is None) == (new_signatures is None):
        raise ValueError("exactly one of new_id / new_signatures is required")
    old_nb = _recorded_n_buckets(spark, registry_path, old_id)
    if new_id is not None:
        new_nb = _recorded_n_buckets(spark, registry_path, new_id)
    else:
        if n_buckets is None:
            raise ValueError(
                "pass n_buckets with new_signatures so bucket-count "
                "mismatches are rejected, not misplanned"
            )
        new_nb = int(n_buckets)
    if old_nb != new_nb:
        raise ValueError(
            f"bucket-count mismatch: snapshot {old_id!r} was recorded with "
            f"n_buckets={old_nb}, the new side uses {new_nb}; re-bucket or "
            "run a full (non-incremental) validation"
        )
    a = recorded_signatures(spark, registry_path, old_id).select(
        "bucket", F.col("n_rows").alias("n_a"), F.col("sig").alias("sig_a")
    )
    new_side = (
        recorded_signatures(spark, registry_path, new_id)
        if new_id is not None
        else new_signatures
    )
    b = new_side.select(
        "bucket", F.col("n_rows").alias("n_b"), F.col("sig").alias("sig_b")
    )
    j = a.join(b, "bucket", "full_outer")
    return j.filter(
        F.col("sig_a").isNull()
        | F.col("sig_b").isNull()
        | (F.col("sig_a") != F.col("sig_b"))
        | (F.col("n_a") != F.col("n_b"))
    ).select(
        "bucket",
        F.when(F.col("sig_a").isNull(), F.lit("added"))
        .when(F.col("sig_b").isNull(), F.lit("removed"))
        .otherwise(F.lit("modified"))
        .alias("change"),
    )


def expire_snapshots(
    spark: SparkSession,
    registry_path: str,
    keep_last: int | None = None,
    older_than: str | None = None,
) -> dict:
    """Prune old snapshots from the registry — the Iceberg
    ``expire_snapshots`` analog, and the registry's answer to the
    unbounded-accumulation problem :func:`record_snapshot` otherwise
    has (one partition per snapshot, forever). Covers BOTH artifact
    trees: each expired snapshot's signature partition AND its sibling
    ``<registry>.hist`` histogram cube.

    Exactly one retention policy must be given (ambiguity is refused,
    the :func:`~..operators.dedup.compact_index` discipline):

    - ``keep_last=N`` (N ≥ 1): keep the N newest snapshots by
      ``recorded_at`` (same-millisecond ties broken by id, the
      lexicographically larger counting as newer — right for
      date-stamped ids, and deterministic for all);
    - ``older_than=<id>``: expire every snapshot recorded strictly
      before that snapshot (which itself survives).

    Deletion order per snapshot is histogram cube FIRST, then the
    signature partition: a crash between the two leaves a snapshot
    whose drift baseline is merely missing (readers return None and
    fall back) rather than an orphan cube outliving its signatures —
    and each run also sweeps cube partitions whose signature partition
    is already gone (the crash-window leftovers of the reverse order,
    or of a prior interrupted run). Each directory delete is a single
    filesystem call; a rerun after any crash converges. Run offline
    (no concurrent record_snapshot of an expiring id).

    Returns {"expired": [ids], "kept": [ids], "orphan_cubes": [ids]}.
    """
    if (keep_last is None) == (older_than is None):
        raise ValueError("exactly one of keep_last / older_than is required")
    if keep_last is not None and keep_last < 1:
        raise ValueError("keep_last must be >= 1 (refusing to empty the registry)")
    if older_than is not None:
        _check_snapshot_id(older_than)
    summary = {
        r["snapshot_id"]: int(r["recorded_at"])
        for r in snapshots(spark, registry_path)
        .select("snapshot_id", "recorded_at")
        .collect()
    }
    # newest first; recorded_at ties broken by id so the cut is stable
    ordered = sorted(summary, key=lambda s: (summary[s], s), reverse=True)
    if keep_last is not None:
        kept, expired = ordered[:keep_last], ordered[keep_last:]
    else:
        if older_than not in summary:
            raise ValueError(
                f"snapshot {older_than!r} has no rows in the registry"
            )
        # everything strictly older in the same (recorded_at, id) order
        # the keep_last policy uses, so the two policies cut identically
        idx = ordered.index(older_than)
        kept, expired = ordered[: idx + 1], ordered[idx + 1 :]

    hpath = spark._jvm.org.apache.hadoop.fs.Path
    fs = hpath(registry_path).getFileSystem(spark._jsc.hadoopConfiguration())
    hist_root = hpath(f"{registry_path}.hist")
    # sweep orphan cubes (signature partition already gone) — the only
    # leftover any crash window of this function can produce
    orphans = []
    if fs.exists(hist_root):
        for st in fs.listStatus(hist_root):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith("snapshot_id=")):
                continue
            sid = name.split("=", 1)[1]
            if sid not in summary:
                orphans.append(sid)
                fs.delete(st.getPath(), True)
    for sid in expired:
        _check_snapshot_id(sid)  # a hostile directory name must not traverse
        cube = hpath(f"{registry_path}.hist/snapshot_id={sid}")
        if fs.exists(cube):
            fs.delete(cube, True)
        fs.delete(hpath(f"{registry_path}/snapshot_id={sid}"), True)
    return {"expired": expired, "kept": kept, "orphan_cubes": sorted(orphans)}


def record_histograms(
    cube: DataFrame, registry_path: str, snapshot_id: str, n_buckets: int
) -> None:
    """Persist a drift histogram cube (operators.drift.histogram_cube
    output: (bucket, cat, len, n)) for one snapshot — IDEMPOTENT per
    snapshot, same partition-dir-overwrite contract as
    :func:`record_snapshot`.

    Stored under a derived SIBLING root (``<registry_path>.hist/
    snapshot_id=<id>``), not inside the signature registry: the
    signature readers treat ``registry_path`` as one uniformly
    snapshot_id-partitioned tree, and a foreign subdirectory would
    break their partition discovery.

    This is the metadata that makes day-over-day drift METADATA-ONLY:
    the cube is ≤ buckets × categories × length-bins rows, so the next
    run's drift baseline is a tiny read instead of a rescan of
    yesterday's table (the same trick `changed_buckets` plays for the
    content rules). ``n_buckets`` is stored with the rows — the same
    reject-on-mismatch contract as the signature registry: bucket ids
    are only comparable at equal bucket counts."""
    _check_snapshot_id(snapshot_id)
    cube.withColumn("n_buckets", F.lit(int(n_buckets))).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{registry_path}.hist/snapshot_id={snapshot_id}")


def recorded_histograms(
    spark: SparkSession,
    registry_path: str,
    snapshot_id: str,
    expected_n_buckets: int | None = None,
) -> DataFrame | None:
    """One snapshot's recorded histogram cube — a single partition-dir
    read — or None when that snapshot recorded no histograms (older
    registry, or the input lacked the drift columns). With
    ``expected_n_buckets``, a cube recorded at a different bucket count
    is REJECTED (ValueError) instead of silently comparing each bucket
    against a different slice of yesterday's data."""
    from pyspark.errors import AnalysisException

    _check_snapshot_id(snapshot_id)
    try:
        cube = spark.read.parquet(f"{registry_path}.hist/snapshot_id={snapshot_id}")
    except AnalysisException:
        return None
    if expected_n_buckets is not None:
        if "n_buckets" not in cube.columns:
            # pre-versioning cube: its bucket count is UNKNOWN, which is
            # exactly the misalignment this check exists to stop — same
            # reject-and-re-record contract as _recorded_n_buckets
            raise ValueError(
                f"histogram cube for snapshot {snapshot_id!r} predates "
                "bucket-count versioning; re-record it (run a full "
                "validation with --registry) before using it as a drift "
                "baseline"
            )
        row = cube.select("n_buckets").first()
        recorded = int(row["n_buckets"]) if row else None
        if recorded is not None and recorded != int(expected_n_buckets):
            raise ValueError(
                f"histogram cube for snapshot {snapshot_id!r} was recorded "
                f"at n_buckets={recorded}, this run uses "
                f"{expected_n_buckets}; bucket-misaligned drift baselines "
                "are rejected — re-record or match --buckets"
            )
    return cube.drop("n_buckets")
