"""Rule-suite runner — the GaussController/GaussInstance analog.

The reference orchestrates one thread-pool pipeline per table
(/root/reference src/main/java/com/gauss/controller/GaussController.java:142-159,
GaussInstance.java:96-199: semaphores, bounded queues, TPS throttling,
barrier joins). All of that collapses into Spark's scheduler: each rule
is one lazy DataFrame, materialized as concurrent actions from a
thread pool (FAIR scheduling) so per-action fixed costs overlap;
``check_tables`` adds the per-table concurrency loop above that.

Resume semantics: with a control table, only (bucket, rule) pairs not
yet verdict-ed for the same (snapshot_id, rule_version) are recomputed;
bucket filters are pushed into the scans (partition pruning on an
Iceberg bucket-partitioned layout).

Error semantics: the reference calls System.exit(0) on applier failure
(CheckRecordApplier.java:62-63) — masking errors as success. Here
violations-found and execution-error are distinct: the CLI exits 1 on
FAIL verdicts, 2 on errors.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.plans.checkpoint import ControlTable
from opengauss_tools_datachecker_spark.plans.rule import (
    CheckContext,
    empty_violations,
    prepare_files,
)
from opengauss_tools_datachecker_spark.plans.rules import ALL_RULES


@dataclass
class RunResult:
    violations: DataFrame          # (rule_id, bucket, key, observed, expected)
    verdicts: list[tuple]          # collected (bucket, rule_id, n_violations, status)
    skipped: set[tuple[int, str]]  # (bucket, rule_id) resumed from checkpoint
    cached: list[DataFrame] = field(default_factory=list)  # per-rule persisted frames

    @property
    def failed(self) -> bool:
        return any(status == "FAIL" for (_, _, _, status) in self.verdicts)

    def unpersist_all(self) -> None:
        for df in self.cached:
            df.unpersist()


def check_tables(
    ctxs: dict[str, CheckContext],
    whitelist: list[str] | None = None,
    blacklist: list[str] | None = None,
    control_dir: str | None = None,
    snapshot_id: str = "snap0",
    max_concurrent: int = 5,
    rules=None,
) -> dict[str, RunResult]:
    """Validate many tables — the GaussController loop (/root/reference
    src/main/java/com/gauss/controller/GaussController.java:327-397:
    catalog scan → LIKE white/black filter → per-table pipelines bounded
    by a semaphore, TableController.java:29-50).

    Tables are selected with the same LIKE-wildcard semantics, then
    their suites run as concurrent Spark job groups bounded by
    ``max_concurrent`` (the ``gauss.table.concurrent.size=5`` analog,
    gauss.properties:22). Each table checkpoints to its own control
    subdirectory, so a killed multi-table run resumes per (table,
    bucket, rule).
    """
    from opengauss_tools_datachecker_spark.sources.catalog import filter_tables

    selected = filter_tables(sorted(ctxs), whitelist, blacklist)

    def one(name: str) -> tuple[str, RunResult]:
        control = ControlTable(f"{control_dir}/{name}") if control_dir else None
        return name, run_suite(
            ctxs[name], rules=rules, control=control, snapshot_id=snapshot_id
        )

    with ThreadPoolExecutor(max_workers=max(1, max_concurrent)) as pool:
        return dict(pool.map(one, selected))


def run_suite(
    ctx: CheckContext,
    rules=None,
    control: ControlTable | None = None,
    snapshot_id: str = "snap0",
    resume: bool = True,
) -> RunResult:
    rules = rules if rules is not None else ALL_RULES
    # a rule may declare itself inapplicable to this context (e.g. the
    # schema rule without an expected schema) — skipped entirely, no
    # misleading PASS verdict
    rules = [r for r in rules if getattr(r, "applicable", lambda _: True)(ctx)]
    rule_versions = {r.rule_id: r.version for r in rules}
    all_buckets = set(range(ctx.n_buckets))

    def buckets_of(rule) -> set[int]:
        # table-granular rules (schema) verdict once, at bucket 0
        return {0} if getattr(rule, "granularity", "bucket") == "table" else all_buckets

    # An input missing the key/content columns can't run any data rule —
    # that IS the schema rule's finding, not a planner crash. Degrade to
    # the table-granular rules when a schema contract is present;
    # otherwise fail with a actionable message.
    required = {"repo", "path", "commit", "content"}
    missing = sorted(required - set(ctx.files.columns))
    if missing:
        table_rules = [r for r in rules if getattr(r, "granularity", "bucket") == "table"]
        if not table_rules:
            raise ValueError(
                f"input table lacks required columns {missing}; provide the "
                "(repo, path, commit, ..., content) shape or pass an "
                "expected_schema so the schema rule can report the mismatch"
            )
        rules = table_rules
        rule_versions = {r.rule_id: r.version for r in rules}

    done: set[tuple[int, str]] = set()
    if control is not None and resume:
        done = control.completed_pairs(ctx.spark, snapshot_id, rule_versions)

    per_rule_pending: dict[str, set[int]] = {
        r.rule_id: {b for b in buckets_of(r) if (b, r.rule_id) not in done} for r in rules
    }

    # Narrow shared projection: content scanned once (digest + length in
    # one pass), cached fixed-width columns feed every rule. With only
    # table-granular rules active (schema-only degraded mode) the raw
    # frame passes through un-prepared and un-scanned.
    if missing:
        files = ctx.files
    else:
        files = prepare_files(
            ctx.files, ctx.n_buckets, secret_scan=bool(ctx.params.get("secrets"))
        ).persist()
    # When the baseline's histogram cube is precomputed (the production
    # path), the baseline table itself is never scanned here.
    baseline = (
        prepare_files(ctx.baseline, ctx.n_buckets, with_digest=False)
        if ctx.baseline is not None and ctx.baseline_cube is None
        else None
    )
    # Manifest pruned to key + digest + bucket and cached: the sha256
    # rule reads it twice (Merkle signature pass + row-level join) and
    # the derived commits parent reads it again — one storage scan total.
    manifest = None
    if ctx.manifest is not None:
        from opengauss_tools_datachecker_spark.fixtures import KEY_COLS, bucket_of

        manifest = ctx.manifest.select(
            *KEY_COLS,
            "expected_sha256",
            bucket_of("repo", ctx.n_buckets).alias("bucket"),
            F.xxhash64(*KEY_COLS).alias("key_hash"),
        ).persist()
    # The caches must be materialized by ONE job before the combined
    # verdict action, or its concurrent rule subtrees race to compute
    # them independently. When the sha256 rule runs with the Merkle
    # fast path, its signature job (an agg over both caches) already
    # does this during plan construction; otherwise warm explicitly.
    merkle_warms = any(
        r.rule_id == "sha256" and per_rule_pending[r.rule_id] for r in rules
    ) and ctx.params.get("merkle", True) and ctx.manifest is not None
    if not merkle_warms and not missing:
        to_warm = files.select(F.lit(1).alias("one"))
        if manifest is not None:
            to_warm = to_warm.unionAll(manifest.select(F.lit(1).alias("one")))
        to_warm.count()

    # Referential parent: explicit commits table, else derived from the
    # cached manifest (the trusted reference defines key validity).
    commits = ctx.commits
    if commits is None and manifest is not None:
        commits = manifest.select("repo", "commit").distinct()

    active_rules = []
    rule_frames: list[DataFrame] = []
    count_frames: list[DataFrame] = []
    for rule in rules:
        pending = per_rule_pending[rule.rule_id]
        if not pending:
            continue
        active_rules.append(rule)
        rule_files, rule_manifest, rule_baseline = files, manifest, baseline
        rule_baseline_cube = ctx.baseline_cube
        if pending != buckets_of(rule):
            # bucket filter → partition pruning on a bucket-partitioned
            # layout. Manifest and baseline must be pruned in lockstep or
            # the full-outer joins report skipped buckets as missing.
            rule_files = files.filter(F.col("bucket").isin(*pending))
            if rule_manifest is not None:
                rule_manifest = rule_manifest.filter(F.col("bucket").isin(*pending))
            if rule_baseline is not None:
                rule_baseline = rule_baseline.filter(F.col("bucket").isin(*pending))
            if rule_baseline_cube is not None:
                rule_baseline_cube = rule_baseline_cube.filter(F.col("bucket").isin(*pending))
        rule_ctx = CheckContext(
            spark=ctx.spark,
            files=rule_files,
            manifest=rule_manifest,
            commits=commits,  # parent side stays global (validity set)
            baseline=rule_baseline,
            baseline_cube=rule_baseline_cube,
            expected_schema=ctx.expected_schema,
            raw_schema=ctx.files.schema,
            n_buckets=ctx.n_buckets,
            run_id=ctx.run_id,
            params=ctx.params,
        )
        # Building the sha256 plan runs its Merkle signature job here
        # (serial, doubles as the cache warm); other rules build lazily.
        frame = rule.check(rule_ctx)
        # Reported violations can be capped per (bucket, rule) — at
        # 10^12 rows a pathological corruption (wrong manifest, every
        # row flagged) must not persist/report billions of rows. Verdict
        # COUNTS stay exact: they aggregate the uncapped frame (tiny
        # map-side-combined result, no persist needed). The reference
        # has the same failure mode unmitigated (it prints every diff
        # row to check.log, RecordDiffer.java:48-60).
        cap = ctx.params.get("max_violations_per_pair")
        if cap:
            from pyspark.sql.window import Window

            w = Window.partitionBy("bucket").orderBy("key")
            report = (
                frame.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= int(cap))
                .drop("_rn")
            )
            count_frames.append(frame)      # exact counts, lazy
            rule_frames.append(report.persist())
        else:
            persisted = frame.persist()
            count_frames.append(persisted)  # counting warms the cache
            rule_frames.append(persisted)

    # Materialize every rule CONCURRENTLY: per-rule violation counts are
    # independent actions submitted from a thread pool, so Spark's
    # scheduler interleaves their stages — per-action fixed costs (AQE
    # stage materialization barriers, broadcast builds, collect round
    # trips) overlap instead of summing. The reference runs tables
    # concurrently the same way (TableController semaphore,
    # /root/reference src/main/java/com/gauss/controller/TableController.java:29-42).
    def _count(v: DataFrame):
        t0 = time.monotonic()
        rows = v.groupBy("bucket", "rule_id").agg(F.count("*").alias("n")).collect()
        return rows, time.monotonic() - t0

    if count_frames:
        with ThreadPoolExecutor(max_workers=len(count_frames)) as pool:
            timed = list(pool.map(_count, count_frames))
        per_rule_counts = [rows for rows, _ in timed]
        rule_elapsed = {
            r.rule_id: dt for r, (_, dt) in zip(active_rules, timed)
        }
    else:
        per_rule_counts = []
        rule_elapsed = {}

    # per-bucket input sizes for the control table's metrics columns —
    # one groupBy over the CACHED narrow projection, metadata-sized;
    # only when someone will record them (control set), and a
    # did-collect flag rather than dict truthiness so a legitimately
    # EMPTY table checkpoints n_rows=0, not NULL
    bucket_rows: dict[int, int] = {}
    have_metrics = False
    if control is not None and not missing and active_rules:
        bucket_rows = {
            r.bucket: r.n
            for r in files.groupBy("bucket").agg(F.count("*").alias("n")).collect()
        }
        total_rows = sum(bucket_rows.values())
        have_metrics = True

    counts = {
        (r.bucket, r.rule_id): r.n for rows in per_rule_counts for r in rows
    }
    verdict_rows = []
    metrics: dict[tuple[int, str], tuple[int | None, float | None]] = {}
    for rule in active_rules:
        table_granular = getattr(rule, "granularity", "bucket") == "table"
        for b in sorted(per_rule_pending[rule.rule_id]):
            n = counts.get((b, rule.rule_id), 0)
            verdict_rows.append((b, rule.rule_id, n, "FAIL" if n > 0 else "PASS"))
            if have_metrics:
                seen = total_rows if table_granular else bucket_rows.get(b, 0)
                metrics[(b, rule.rule_id)] = (seen, rule_elapsed.get(rule.rule_id))

    violations = empty_violations(ctx.spark)
    for vf in rule_frames:
        violations = violations.unionByName(vf)

    if control is not None and verdict_rows:
        control.record(
            ctx.spark, verdict_rows, snapshot_id, rule_versions,
            run_id=ctx.run_id, metrics=metrics,
        )
    files.unpersist()
    if manifest is not None:
        manifest.unpersist()
    return RunResult(
        violations=violations, verdicts=verdict_rows, skipped=done, cached=rule_frames
    )


def check_incremental(
    ctx: CheckContext,
    old_files: DataFrame | None,
    control: ControlTable,
    old_snapshot_id: str,
    snapshot_id: str,
    rules=None,
    dirty_buckets: set[int] | None = None,
) -> RunResult:
    """Revalidate only what changed between two snapshots — N6 upgraded
    from resume-after-kill to resume-after-data-change.

    ``snapshot_diff`` classifies keys added/removed/modified (narrow
    digest projections of both snapshots, one key-shuffle join); every
    bucket containing a change is DIRTY. Clean buckets' verdicts from
    ``old_snapshot_id`` carry forward — re-recorded under the new
    snapshot so :func:`run_suite`'s resume path skips them — and the
    suite then runs on the dirty buckets only (the bucket filter
    prunes partitions on an Iceberg bucket layout). At 10^12 rows with
    0.1% daily churn this turns a full revalidation into a scan of
    ~the touched buckets.

    Soundness boundary: carry-forward assumes a clean bucket's rule
    inputs are unchanged — manifest rows for unchanged keys, the drift
    baseline, and (for referential) the commits validity set. When a
    global input changes, bump that rule's ``version``: the version
    mismatch blocks the carry and forces a re-run. Table-granular
    rules (schema) are never carried — they are metadata-cheap and
    re-run every snapshot. Carried FAIL verdicts keep their violation
    COUNTS; the violation ROWS live with the run that produced them
    (the control table's run_id is the join key to that output).

    ``dirty_buckets`` (e.g. from the snapshot metadata registry's
    :func:`sources.snapshots.changed_buckets`) skips the
    ``snapshot_diff`` scan of both snapshots entirely — bucket-level
    change planning from recorded signatures: the OLD snapshot is never
    re-read (planning costs one signature pass over the new snapshot
    plus a metadata-sized registry read), and rule execution then scans
    only the dirty buckets. ``old_files`` may then be None.
    """
    from opengauss_tools_datachecker_spark.fixtures import bucket_of
    from opengauss_tools_datachecker_spark.operators.checksum import snapshot_diff

    active = rules if rules is not None else ALL_RULES
    active = [r for r in active if getattr(r, "applicable", lambda _: True)(ctx)]
    rule_versions = {r.rule_id: r.version for r in active}
    by_id = {r.rule_id: r for r in active}

    if dirty_buckets is not None:
        dirty = set(dirty_buckets)
    else:
        if old_files is None:
            raise ValueError("check_incremental needs old_files or dirty_buckets")
        changes = snapshot_diff(old_files, ctx.files, key_cols=["repo", "path", "commit"])
        dirty = {
            r["bucket"]
            for r in changes.select(bucket_of("repo", ctx.n_buckets).alias("bucket"))
            .distinct()
            .collect()
        }
    clean = set(range(ctx.n_buckets)) - dirty

    old_ctl = control.read(ctx.spark).filter(
        (F.col("snapshot_id") == old_snapshot_id) & F.col("status").isin("PASS", "FAIL")
    )
    carried = [
        (r.bucket, r.rule_id, r.n_violations, r.status)
        for r in old_ctl.collect()
        if r.bucket in clean
        and rule_versions.get(r.rule_id) == r.rule_version
        and getattr(by_id.get(r.rule_id), "granularity", "bucket") == "bucket"
    ]
    if carried:
        control.record(ctx.spark, carried, snapshot_id, rule_versions, run_id=ctx.run_id)
    return run_suite(ctx, active, control, snapshot_id, resume=True)
