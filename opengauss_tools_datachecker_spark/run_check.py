"""CLI entry: spark-submit --py-files <zip> run_check.py <args>.

The GaussLauncher.main analog (/root/reference src/main/java/com/gauss/
GaussLauncher.java:35-49): load config, build the rule set, execute,
emit the pass/fail matrix + violations, exit with a meaningful code.
Unlike the reference — which exits 0 even on applier failure
(CheckRecordApplier.java:62-63) — verdict FAIL exits 1 and execution
errors exit 2.

Example:
    spark-submit run_check.py --files /data/files --manifest /data/manifest \
        --control /data/control --snapshot snap42 --buckets 64 --out /data/violations
"""

from __future__ import annotations

import argparse
import os
import sys

# script-mode shim: when launched as `spark-submit .../run_check.py` the
# package root isn't on sys.path (in cluster deploys --py-files covers it)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="PySpark validation rule suite")
    p.add_argument("--files", required=True, help="input table path (parquet/iceberg)")
    p.add_argument("--manifest", help="reference manifest path")
    p.add_argument("--commits", help="parent (repo, commit) table path")
    p.add_argument("--baseline", help="baseline snapshot path for drift")
    p.add_argument(
        "--baseline-cube",
        help="precomputed baseline histogram cube path (operators.drift."
        "histogram_cube output); skips rescanning the baseline table",
    )
    p.add_argument(
        "--no-histograms", action="store_true",
        help="with --registry: skip recording this snapshot's drift "
        "histogram cube (recorded by default when the drift columns "
        "exist — a lang+length column-pruned scan, tiny next to the "
        "suite's content pass)",
    )
    p.add_argument(
        "--expected-schema",
        help="DDL schema contract for the input table, e.g. "
        "'repo string, path string, commit string, lang string, content string'; "
        "enables the schema rule",
    )
    p.add_argument("--control", help="control-table dir for checkpoint/resume")
    p.add_argument("--snapshot", default="snap0", help="input snapshot id (lineage)")
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--rules", default="all", help="comma list: sha256,uniqueness,referential,column_stats,drift")
    p.add_argument("--out", help="write violations parquet here")
    p.add_argument(
        "--format", default="parquet",
        help="parquet (default), iceberg, or jdbc (then --files/--manifest/... "
        "are dbtable names resolved against --jdbc-url)",
    )
    p.add_argument("--jdbc-url", help="jdbc:<dialect>://host:port/db for --format jdbc")
    p.add_argument("--jdbc-user")
    p.add_argument(
        "--jdbc-password-env", default=None,
        help="NAME of the environment variable holding the password "
        "(never the password itself on a command line)",
    )
    p.add_argument("--jdbc-fetch-size", type=int, default=None,
                   help="override the per-dialect fetch default")
    p.add_argument("--jdbc-session-init", help="e.g. 'SET NAMES utf8'")
    p.add_argument("--jdbc-partition-column")
    p.add_argument("--jdbc-lower-bound", type=int)
    p.add_argument("--jdbc-upper-bound", type=int)
    p.add_argument("--jdbc-num-partitions", type=int)
    p.add_argument("--master", default=None)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument(
        "--secrets", action="store_true",
        help="enable the credential-leak scan (N8); pattern counts fold "
        "into the suite's single content pass",
    )
    p.add_argument(
        "--outlier-k", type=float, default=None,
        help="enable the robust outlier rule (N7) with this median±k*MAD band",
    )
    p.add_argument(
        "--incremental-from",
        help="previous validated snapshot's table path: revalidate only "
        "buckets whose keys changed, carry clean buckets' verdicts "
        "forward (requires --control and --old-snapshot)",
    )
    p.add_argument("--old-snapshot", help="snapshot id of --incremental-from")
    p.add_argument(
        "--registry",
        help="snapshot metadata registry dir (sources.snapshots): every "
        "run records this snapshot's per-bucket signatures AFTER the "
        "suite completes (idempotent per snapshot); with "
        "--old-snapshot (and without --incremental-from) incremental "
        "planning reads CHANGED buckets from the registry instead of "
        "rescanning the old snapshot",
    )
    p.add_argument(
        "--band-index",
        help="LSH band-index root dir: after validation, probe the "
        "day's batch (the dirty buckets on registry-planned runs, the "
        "whole table otherwise) for near-duplicates of everything "
        "already indexed, then index it under --snapshot — the "
        "one-command daily-ingest composition (matches land under "
        "<index>/matches/batch_id=<snapshot> unless --band-index-out)",
    )
    p.add_argument("--band-index-out", help="matches parquet dir override")
    p.add_argument(
        "--max-violations", type=int, default=None,
        help="cap REPORTED violation rows per (bucket, rule); verdict "
        "counts stay exact (guards the report path against a "
        "pathological everything-flagged run)",
    )
    args = p.parse_args(argv)

    from opengauss_tools_datachecker_spark.plans.checkpoint import ControlTable
    from opengauss_tools_datachecker_spark.plans.rule import CheckContext
    from opengauss_tools_datachecker_spark.plans.rules import ALL_RULES
    from opengauss_tools_datachecker_spark.plans.runner import run_suite
    from opengauss_tools_datachecker_spark.session import get_spark
    from opengauss_tools_datachecker_spark.sources.catalog import read_table

    spark = get_spark(app_name="run_check", master=args.master)

    def _read(location: str):
        if args.format == "jdbc":
            from opengauss_tools_datachecker_spark.sources.catalog import (
                jdbc_reader_options,
            )

            if not args.jdbc_url:
                raise ValueError("--format jdbc requires --jdbc-url")
            password = (
                os.environ.get(args.jdbc_password_env) if args.jdbc_password_env else None
            )
            opts = jdbc_reader_options(
                url=args.jdbc_url,
                table=location,
                user=args.jdbc_user,
                password=password,
                fetch_size=args.jdbc_fetch_size,
                session_init=args.jdbc_session_init,
                partition_column=args.jdbc_partition_column,
                lower_bound=args.jdbc_lower_bound,
                upper_bound=args.jdbc_upper_bound,
                num_partitions=args.jdbc_num_partitions,
            )
            return read_table(spark, fmt="jdbc", jdbc_options=opts)
        return read_table(spark, location, args.format)

    try:
        files = _read(args.files)
        manifest = _read(args.manifest) if args.manifest else None
        commits = _read(args.commits) if args.commits else None
        baseline = _read(args.baseline) if args.baseline else None
        baseline_cube = _read(args.baseline_cube) if args.baseline_cube else None
        if (
            baseline is None
            and baseline_cube is None
            and args.registry
            and args.old_snapshot
        ):
            # metadata-only drift: yesterday's recorded cube is the
            # baseline — no rescan of the old snapshot (explicit
            # --baseline/--baseline-cube still take precedence above)
            from opengauss_tools_datachecker_spark.sources.snapshots import (
                recorded_histograms,
            )

            baseline_cube = recorded_histograms(
                spark, args.registry, args.old_snapshot,
                expected_n_buckets=args.buckets,
            )
            if baseline_cube is not None:
                print(
                    "drift baseline: recorded histogram cube of snapshot "
                    f"{args.old_snapshot!r}"
                )

        wanted = (
            None if args.rules == "all" else {r.strip() for r in args.rules.split(",")}
        )
        if wanted is not None:
            unknown = wanted - {r.rule_id for r in ALL_RULES}
            if unknown:
                raise ValueError(
                    f"unknown rule(s): {sorted(unknown)}; "
                    f"available: {sorted(r.rule_id for r in ALL_RULES)}"
                )
        rules = [r for r in ALL_RULES if wanted is None or r.rule_id in wanted]
        rules = [
            r
            for r in rules
            if not (r.rule_id == "sha256" and manifest is None)
            and not (r.rule_id == "referential" and commits is None and manifest is None)
        ]

        ctx = CheckContext(
            spark=spark,
            files=files,
            manifest=manifest,
            commits=commits,
            baseline=baseline,
            baseline_cube=baseline_cube,
            expected_schema=args.expected_schema,
            n_buckets=args.buckets,
            params={
                # `is not None`, not truthiness: --outlier-k 0 and
                # --max-violations 0 are legitimate values
                k: v
                for k, v in (
                    ("max_violations_per_pair", args.max_violations),
                    ("secrets", args.secrets or None),
                    ("outlier_k", args.outlier_k),
                )
                if v is not None
            },
        )
        control = ControlTable(args.control) if args.control else None
        new_sigs = None  # registry planning reuses these for recording
        dirty = None  # registry-planned dirty buckets double as the ingest batch
        if args.incremental_from:
            if control is None or not args.old_snapshot:
                raise ValueError(
                    "--incremental-from requires --control and --old-snapshot"
                )
            from opengauss_tools_datachecker_spark.plans.runner import check_incremental

            result = check_incremental(
                ctx, _read(args.incremental_from), control,
                old_snapshot_id=args.old_snapshot, snapshot_id=args.snapshot,
                rules=rules,
            )
        elif args.registry and args.old_snapshot:
            if control is None:
                raise ValueError("registry-driven incremental requires --control")
            from opengauss_tools_datachecker_spark.plans.runner import check_incremental
            from opengauss_tools_datachecker_spark.sources.snapshots import (
                bucket_signatures,
                changed_buckets,
            )

            # plan from the NEW snapshot's in-memory signatures vs the
            # registry's old rows — the snapshot is recorded only AFTER
            # the run completes (below), so a crashed run never leaves
            # its metadata behind
            new_sigs = bucket_signatures(files, args.buckets).persist()
            dirty = {
                r.bucket
                for r in changed_buckets(
                    spark, args.registry, args.old_snapshot,
                    new_signatures=new_sigs, n_buckets=args.buckets,
                ).collect()
            }
            result = check_incremental(
                ctx, None, control,
                old_snapshot_id=args.old_snapshot, snapshot_id=args.snapshot,
                rules=rules, dirty_buckets=dirty,
            )
        else:
            result = run_suite(
                ctx, rules=rules, control=control, snapshot_id=args.snapshot,
                resume=not args.no_resume,
            )

        if args.registry:
            # record after the suite finished (pass or FAIL verdicts —
            # the signature describes the DATA, not the verdicts;
            # a crashed run records nothing). Idempotent per snapshot.
            from opengauss_tools_datachecker_spark.sources.snapshots import (
                record_snapshot,
            )

            record_snapshot(
                files, args.registry, args.snapshot, args.buckets,
                signatures=new_sigs,
            )
            if new_sigs is not None:
                new_sigs.unpersist()
            if not args.no_histograms:
                # record this snapshot's drift cube so TOMORROW's drift
                # baseline is a metadata read; a lang+length
                # column-pruned scan (parquet never touches content)
                from opengauss_tools_datachecker_spark.operators.drift import (
                    histogram_cube,
                )
                from opengauss_tools_datachecker_spark.plans.rules import DriftRule
                from opengauss_tools_datachecker_spark.sources.snapshots import (
                    record_histograms,
                )

                fb = ctx.files_with_bucket()
                cat = DriftRule._cat_col(fb)
                if cat is not None:
                    record_histograms(
                        histogram_cube(fb, cat, DriftRule._len_expr(fb)),
                        args.registry,
                        args.snapshot,
                        n_buckets=args.buckets,
                    )

        if args.band_index:
            # the near-dup leg of the daily composition: the day's batch
            # is the registry-planned dirty-bucket set when one exists
            # (the SAME delta the validation just rescanned), else the
            # whole table; ingest_probe_index then restricts to
            # not-yet-indexed ids, so re-validated unchanged documents
            # are never re-signed or double-indexed
            from pyspark.sql import functions as F

            from opengauss_tools_datachecker_spark.operators.dedup import (
                ingest_probe_index,
            )

            batch = ctx.files_with_bucket()
            if dirty is not None:
                batch = batch.filter(F.col("bucket").isin(sorted(dirty)))
            # 64-bit key-hash ids: at 10^12 docs the birthday bound is
            # ~10^4 expected collisions (n^2/2^65), each silently
            # skipping ONE colliding doc from the (approximate) near-dup
            # index — ~3e-8 of the corpus, and the VALIDATION rules are
            # unaffected (they join on the full key columns, never this
            # id). Accepted over a 128-bit hex-string id, which would
            # roughly double every band row of the whole index (32-byte
            # id vs 8).
            docs = batch.select(
                F.xxhash64("repo", "path", "commit").alias("doc_id"),
                F.col("content").alias("text"),
            )
            res = ingest_probe_index(
                docs, args.band_index, args.snapshot,
                matches_out=args.band_index_out
                or f"{args.band_index}/matches/batch_id={args.snapshot}",
            )
            print(
                f"near-dup: {res['n_new']} new docs probed, "
                f"{res['n_matches']} matches, "
                f"indexed={'yes' if res['indexed'] else 'no (already folded)'}"
            )

        # summary.log analog
        n_fail = sum(1 for (_, _, _, s) in result.verdicts if s == "FAIL")
        print(f"verdicts: {len(result.verdicts)} computed, {len(result.skipped)} resumed, {n_fail} FAIL")
        for (b, rid, n, s) in result.verdicts:
            if s == "FAIL":
                print(f"  FAIL bucket={b} rule={rid} violations={n}")
        if args.out:
            result.violations.write.mode("overwrite").parquet(args.out)
            print(f"violations -> {args.out}")
        else:
            result.violations.orderBy("rule_id", "key").show(20, truncate=40)
        return 1 if result.failed else 0
    except Exception as exc:  # execution error ≠ verdict failure
        print(f"ERROR: {exc}", file=sys.stderr)
        return 2
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
