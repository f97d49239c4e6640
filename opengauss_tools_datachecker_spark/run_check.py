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
    p.add_argument("--format", default="parquet")
    p.add_argument("--master", default=None)
    p.add_argument("--no-resume", action="store_true")
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
    try:
        files = read_table(spark, args.files, args.format)
        manifest = read_table(spark, args.manifest, args.format) if args.manifest else None
        commits = read_table(spark, args.commits, args.format) if args.commits else None
        baseline = read_table(spark, args.baseline, args.format) if args.baseline else None
        baseline_cube = (
            read_table(spark, args.baseline_cube, args.format) if args.baseline_cube else None
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
            params=(
                {"max_violations_per_pair": args.max_violations}
                if args.max_violations
                else {}
            ),
        )
        control = ControlTable(args.control) if args.control else None
        result = run_suite(
            ctx, rules=rules, control=control, snapshot_id=args.snapshot,
            resume=not args.no_resume,
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
