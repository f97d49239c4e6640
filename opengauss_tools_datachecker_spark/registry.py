"""CLI: snapshot metadata registry maintenance.

The retention companion to run_check.py's --registry flow
(sources/snapshots.py): validation runs append one metadata partition
per snapshot forever, so a long-lived registry needs the Iceberg
``expire_snapshots`` analog — prune old snapshots (signatures AND the
sibling histogram cubes) while the newest N stay replayable for
incremental planning.

Example:
    spark-submit registry.py list --registry /reg
    spark-submit registry.py expire --registry /reg --keep-last 7
    spark-submit registry.py expire --registry /reg --older-than snap42
"""

from __future__ import annotations

import argparse
import os
import sys

# script-mode shim: when launched as `spark-submit .../registry.py`
# the package root isn't on sys.path (cluster deploys use --py-files)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="snapshot registry maintenance")
    sub = p.add_subparsers(dest="cmd", required=True)

    ls = sub.add_parser("list", help="one summary row per recorded snapshot")
    ls.add_argument("--registry", required=True)
    ls.add_argument("--master", default=None)

    ex = sub.add_parser(
        "expire",
        help="prune old snapshots (signature partitions + histogram cubes)",
    )
    ex.add_argument("--registry", required=True)
    ex.add_argument("--keep-last", type=int, default=None,
                    help="keep the N newest snapshots by recorded_at")
    ex.add_argument("--older-than", default=None,
                    help="expire snapshots recorded before this one")
    ex.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from opengauss_tools_datachecker_spark.session import get_spark
    from opengauss_tools_datachecker_spark.sources import snapshots as snap

    spark = get_spark(app_name=f"registry_{args.cmd}", master=args.master)
    try:
        if args.cmd == "list":
            snap.snapshots(spark, args.registry).orderBy("recorded_at").show(
                100, truncate=False
            )
            return 0
        res = snap.expire_snapshots(
            spark, args.registry,
            keep_last=args.keep_last, older_than=args.older_than,
        )
        print(
            f"expired {len(res['expired'])} snapshot(s): "
            f"{', '.join(res['expired']) or '(none)'}; "
            f"kept {len(res['kept'])}"
        )
        if res["orphan_cubes"]:
            print(f"swept orphan histogram cube(s): {', '.join(res['orphan_cubes'])}")
        return 0
    except Exception as exc:
        print(f"ERROR: {exc}", file=sys.stderr)
        return 2
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
