"""CLI: incremental LSH near-dup index maintenance + probing.

The daily-ingest companion to run_check.py: each arriving document
batch is MinHash-signed once, its (id, band_key) rows appended to a
persistent band index, and its per-band counts folded into the index's
stats table — so probing day N+1 against a 10^12-doc corpus costs
O(new bands ⋈ index) with the degenerate-bucket cap fed from metadata,
never an index rescan (operators/dedup.py: index_batch /
probe_band_index).

Example:
    spark-submit dedup_index.py index --docs /data/day1 --index /idx --batch-id day1
    spark-submit dedup_index.py index --docs /data/day2 --index /idx --batch-id day2
    spark-submit dedup_index.py probe --docs /data/day3 --index /idx --out /idx_hits
    spark-submit dedup_index.py compact --index /idx          # offline maintenance
    spark-submit dedup_index.py reindex --docs /data/day1v2 --index /idx --batch-id day1
    spark-submit dedup_index.py delete --index /idx --batch-id day2
"""

from __future__ import annotations

import argparse
import os
import sys

# script-mode shim: when launched as `spark-submit .../dedup_index.py`
# the package root isn't on sys.path (cluster deploys use --py-files)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="incremental LSH band index")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--docs", required=True, help="documents parquet path")
        sp.add_argument("--index", required=True, help="band index root dir")
        sp.add_argument("--id-col", default="doc_id")
        sp.add_argument("--text-col", default="text")
        sp.add_argument("--n-hashes", type=int, default=8)
        sp.add_argument("--band-size", type=int, default=2)
        sp.add_argument("--master", default=None)

    ix = sub.add_parser("index", help="sign one batch and append it to the index")
    common(ix)
    ix.add_argument("--batch-id", required=True)

    pr = sub.add_parser("probe", help="probe a new batch against the index")
    common(pr)
    pr.add_argument("--max-bucket-size", type=int, default=1000)
    pr.add_argument("--out", help="write (new_id, match_id, origin) parquet here")

    rx = sub.add_parser(
        "reindex",
        help="re-ingest a CHANGED batch: stale rows removed/tombstoned, "
        "new content written (under a generation id once folded)",
    )
    common(rx)
    rx.add_argument("--batch-id", required=True)

    cp = sub.add_parser(
        "compact",
        help="fold all batch partitions into one base partition (offline)",
    )
    cp.add_argument("--index", required=True, help="band index root dir")
    cp.add_argument("--compact-id", default="compacted")
    cp.add_argument("--n-partitions", type=int, default=None)
    cp.add_argument("--master", default=None)

    dl = sub.add_parser(
        "delete",
        help="remove one batch's rows (partition delete pre-compaction, "
        "tombstone after)",
    )
    dl.add_argument("--index", required=True, help="band index root dir")
    dl.add_argument("--batch-id", required=True)
    dl.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from opengauss_tools_datachecker_spark.operators import dedup
    from opengauss_tools_datachecker_spark.session import get_spark

    spark = get_spark(app_name=f"dedup_index_{args.cmd}", master=args.master)
    try:
        if args.cmd == "compact":
            res = dedup.compact_index(
                spark, args.index, compact_id=args.compact_id,
                n_partitions=args.n_partitions,
            )
            print(
                f"compacted {res['n_batches']} batches "
                f"({res['n_rows']} band rows) -> batch_id={res['compact_id']}"
            )
            return 0
        if args.cmd == "delete":
            res = dedup.delete_batch(spark, args.index, args.batch_id)
            how = (
                "tombstoned (folded rows drop at next compaction)"
                if res["tombstoned"]
                else "live partition removed"
            )
            print(f"deleted batch {args.batch_id}: {how}")
            return 0
        docs = spark.read.parquet(args.docs)
        n_hashes, band_size = args.n_hashes, args.band_size
        if args.cmd == "probe":
            # banding parameters are a property of the INDEX, not the
            # probe invocation: mismatched parameters produce band keys
            # that never match anything — a silent false 'clean'
            meta = dedup.read_index_meta(spark, args.index)
            if meta is not None:
                if meta != (n_hashes, band_size):
                    print(
                        f"note: probing with the index's recorded "
                        f"(n_hashes, band_size)={meta}, overriding "
                        f"({n_hashes}, {band_size})"
                    )
                n_hashes, band_size = meta
        sigs = dedup.minhash_signatures(
            docs, args.id_col, args.text_col, n_hashes=n_hashes
        )
        if args.cmd == "reindex":
            bands = dedup.band_rows(sigs, args.id_col, n_hashes, band_size)
            effective = dedup.reindex_batch(
                bands, args.index, args.batch_id,
                n_hashes=n_hashes, band_size=band_size,
            )
            print(f"reindexed batch {args.batch_id} as {effective} -> {args.index}")
            return 0
        if args.cmd == "index":
            bands = dedup.band_rows(sigs, args.id_col, n_hashes, band_size)
            wrote = dedup.index_batch(
                bands, args.index, args.batch_id,
                n_hashes=n_hashes, band_size=band_size,
            )
            if wrote:
                print(f"indexed batch {args.batch_id} -> {args.index}")
            else:
                print(
                    f"batch {args.batch_id} already folded by compaction — "
                    "no-op (rows are in the compacted base)"
                )
            return 0
        index = dedup.read_band_index(spark, args.index)
        stats = dedup.read_band_stats(spark, args.index)
        hits = dedup.probe_band_index(
            sigs, index, args.id_col, n_hashes, band_size,
            max_bucket_size=args.max_bucket_size, index_band_sizes=stats,
        )
        if args.out:
            hits.write.mode("overwrite").parquet(args.out)
            n = spark.read.parquet(args.out).count()
            print(f"{n} candidate matches -> {args.out}")
        else:
            hits = hits.persist()  # count + show must not re-run the probe
            print(f"{hits.count()} candidate matches")
            hits.show(20, truncate=False)
        return 0
    except Exception as exc:
        print(f"ERROR: {exc}", file=sys.stderr)
        return 2
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
