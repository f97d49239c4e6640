#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Two phases:
1. Full validation rule suite (sha256 + uniqueness + referential +
   column stats + drift) over a deterministic synthetic repo-files
   table (BASELINE.json metric: files/sec validated). Generation is
   cached to parquet and excluded from timing.
2. Headline operator queries from __spark_entry__ at
   $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), each forced
   end-to-end with a noop sink.

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": ...,
         "files_per_sec": ..., "n_files": ..., "cpus": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opengauss_tools_datachecker_spark import fixtures as fx
from opengauss_tools_datachecker_spark.plans.rule import CheckContext
from opengauss_tools_datachecker_spark.plans.runner import run_suite
from opengauss_tools_datachecker_spark.session import get_spark

# every registered query is a headline — derived from the registry so
# bench coverage can never drift from __spark_entry__.queries()


def _force(df) -> None:
    """Materialize the full plan (noop sink — no driver collect)."""
    df.write.format("noop").mode("overwrite").save()


def bench_rule_suite(spark, n_files: int, seed: int = 42) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from opengauss_tools_datachecker_spark.fixtures import bucket_of
    from opengauss_tools_datachecker_spark.operators.drift import histogram_cube

    cache = f"/tmp/datachecker_bench/files_{n_files}_{seed}"
    if not os.path.isdir(cache + "/files"):
        files = fx.repo_files(spark, n_files, n_repos=200, seed=seed, n_buckets=32)
        n_out = max(64, n_files // 62500)  # balanced splits drive scan parallelism
        files.repartition(n_out).write.mode("overwrite").parquet(cache + "/files")
        fx.manifest(spark.read.parquet(cache + "/files")).repartition(n_out).write.mode(
            "overwrite"
        ).parquet(cache + "/manifest")
    if not os.path.isdir(cache + "/baseline_cube"):
        base = spark.read.parquet(cache + "/files")
        histogram_cube(base, "lang", F.length("content"), by="bucket").coalesce(1).write.mode(
            "overwrite"
        ).parquet(cache + "/baseline_cube")
    files = spark.read.parquet(cache + "/files")
    manifest = spark.read.parquet(cache + "/manifest")
    corrupted, _ = fx.flip_bytes(files, 0.0001)

    def suite():
        ctx = CheckContext(
            spark=spark,
            files=corrupted,
            manifest=manifest,
            baseline_cube=spark.read.parquet(cache + "/baseline_cube"),
            n_buckets=32,
        )
        run_suite(ctx).unpersist_all()  # materializes every rule + verdicts

    suite()  # steady state: C2 JIT + python workers + page cache
    # min of 3 timed runs: this host shows intermittent hypervisor CPU
    # steal (BENCH/BASELINE.md) — the same warmed suite has measured
    # anywhere from 12.9s to 29.3s run-to-run; the minimum is the
    # reproducible steady-state cost, the rest is one-sided noise
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        suite()
        best = min(best, time.time() - t0)
    return best, n_files


def main() -> None:
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # 2M rows keeps the suite measurement compute-dominated (at 500k,
    # per-stage fixed costs are a visible share of the wall time);
    # generation is cached to parquet and excluded from timing
    n_files = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "2000000"))
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        # modest heap: big G1 young gens + 32 ergonomics CPUs + steal = GC storms
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")},
    )

    timings: dict[str, float] = {}
    suite_sec, n = bench_rule_suite(spark, n_files)
    timings["rule_suite"] = round(suite_sec, 3)

    # steady-state per query: first run compiles the plan's codegen
    # classes and spawns python workers; report the fastest of the two
    # (min, not last — one-sided steal noise, see the suite note)
    qs = entrymod.queries()
    for name in qs:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _force(qs[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        # queries that persist internal frames re-persist per call;
        # drop orphaned cache entries between queries so storage memory
        # stays bounded across the 50-query sweep (outside the timing)
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_sec_full_rule_suite_plus_headline_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "files_per_sec": round(n / suite_sec, 1),
        "n_files": n,
        "cpus": int(cpus),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
