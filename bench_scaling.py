#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule's "N vs 4N executors, efficiency ≥0.8" criterion cannot use a
real cluster in this sandbox; the sanctioned proxy is the same job at
two parallelism levels on identical input: local[8] vs local[32].
Each level runs the full rule suite in a FRESH subprocess (own JVM) so
JIT/page-cache state can't leak between measurements; the synthetic
input parquet is generated once and shared.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from opengauss_tools_datachecker_spark import fixtures as fx
from opengauss_tools_datachecker_spark.plans.rule import CheckContext
from opengauss_tools_datachecker_spark.plans.runner import run_suite
from opengauss_tools_datachecker_spark.session import get_spark

cpus = int(sys.argv[1]); cache = sys.argv[2]; n_files = int(sys.argv[3])
spark = get_spark(app_name=f"scaling-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus,
                  extra_conf={{"spark.driver.memory": "32g"}})
files = spark.read.parquet(cache + "/files")
manifest = spark.read.parquet(cache + "/manifest")
commits = fx.repo_commits(files)
corrupted, _ = fx.flip_bytes(files, 0.0001)
ctx = CheckContext(spark=spark, files=corrupted, manifest=manifest,
                   commits=commits, baseline=files, n_buckets=32)
# warmup pass amortizes JVM/JIT startup out of the measurement
run_suite(ctx)
t0 = time.time()
res = run_suite(ctx)
res.violations.write.format("noop").mode("overwrite").save()
dt = time.time() - t0
print(json.dumps({{"cpus": cpus, "sec": dt, "files_per_sec": n_files / dt}}))
spark.stop()
"""


def _run_level(cpus: int, cache: str, n_files: int) -> dict:
    script = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), cache, str(n_files)],
        capture_output=True, text=True, timeout=1800,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_files = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "500000"))
    cache = f"/tmp/datachecker_bench/files_{n_files}_42"
    if not os.path.isdir(cache + "/files"):
        # one-off generation in its own session
        from opengauss_tools_datachecker_spark import fixtures as fx
        from opengauss_tools_datachecker_spark.session import get_spark

        spark = get_spark(app_name="gen", master="local[32]", shuffle_partitions=32,
                          extra_conf={"spark.driver.memory": "32g"})
        files = fx.repo_files(spark, n_files, n_repos=200, seed=42, n_buckets=32)
        files.write.mode("overwrite").parquet(cache + "/files")
        fx.manifest(spark.read.parquet(cache + "/files")).write.mode("overwrite").parquet(
            cache + "/manifest")
        spark.stop()

    low = _run_level(8, cache, n_files)
    high = _run_level(32, cache, n_files)
    efficiency = (high["files_per_sec"] / low["files_per_sec"]) / (32 / 8)
    result = {
        "n_files": n_files,
        "local8_sec": round(low["sec"], 2),
        "local8_files_per_sec": round(low["files_per_sec"], 1),
        "local32_sec": round(high["sec"], 2),
        "local32_files_per_sec": round(high["files_per_sec"], 1),
        "scaling_efficiency": round(efficiency, 3),
        "passes_0_8": efficiency >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH/BASELINE — measured throughput + scaling efficiency\n\n"
            "Full validation rule suite (sha256 + uniqueness + referential +\n"
            "column stats + drift) over the deterministic synthetic repo-files\n"
            "table (seed 42), identical input at two parallelism levels — the\n"
            "sandbox proxy for N vs 4N executors (BASELINE.json north_rule).\n"
            "Measured after a warmup pass, fresh JVM per level.\n\n"
            f"| metric | value |\n|---|---|\n"
            f"| input rows (files) | {n_files:,} |\n"
            f"| local[8] wall | {result['local8_sec']} s |\n"
            f"| local[8] throughput | {result['local8_files_per_sec']:,} files/sec |\n"
            f"| local[32] wall | {result['local32_sec']} s |\n"
            f"| local[32] throughput | {result['local32_files_per_sec']:,} files/sec |\n"
            f"| scaling efficiency (T8/T32)/4 | **{result['scaling_efficiency']}** |\n"
            f"| ≥ 0.8 required | {'PASS' if result['passes_0_8'] else 'FAIL'} |\n"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
