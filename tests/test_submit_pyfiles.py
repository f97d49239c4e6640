"""north_rule evidence: the engine runs via `spark-submit --py-files
<pkg.zip>` with the package resolved ONLY from the shipped zip (driver
runs from an empty cwd, no repo on sys.path) — the documented
multi-executor submission path."""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

DRIVER = """
from opengauss_tools_datachecker_spark import get_spark, fixtures as fx, run_suite
from opengauss_tools_datachecker_spark.plans.rule import CheckContext

spark = get_spark(master="local[4]", shuffle_partitions=8)
clean = fx.repo_files(spark, 2000, n_repos=20, n_buckets=8).cache()
corrupted, exp = fx.flip_bytes(clean, 0.01)
ctx = CheckContext(spark=spark, files=corrupted, manifest=fx.manifest(clean),
                   commits=fx.repo_commits(clean), baseline=clean, n_buckets=8)
res = run_suite(ctx)
print("PYFILES_RESULT", res.violations.count(), exp.count(), res.failed)
"""


def test_spark_submit_py_files(tmp_path):
    pkg_zip = shutil.make_archive(
        str(tmp_path / "pkg"), "zip",
        root_dir=str(REPO), base_dir="opengauss_tools_datachecker_spark",
    )
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    spark_submit = shutil.which("spark-submit") or str(
        Path(sys.executable).parent / "spark-submit"
    )
    r = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", pkg_zip, str(driver)],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("PYFILES_RESULT")][0]
    _, n_viol, n_exp, failed = line.split()
    assert n_viol == n_exp and failed == "True"
