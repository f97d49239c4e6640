from __future__ import annotations

import pytest

from opengauss_tools_datachecker_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_files(spark):
    from opengauss_tools_datachecker_spark.fixtures import repo_files

    return repo_files(spark, n_rows=2000, n_repos=30, seed=42, n_buckets=8).cache()
