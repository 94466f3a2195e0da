from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # tests don't need all 32


@pytest.fixture(scope="session")
def spark():
    from argo_spark.session import get_spark

    s = get_spark("argo_spark-tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()
