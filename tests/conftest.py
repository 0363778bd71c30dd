"""Session-scoped SparkSession fixture (the reference uses session-
scoped dask LocalCluster fixtures, tests/conftest.py:72-165)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from marex_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("marex_spark_tests", cores=8, shuffle_partitions=8)
    yield s
