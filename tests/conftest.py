from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from spark_streaming_apps_spark.session import get_spark  # noqa: E402
from spark_streaming_apps_spark.sources.tables import load_all  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    return load_all(spark, SF_DIR)
