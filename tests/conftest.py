from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_recommendation_system_spark.session import (  # noqa: E402
    LOCAL_SF_MAX_PARTITION_BYTES,
    get_spark,
)

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark(
        "tests",
        shuffle_partitions=4,
        max_partition_bytes=LOCAL_SF_MAX_PARTITION_BYTES,
    )
    yield s
    s.stop()
