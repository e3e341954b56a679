from __future__ import annotations

import pytest

from ttmf_spark.session import get_spark

SF_UNIT = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # few shuffle partitions: test fixtures are tiny, task-launch overhead
    # dominates — 4 partitions makes the suite several times faster than 16
    s = get_spark(app_name="ttmf_spark_tests", cores=16, shuffle_partitions=4)
    yield s
    s.stop()
