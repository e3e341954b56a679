from __future__ import annotations

import pytest

from ttmf_spark.session import get_spark

SF_UNIT = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ttmf_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
