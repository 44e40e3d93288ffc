from __future__ import annotations

import pytest

from whylogs_java_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("whylogs-java-spark-tests", master="local[4]")
    yield s
    s.stop()
