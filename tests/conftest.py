from __future__ import annotations

import pytest

import tamer_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = tamer_spark.get_spark("tamer-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
