from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from wikipedia_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("wdp-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
import pytest

@pytest.fixture(scope="session")
def spark_session_holder(spark):
    return spark
