from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from scratchdata_spark.session import get_spark

    spark = get_spark(app_name="scratchdata-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
