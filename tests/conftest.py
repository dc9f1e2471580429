from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from cellphe_data_pipeline_spark.session import get_spark

    s = get_spark(app_name="cellphe-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
