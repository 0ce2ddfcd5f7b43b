from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bankcreditunion_datapipeline_spark.session import build_session

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    spark = build_session(
        app_name="tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-")},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF0001
