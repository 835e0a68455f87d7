from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from sales_etl_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    spark = get_spark(
        "sales-etl-spark-tests", master="local[4]", shuffle_partitions=8
    )
    # Route Derby's engine home (where derby.log lands) into tmp BEFORE
    # any JDBC test can boot the embedded engine — otherwise the log
    # litters the repo root (cwd). Individual tests may re-point it at
    # their own tmp_path; the engine only reads it at first boot.
    spark._jvm.java.lang.System.setProperty(
        "derby.system.home", str(tmp_path_factory.mktemp("derby"))
    )
    yield spark
    spark.stop()
