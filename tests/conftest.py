import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from data_warehouse_migrate_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dwms-tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
