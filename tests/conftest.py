import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_etl_customer360_spark.session import get_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = get_session(
        app_name="c360-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.driver.memory": "4g",
            # saveAsTable targets (bucketed-table tests) go to tmp, not cwd
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="c360-warehouse-"),
        },
    )
    yield s


SF_DIR = os.environ.get("C360_TEST_SF_DIR", "/root/testdata/sf0.001")
