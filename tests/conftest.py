import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shortcut_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("shortcut-spark-tests")
    # tiny fixtures: keep shuffle fan-out small so each job is fast
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s


@pytest.fixture()
def store_path(tmp_path):
    return str(tmp_path / "store")


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
