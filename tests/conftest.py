import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dqc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dqc_spark_tests", master="local[4]",
                  shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(autouse=True)
def _release_cached_intermediates():
    """Operators persist multi-consumer intermediates via the cache
    registry; a test session that never releases them accumulates
    cached blocks until the (1 GiB default under spark-submit) driver
    heap OOMs.  Mirror real callers: release after every test."""
    yield
    from dqc_spark.cache import release_all

    release_all()


FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXDIR


def fixture_path(name: str) -> str:
    return os.path.join(FIXDIR, name)
