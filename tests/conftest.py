import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from artemis_spark.session import get_spark  # noqa: E402
from artemis_spark.datagen import generate  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("artemis_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tiny_web(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("web_tiny"))
    generate("tiny", out)
    return out


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
