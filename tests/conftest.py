import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from artemis_spark.session import get_spark  # noqa: E402
from artemis_spark.datagen import generate  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # 16g: the round loop runs its state writes concurrently (url_seen /
    # host_stats / frontier / bloom / robots futures) and a whole suite
    # shares one JVM; 8g leaves the unified memory pool execution-starved
    # ("Unable to acquire ... got 0") on the recrawl-heavy delta tests.
    os.environ.setdefault("ARTEMIS_DRIVER_MEM", "16g")
    s = get_spark("artemis_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(autouse=True)
def _clear_spark_cache(request):
    """Persisted plans (each CrawlEngine pins its web/payload caches)
    outlive the engine object in the shared session's CacheManager;
    across a whole suite they accumulate until the 8g test JVM OOMs.
    Drop them after every test that touched the session."""
    yield
    if "spark" in request.fixturenames:
        request.getfixturevalue("spark").catalog.clearCache()


@pytest.fixture(scope="session")
def tiny_web(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("web_tiny"))
    generate("tiny", out)
    return out


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
