import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pycrawler_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="pycrawler-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    """Small deterministic corpus shared by tests."""
    from pycrawler_spark.sources.corpus import generate_corpus

    pages, seeds, robots = generate_corpus(
        seed=42, n_hosts=6, pages_per_host=12, mega_factor=4
    )
    return pages, seeds, robots
