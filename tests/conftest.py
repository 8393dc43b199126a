from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipelinerepo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_collection_modifyitems(config, items):
    """Gate the slow scale blocks (sf0.1/sf1 oracle parity) behind an
    explicit opt-in so a plain ``pytest tests/`` finishes in minutes.

    The blocks still run with ``SPARK_GRAFT_SLOW=1`` or an explicit
    ``-m slow`` selection; the documented full-run protocol is
    ``SPARK_GRAFT_SLOW=1 python -m pytest tests/ -q`` (~55 min)."""
    if os.environ.get("SPARK_GRAFT_SLOW") == "1":
        return
    markexpr = config.getoption("-m", default="") or ""
    if "slow" in markexpr and "not slow" not in markexpr:
        return
    skip = pytest.mark.skip(
        reason="slow scale block; set SPARK_GRAFT_SLOW=1 or -m slow to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.shuffle.partitions": "4"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
