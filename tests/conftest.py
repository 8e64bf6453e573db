from __future__ import annotations

import os

import pytest

from dsacord_spark.session import get_spark

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "postgres: live-Postgres integration (boots a scratch cluster; "
        "skips when binaries/service user unavailable)",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="dsacord-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
