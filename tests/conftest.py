from __future__ import annotations

import pytest

from sparkroach.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sparkroach-tests", shuffle_partitions=8)
    yield s
