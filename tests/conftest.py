from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nhl_data_pipeline_spark.session import get_spark  # noqa: E402

TEST_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    from nhl_data_pipeline_spark.plans.parity import duck_connection

    return duck_connection(TEST_SF_DIR)
