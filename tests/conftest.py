"""Shared fixtures: one SparkSession per test session, parity helpers."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from quackspark.session import get_session

    s = get_session("quackspark-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s
