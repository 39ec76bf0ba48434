from __future__ import annotations

import os

import pytest

SF_SMOKE = os.environ.get("DARIADB_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("DARIADB_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from dariadb_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("dariadb-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def oracle_sf_dir() -> str:
    return SF_ORACLE
