from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fineventstream_spark.catalog import TABLES
from fineventstream_spark.session import get_spark

# sf0.001 keeps the suite fast for iteration; CI/driver parity runs use
# SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # 8 cores / 8g keeps parallel pytest invocations friendly; large-sf
    # sweeps override via env (SPARK_GRAFT_TEST_CPUS=32 halves the sf1
    # suite wall time)
    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    mem = os.environ.get("SPARK_GRAFT_TEST_MEM", "8g")
    s = get_spark(app_name="fes-tests", cpus=cpus, driver_memory=mem)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()
