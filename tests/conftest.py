from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from etl_sql_and_pyspark_developement__spark.session import get_spark

    warehouse = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        "engine-tests",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"),
        extra_conf={"spark.sql.warehouse.dir": str(warehouse)},
    )
    if os.environ.get("SPARK_GRAFT_ROCKSDB"):
        # Run every streaming test against the RocksDB state store —
        # the provider the bounded-state claims are documented against
        # (SPARK_GRAFT_ROCKSDB=1 python -m pytest tests/test_streaming.py).
        from etl_sql_and_pyspark_developement__spark.session import (
            enable_rocksdb_state_store,
        )

        enable_rocksdb_state_store(s)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
