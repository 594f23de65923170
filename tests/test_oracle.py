"""Replica of the driver's oracle harness over every registered query.

Runs at sf0.001 by default (fast inner loop); set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to match the driver's scale
before declaring queries.
"""

from __future__ import annotations

import pytest

from shippinglanes_spark.registry import all_queries
from shippinglanes_spark.testing import compare, duckdb_conn

QUERIES = all_queries()


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb_conn(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle(spark, sf_dir, oracle_con, name):
    if not QUERIES[name].declare:
        # environment-gated queries (e.g. transformWithState needs
        # protobuf) have their own importorskip-guarded tests
        pytest.skip(f"{name} is declare=False (environment-gated)")
    report = compare(spark, QUERIES[name], sf_dir, con=oracle_con)
    assert report["rows"] >= 0
