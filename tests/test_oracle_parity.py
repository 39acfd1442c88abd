"""Differential test mirroring the driver's t2 gate: every registered query
vs its DuckDB oracle on the same fixtures (sf0.001 by default for speed; set
SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.01 for the driver-scale run)."""

from __future__ import annotations

import pytest

from kinesis_demo_spark.registry import all_oracle_sql, all_queries

from .conftest import SF_ORACLE
from .oracle_harness import compare, duckdb_conn

QUERIES = all_queries()
ORACLE = all_oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, con):
    df = QUERIES[name](spark, SF_ORACLE)
    if name not in ORACLE:
        # rows-only check, mirroring the driver's weaker path
        assert df.count() >= 0
        return
    problems = compare(df, con, ORACLE[name], name)
    assert not problems, "\n".join(problems)


def test_every_oracle_has_query():
    assert set(ORACLE) <= set(QUERIES)
