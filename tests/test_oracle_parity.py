"""Differential test mirroring the driver's t2 gate: every registered query
vs its DuckDB oracle on the same fixtures (sf0.001 by default for speed; set
SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.01 for the driver-scale run)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from kinesis_demo_spark.registry import (
    DRIVER_CORRECTNESS_CAP,
    all_oracle_sql,
    all_queries,
    may_be_empty_at,
)

from .conftest import SF_ORACLE
from .oracle_harness import compare_counted, duckdb_conn

QUERIES = all_queries()
ORACLE = all_oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_ORACLE)
    yield c
    c.close()


IN_CAP = set(list(QUERIES)[:DRIVER_CORRECTNESS_CAP])


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, con):
    df = QUERIES[name](spark, SF_ORACLE)
    if name in IN_CAP:
        # The driver canonicalizes via pandas sort_values + hash_pandas_object,
        # which dies on array/struct/map cells (`unhashable type: 'list'` — the
        # r3 agg_collect_set_event_types red row). No driver-checked query may
        # emit a complex-typed column; encode as sorted scalar joins instead.
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        assert not complex_cols, (
            f"{name} is inside the driver correctness cap but returns "
            f"complex-typed columns {complex_cols}; flatten them "
            f"(e.g. array_join(sort_array(...), '|'))"
        )
    if name not in ORACLE:
        # rows-only check, mirroring the driver's weaker path
        n_rows = df.count()
    else:
        problems, n_rows = compare_counted(df, con, ORACLE[name], name)
        assert not problems, "\n".join(problems)
    # vacuous-green guard (VERDICT r10 #1): a hash match over 0 rows proves
    # nothing — emptiness at this fixture must be declared, with a reason,
    # on registry.MAY_BE_EMPTY
    assert n_rows > 0 or may_be_empty_at(name, SF_ORACLE), (
        f"{name}: ok_but_empty at {SF_ORACLE} and not declared in "
        f"registry.MAY_BE_EMPTY for this fixture"
    )


def test_every_oracle_has_query():
    assert set(ORACLE) <= set(QUERIES)
