"""Central registry mapping query names -> (PySpark callable, DuckDB oracle
SQL). ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this. Query modules self-register at import time via the ``@register``
decorator; oracle SQL of ``None`` marks a genuinely non-SQL-expressible
operator (the driver then records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}

_QUERY_MODULES = (
    "kinesis_demo_spark.queries.reference_parity",
    "kinesis_demo_spark.queries.relational",
    "kinesis_demo_spark.queries.dedup",
    "kinesis_demo_spark.queries.similarity",
    "kinesis_demo_spark.queries.text",
    "kinesis_demo_spark.queries.multimodal",
    "kinesis_demo_spark.queries.streaming_parity",
    "kinesis_demo_spark.queries.sessions",
    "kinesis_demo_spark.queries.analytics",
    "kinesis_demo_spark.queries.scalar_extended",
    "kinesis_demo_spark.queries.wire",
    "kinesis_demo_spark.queries.udfs",
    "kinesis_demo_spark.queries.reshape",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def _load() -> None:
    for mod in _QUERY_MODULES:
        import_module(mod)


def all_queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def all_oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLE)
