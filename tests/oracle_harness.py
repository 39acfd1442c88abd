"""Local mirror of the driver's correctness gate: run each registered PySpark
query and its DuckDB oracle SQL on the same parquet fixtures and compare
row count, column names, and order-insensitive values.

Comparison is strict by default (exact equality after canonicalization);
floats tolerate only tiny relative error so genuine semantic drift fails
loudly while cross-engine last-ulp noise does not.
"""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, Decimal):
        return ("f", float(v))
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    return ("s", str(v))


def _values_match(a, b, rel_tol=1e-9) -> bool:
    if a == b:
        return True
    if a[0] == "f" and b[0] == "f":
        return math.isclose(a[1], b[1], rel_tol=rel_tol, abs_tol=1e-12)
    if a[0] == "l" and b[0] == "l" and len(a[1]) == len(b[1]):
        return all(_values_match(x, y, rel_tol) for x, y in zip(a[1], b[1]))
    return False


def compare(spark_df, con, sql: str, name: str = "?") -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    spark_rows = spark_df.collect()
    spark_cols = list(spark_df.columns)

    res = con.execute(sql)
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = res.fetchall()

    if sorted(spark_cols) != sorted(oracle_cols):
        problems.append(f"{name}: columns differ spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
        return problems
    if len(spark_rows) != len(oracle_rows):
        problems.append(f"{name}: row count spark={len(spark_rows)} oracle={len(oracle_rows)}")

    order = sorted(spark_cols)
    s_idx = [spark_cols.index(c) for c in order]
    o_idx = [oracle_cols.index(c) for c in order]
    s_canon = sorted(tuple(_canon(r[i]) for i in s_idx) for r in spark_rows)
    o_canon = sorted(tuple(_canon(r[i]) for i in o_idx) for r in oracle_rows)

    n_bad = 0
    for srow, orow in zip(s_canon, o_canon):
        if not all(_values_match(a, b) for a, b in zip(srow, orow)):
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"{name}: row mismatch spark={srow} oracle={orow}")
    if n_bad > 3:
        problems.append(f"{name}: ... {n_bad} mismatched rows total")
    return problems
