"""Smoke test mirroring the driver's t1 gate."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"user_id", "x", "y", "cnt"}


def test_contract_shapes():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert q, "queries() must not be empty"
    assert set(o) <= set(q)
