"""Hostile-NULL parity probes for the r9 ADVICE items: NULL join/agg keys
that no standard fixture carries must not split the engines. Each test
builds a fixture the sweeps don't have (NULL l_partkey, NULL document text,
a 1-document corpus) and runs the driver-faithful compare() on exactly the
queries whose NULL semantics were hardened in r10 — proving the fixes are
load-bearing, not just defensive."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from .oracle_harness import compare, duckdb_conn, TABLES

SF = "/root/testdata/sf0.001"


def _clone_sf(tmp_path_factory, name: str) -> str:
    out = tmp_path_factory.mktemp(name)
    for t in TABLES:
        shutil.copy(f"{SF}/{t}.parquet", str(out / f"{t}.parquet"))
    return str(out)


def _append_rows(path: str, rows: dict) -> None:
    """Append one row (given as column->value, missing columns NULL) to a
    parquet file, preserving its schema."""
    t = pq.read_table(path)
    new_cols = []
    for field in t.schema:
        v = rows.get(field.name)
        new_cols.append(pa.array([v], type=field.type))
    pq.write_table(
        pa.concat_tables([t, pa.table(dict(zip(t.schema.names, new_cols)), schema=t.schema)]),
        path,
    )


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    out = _clone_sf(tmp_path_factory, "hostile_nulls")
    # lineitem row with NULL l_partkey: count(DISTINCT) excludes it in both
    # engines only if the Spark exact side filters NULLs (ADVICE r9 #1)
    _append_rows(f"{out}/lineitem.parquet", {"l_orderkey": 999_999, "l_linenumber": 1})
    # NULL-text document: must drop out of the fertility report on BOTH
    # sides (ADVICE r9 #2)
    _append_rows(f"{out}/documents.parquet", {"doc_id": 999_999, "lang": "en", "source": "srcN"})
    return out


@pytest.fixture(scope="module")
def one_doc_dir(tmp_path_factory):
    out = _clone_sf(tmp_path_factory, "one_doc")
    t = pq.read_table(f"{out}/documents.parquet")
    pq.write_table(t.slice(0, 1), f"{out}/documents.parquet")
    return out


def test_approx_distinct_bound_with_null_partkey(spark, null_dir):
    import __spark_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    con = duckdb_conn(null_dir)
    name = "approx_distinct_error_bound"
    assert not compare(qs[name](spark, null_dir), con, osql[name], name)


def test_approx_distinct_parts_null_symmetry(spark, null_dir):
    # rows-only query: assert the NULL-exclusion invariant directly —
    # exact_parts must equal the NULL-excluding distinct count
    from kinesis_demo_spark.queries.relational import approx_distinct_parts

    row = approx_distinct_parts(spark, null_dir).collect()[0]
    con = duckdb_conn(null_dir)
    exact = con.execute("SELECT count(DISTINCT l_partkey) FROM lineitem").fetchone()[0]
    assert row["exact_parts"] == exact


def test_fertility_report_with_null_text(spark, null_dir):
    import __spark_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    con = duckdb_conn(null_dir)
    name = "tokenizer_fertility_report"
    assert not compare(qs[name](spark, null_dir), con, osql[name], name)


def test_er_blocking_quality_one_doc_corpus(spark, one_doc_dir):
    # 0 candidate pairs and a 0-pair search space: the reduction-ratio
    # denominator is 0 -> both engines must yield NULL, not a div-by-zero
    # or inf (ADVICE r9 #3)
    import __spark_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    con = duckdb_conn(one_doc_dir)
    name = "er_blocking_quality"
    assert not compare(qs[name](spark, one_doc_dir), con, osql[name], name)
    row = qs[name](spark, one_doc_dir).collect()[0]
    assert row["reduction_ratio"] is None and row["pairs_completeness"] is None
