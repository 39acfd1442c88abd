"""Cross-engine hash parity: the md5-based 60-bit hash and the double fold
must be bit-identical between Spark and DuckDB — every sketch oracle in the
dedup/similarity suites rests on this."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from kinesis_demo_spark.functions.hashing import h60, h60_sql
from kinesis_demo_spark.functions.vectors import dot_fold, dot_fold_sql

SAMPLES = ["", "a", "hello world", "key agg row scan", "x" * 200, "üñïçødé"]


def test_h60_matches_duckdb(spark):
    spark_vals = [
        r[0]
        for r in spark.createDataFrame([(s,) for s in SAMPLES], "s string")
        .select(h60(F.col("s")))
        .collect()
    ]
    con = duckdb.connect()
    duck_vals = [con.execute(f"SELECT {h60_sql('?')}", [s]).fetchone()[0] for s in SAMPLES]
    assert spark_vals == duck_vals
    assert all(0 <= v < 2**60 for v in spark_vals)


def test_dot_fold_matches_duckdb_bit_exact(spark):
    a = [0.1, -0.25, 3.375, 1e-7, -42.0, 0.333333]
    b = [2.5, 0.125, -1.0, 7e6, 0.001, -0.999999]
    spark_val = (
        spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
        .select(dot_fold(F.col("a"), F.col("b")).alias("d"))
        .collect()[0][0]
    )
    con = duckdb.connect()
    duck_val = con.execute(
        f"SELECT {dot_fold_sql('a', 'b')} FROM (SELECT ?::FLOAT[] AS a, ?::FLOAT[] AS b)",
        [a, b],
    ).fetchone()[0]
    assert spark_val == duck_val  # bit-exact, no tolerance


def test_uuid_generate_is_rfc4122_v4(spark):
    from kinesis_demo_spark.queries.reference_parity import uuid_generate

    from .conftest import SF_SMOKE

    rows = uuid_generate(spark, SF_SMOKE).limit(200).collect()
    assert rows
    seen = set()
    for r in rows:
        u = r["uuid"]
        parts = u.split("-")
        assert [len(p) for p in parts] == [8, 4, 4, 4, 12], u
        assert parts[2][0] == "4", f"version nibble must be 4: {u}"
        assert parts[3][0] in "89ab", f"variant bits must be 10xx: {u}"
        int(u.replace("-", ""), 16)  # all-hex
        seen.add(u)
    assert len(seen) == len(rows)  # fresh randomness per row
