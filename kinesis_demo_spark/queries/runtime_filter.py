"""Runtime-filter (Bloom) semi-join pre-filtering, built as pure column
algebra so both engines compute the IDENTICAL filter — the pattern Spark's
adaptive runtime filters apply internally (and Delta/Iceberg data skipping
approximates with file stats), surfaced as a first-class, value-hash-checked
operator with its false-positive rate measured in the output.

Shape at 100 TB: the build side's keys hash into a fixed-size bit array
(aggregated with per-word bit_or — map-side combinable, ~KB total however
many keys), the bit array broadcasts, and the probe side is screened by k
bit tests per row BEFORE the exact semi join — so the expensive join only
sees bloom survivors. The bloom is conservative (no false negatives), so
the final output is exactly the plain semi join's; what the filter buys is
probe-side volume, which the summary row quantifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import h60, h60_sql
from ..io import load_table
from ..registry import register

BLOOM_BITS = 65536          # m: total bits
BLOOM_WORD_BITS = 32        # stored as BIGINT words holding 32 bits -> shifts
BLOOM_WORDS = BLOOM_BITS // BLOOM_WORD_BITS
BLOOM_K = 3                 # hash functions
ACCTBAL_MIN = 9000.0        # selective build-side predicate


def _positions_sql(key: str) -> list[str]:
    out = []
    for i in range(BLOOM_K):
        salted = "'b" + str(i) + "|' || CAST(" + key + " AS VARCHAR)"
        out.append(f"{h60_sql(salted)} % {BLOOM_BITS}")
    return out


@register(
    "bloom_prefilter_semi_join",
    oracle=f"""
WITH build AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > {ACCTBAL_MIN}
),
bits AS (
  SELECT p // {BLOOM_WORD_BITS} AS word, bit_or(1 << (p % {BLOOM_WORD_BITS})) AS bv
  FROM (
    SELECT unnest([{", ".join(_positions_sql('c_custkey'))}]) AS p FROM build
  )
  GROUP BY 1
),
probe AS (
  SELECT o.o_orderkey, o.o_custkey,
         [{", ".join(_positions_sql('o.o_custkey'))}] AS ps
  FROM orders o
),
tested AS (
  SELECT p.o_orderkey, p.o_custkey,
         (SELECT count(*) FROM unnest(p.ps) AS t(pp)
          JOIN bits b ON pp // {BLOOM_WORD_BITS} = b.word
          WHERE (b.bv & (1 << (pp % {BLOOM_WORD_BITS}))) <> 0) AS hits
  FROM probe p
),
cand AS (
  SELECT o_orderkey, o_custkey FROM tested WHERE hits = {BLOOM_K}
),
exact AS (
  SELECT c.o_orderkey FROM cand c JOIN build b ON c.o_custkey = b.c_custkey
)
SELECT (SELECT count(*) FROM orders) AS n_probe,
       (SELECT count(*) FROM build) AS n_build_keys,
       (SELECT count(*) FROM cand) AS n_bloom_pass,
       (SELECT count(*) FROM exact) AS n_exact,
       (SELECT count(*) FROM cand) - (SELECT count(*) FROM exact) AS n_false_positives
""",
)
def bloom_prefilter_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi join, end to end: build a {BLOOM_BITS}-bit /
    {BLOOM_K}-hash filter over the selective customer set, screen every
    order with {BLOOM_K} bit tests against the broadcast bit array, and
    exact-semi-join only the survivors. Deterministic md5-derived hashing
    makes the filter bit-identical in DuckDB, so even the false-positive
    count is value-hash checked. Bits live {BLOOM_WORD_BITS} per BIGINT
    word (max set bit 2^31), keeping every shift inside both engines'
    exact range — a 1<<63 word would wrap negative in Spark and overflow
    in DuckDB."""
    build = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > ACCTBAL_MIN
    ).select("c_custkey")

    def positions(key):
        return [
            h60(F.concat(F.lit(f"b{i}|"), key.cast("string"))) % BLOOM_BITS
            for i in range(BLOOM_K)
        ]

    bits = (
        build.select(F.explode(F.array(*positions(F.col("c_custkey")))).alias("p"))
        .select(
            (F.col("p") / BLOOM_WORD_BITS).cast("long").alias("word"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {BLOOM_WORD_BITS} AS INT))").alias("bv"),
        )
        .groupBy("word")
        .agg(F.bit_or("bv").alias("bv"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    probe = orders.select(
        "o_orderkey",
        "o_custkey",
        F.posexplode(F.array(*positions(F.col("o_custkey")))).alias("i", "p"),
    ).select(
        "o_orderkey",
        "o_custkey",
        (F.col("p") / BLOOM_WORD_BITS).cast("long").alias("word"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {BLOOM_WORD_BITS} AS INT))").alias("mask"),
    )
    hits = (
        probe.join(F.broadcast(bits), "word")
        .filter((F.col("bv").bitwiseAND(F.col("mask"))) != 0)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") == BLOOM_K)
        .select("o_orderkey", "o_custkey")
    )
    exact = hits.join(build, hits.o_custkey == build.c_custkey, "left_semi")
    return (
        orders.agg(F.count(F.lit(1)).alias("n_probe"))
        .crossJoin(F.broadcast(build.agg(F.count(F.lit(1)).alias("n_build_keys"))))
        .crossJoin(F.broadcast(hits.agg(F.count(F.lit(1)).alias("n_bloom_pass"))))
        .crossJoin(F.broadcast(exact.agg(F.count(F.lit(1)).alias("n_exact"))))
        .select(
            "n_probe",
            "n_build_keys",
            "n_bloom_pass",
            "n_exact",
            (F.col("n_bloom_pass") - F.col("n_exact")).alias("n_false_positives"),
        )
    )
