"""Reshaping operators: grouped set/list collection, positional explode,
pivot (long->wide) and unpivot (wide->long) — the remaining relational-
algebra surface, each with a deterministic DuckDB oracle.

Determinism notes: collected sets/lists are sorted (collect_set order is
undefined); pivot uses an EXPLICIT value list (skips Spark's extra distinct
pass AND keeps the output schema fixed — at 100 TB an implicit pivot is a
full scan just to learn the columns); unpivot's oracle is the classic
UNION ALL expansion."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..registry import register

EVENT_TYPES = ("click", "error", "move", "scroll", "view")
D2 = "decimal(18,2)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "agg_collect_set_event_types",
    oracle="""
SELECT user_id,
       array_to_string(list_sort(coalesce(
         list(DISTINCT event_type) FILTER (event_type IS NOT NULL), []
       )), '|') AS event_types,
       CAST(len(coalesce(
         list(DISTINCT event_type) FILTER (event_type IS NOT NULL), []
       )) AS INT) AS n_types
FROM events
GROUP BY user_id
""",
)
def agg_collect_set_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped distinct collection, sorted for determinism (collect_set
    order is undefined in Spark and arbitrary in DuckDB). Emitted as a
    '|'-joined scalar: the differential harness canonicalizes via pandas
    sort_values, which cannot sort list-valued columns. The oracle filters
    NULL elements explicitly — Spark's collect_set silently drops NULLs
    while DuckDB's list(DISTINCT) keeps them (r8 adversarial sweep:
    phantom +1 in n_types for users with a NULL-typed row)."""
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.array_join(F.sort_array(F.collect_set("event_type")), "|").alias(
                "event_types"
            ),
            F.size(F.collect_set("event_type")).alias("n_types"),
        )
    )


@register(
    "posexplode_document_tokens",
    oracle="""
WITH e AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(string_split(text, ' ')) + 1),
                i -> struct_pack(pos := CAST(i - 1 AS INT),
                                 tok := string_split(text, ' ')[i]))) AS r
  FROM documents WHERE doc_id < 50
)
SELECT doc_id, r.pos AS pos, r.tok AS tok FROM e
""",
)
def posexplode_document_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (token index preserved) — the ordinality-aware
    flatten every tokenizer pipeline needs."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )


@register(
    "pivot_value_by_type_per_user",
    oracle=f"""
SELECT user_id,
       {", ".join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS {t}" for t in EVENT_TYPES)}
FROM events
GROUP BY user_id
""",
)
def pivot_value_by_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide pivot with an explicit value list (single pass, fixed
    schema). NULL where a user has no events of that type — matching the
    oracle's CASE-sum semantics exactly."""
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.sum(F.col("value").cast(D2)).cast("double"))
    )


@register(
    "unpivot_order_amounts",
    oracle="""
SELECT o_orderkey, 'totalprice' AS measure, o_totalprice AS amount FROM orders
UNION ALL
SELECT o_orderkey, 'custkey_as_double', CAST(o_custkey AS DOUBLE) FROM orders
""",
)
def unpivot_order_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot (melt) — oracle is the canonical UNION ALL
    expansion; Spark executes it as a single-pass Expand (each input row
    emitted N times), not N scans."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey_as_double"),
    ).unpivot("o_orderkey", ["totalprice", "custkey_as_double"], "measure", "amount")
