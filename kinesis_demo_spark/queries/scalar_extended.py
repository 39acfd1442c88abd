"""Extended scalar-function parity battery #2 (beyond the reference's F1-F15,
which reference_parity.scalar_functions_parity covers): strings, date/time
parts, math, bit ops, conditionals, and cryptographic digests — one wide
projection over the events fixture, every column value-hash compared against
DuckDB, plus a separate array battery over the tokenized documents.

Functions chosen are the deterministic, correctly-rounded subset where both
engines are bit-identical by spec (no libm transcendentals like exp/ln —
their last-ulp rounding is libm-version-dependent and would make the
differential gate flaky).

Round 3 note: the former per-family queries (scalar_string_functions /
scalar_datetime_functions / scalar_math_bit_functions) are fused into the
single ``scalar_extended_battery`` projection so the whole family lands one
hard-signal row inside the driver's 50-query CORRECTNESS cap. Column
coverage is identical (the ``lo``/``hi`` aliases of the old math battery are
renamed ``lo50``/``hi50`` to avoid colliding with the string battery's
``lo``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..registry import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "scalar_extended_battery",
    oracle="""
SELECT event_id,
       -- strings
       upper(event_type) AS up, lower('ABC' || event_type) AS lo,
       trim('  ' || event_type || ' ') AS trimmed,
       lpad(event_type, 10, '*') AS lpadded,
       rpad(event_type, 10, '#') AS rpadded,
       CAST(strpos(event_type, 'i') AS INT) AS pos_i,
       replace(event_type, 'i', 'y') AS replaced,
       translate(event_type, 'aeiou', '01234') AS translated,
       repeat(event_type, 2) AS repeated,
       reverse(event_type) AS reversed,
       left(event_type, 3) AS l3, right(event_type, 3) AS r3,
       CAST(ascii(event_type) AS INT) AS first_code,
       chr(65 + CAST(event_id % 26 AS INT)) AS letter,
       CAST(levenshtein(event_type, 'click') AS INT) AS lev_click,
       CAST(length(event_type) AS INT) AS len,
       substr(event_type, 2, 3) AS sub23,
       event_type LIKE '%ick%' AS like_ick,
       regexp_matches(event_type, '^[cv]') AS starts_cv,
       -- date/time
       CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS mo,
       CAST(day(ts) AS INT) AS d,
       CAST(hour(ts) AS INT) AS h, CAST(minute(ts) AS INT) AS mi,
       CAST(dayofyear(ts) AS INT) AS doy,
       CAST(weekofyear(ts) AS INT) AS woy,
       CAST(isodow(ts) AS INT) AS iso_dow,
       CAST(quarter(ts) AS INT) AS q,
       last_day(CAST(ts AS DATE)) AS eom,
       CAST(ts AS DATE) + 7 AS plus_week,
       CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS days_since,
       date_trunc('hour', ts) AS hour_bucket,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_bucket,  -- DuckDB yields DATE here, Spark TIMESTAMP
       strftime(ts, '%Y-%m-%d %H:%M') AS formatted,
       -- math / bit / conditional / digest
       abs(value - 100.0) AS absv,
       CAST(ceil(value / 7.0) AS BIGINT) AS ceiled,
       CAST(floor(value / 7.0) AS BIGINT) AS floored,
       sqrt(value) AS rooted,
       CAST(sign(value - 100.0) AS BIGINT) AS sgn,
       greatest(value, 50.0) AS hi50, least(value, 50.0) AS lo50,
       event_id % 7 AS m7,
       ((event_id - 500) % 7 + 7) % 7 AS pm7,
       event_id & 255 AS band, event_id | 4096 AS bor,
       xor(event_id, 1365) AS bxor,
       CAST(bit_count(event_id) AS INT) AS popcount,
       coalesce(nullif(event_type, 'error'), 'was_error') AS cond,
       CASE WHEN value > 100 THEN 'hi' WHEN value > 10 THEN 'mid' ELSE 'lo' END AS bucket,
       sha256(event_type) AS digest
FROM events
""",
)
def scalar_extended_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # weekday() is Monday=0; +1 matches DuckDB's isodow (Monday=1)
    return _events(spark, sf_dir).select(
        "event_id",
        # strings
        F.upper("event_type").alias("up"),
        F.lower(F.concat(F.lit("ABC"), F.col("event_type"))).alias("lo"),
        F.trim(F.concat(F.lit("  "), F.col("event_type"), F.lit(" "))).alias("trimmed"),
        F.lpad("event_type", 10, "*").alias("lpadded"),
        F.rpad("event_type", 10, "#").alias("rpadded"),
        F.instr("event_type", "i").alias("pos_i"),
        F.replace("event_type", F.lit("i"), F.lit("y")).alias("replaced"),
        F.translate("event_type", "aeiou", "01234").alias("translated"),
        F.repeat("event_type", 2).alias("repeated"),
        F.reverse("event_type").alias("reversed"),
        F.expr("left(event_type, 3)").alias("l3"),
        F.expr("right(event_type, 3)").alias("r3"),
        F.ascii("event_type").alias("first_code"),
        F.chr(F.lit(65) + (F.col("event_id") % 26)).alias("letter"),
        F.levenshtein("event_type", F.lit("click")).alias("lev_click"),
        F.length("event_type").alias("len"),
        F.substring("event_type", 2, 3).alias("sub23"),
        F.col("event_type").like("%ick%").alias("like_ick"),
        F.col("event_type").rlike("^[cv]").alias("starts_cv"),
        # date/time
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.dayofyear("ts").alias("doy"),
        F.weekofyear("ts").alias("woy"),
        (F.weekday("ts") + 1).alias("iso_dow"),
        F.quarter("ts").alias("q"),
        F.last_day(F.col("ts").cast("date")).alias("eom"),
        F.date_add(F.col("ts").cast("date"), 7).alias("plus_week"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("days_since"),
        F.date_trunc("hour", "ts").alias("hour_bucket"),
        F.date_trunc("day", "ts").alias("day_bucket"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("formatted"),
        # math / bit / conditional / digest
        F.abs(F.col("value") - 100.0).alias("absv"),
        F.ceil(F.col("value") / 7.0).alias("ceiled"),
        F.floor(F.col("value") / 7.0).alias("floored"),
        F.sqrt("value").alias("rooted"),
        F.signum(F.col("value") - 100.0).cast("long").alias("sgn"),
        F.greatest("value", F.lit(50.0)).alias("hi50"),
        F.least("value", F.lit(50.0)).alias("lo50"),
        (F.col("event_id") % 7).alias("m7"),
        F.pmod(F.col("event_id") - 500, F.lit(7)).alias("pm7"),
        F.expr("event_id & 255").alias("band"),
        F.expr("event_id | 4096").alias("bor"),
        F.expr("event_id ^ 1365").alias("bxor"),
        F.bit_count("event_id").alias("popcount"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("was_error")).alias("cond"),
        F.when(F.col("value") > 100, "hi").when(F.col("value") > 10, "mid").otherwise("lo").alias("bucket"),
        F.sha2("event_type", 256).alias("digest"),
    )


@register(
    "scalar_array_functions",
    oracle="""
SELECT doc_id,
       list_sort(string_split(text, ' '))[1] AS first_sorted,
       len(list_distinct(string_split(text, ' '))) AS n_distinct,
       list_contains(string_split(text, ' '), 'data') AS has_data,
       CAST(list_position(string_split(text, ' '), 'data') AS INT) AS data_pos,
       array_to_string(string_split(text, ' ')[1:3], '_') AS first3_joined,
       list_sort(string_split(text, ' '))[len(string_split(text, ' '))] AS last_sorted
FROM documents
""",
)
def scalar_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family over real array data (the tokenized documents).
    list_position/array_position are both 1-based with 0/NULL-free semantics
    pinned by the differential check."""
    toks = F.split(F.col("text"), " ")
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.element_at(F.array_sort(toks), 1).alias("first_sorted"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_position(toks, "data").cast("int").alias("data_pos"),
        # concat_ws is the one array function here that NEVER returns NULL
        # (NULL array -> ''), while array_to_string(NULL) IS NULL — gate it
        # so a NULL-text doc yields NULL on both engines
        F.when(toks.isNotNull(), F.concat_ws("_", F.slice(toks, 1, 3))).alias(
            "first3_joined"
        ),
        F.element_at(F.array_sort(toks), F.size(toks)).alias("last_sorted"),
    )
