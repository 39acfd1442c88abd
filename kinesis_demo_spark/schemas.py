"""Declared StructType schemas for every fixture table plus the reference's
implicit record shapes (SURVEY.md §1.2: the reference is schemaless JSON; we
pin fixed schemas and use from_json for the loosely-typed payload column).

Reference shapes: movement record ``{X:int, Y:int, Time: epoch-ms long}``
(reference web/assets/js/functions.js:252-256) and the per-(user, 1s-window)
aggregate row ``{user_id, window_start, count, movs}`` (functions.js:168-175,
361-377, reconstructed Lambda output).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference-implied shapes -------------------------------------------------

MOVEMENT = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("X", T.IntegerType(), False),
        T.StructField("Y", T.IntegerType(), False),
        T.StructField("Time", T.LongType(), False),  # epoch millis event time
    ]
)

MOV_STRUCT = T.StructType(
    [
        T.StructField("Time", T.LongType(), False),
        T.StructField("X", T.IntegerType(), False),
        T.StructField("Y", T.IntegerType(), False),
    ]
)

MOVEMENT_AGGREGATE = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("window_start", T.TimestampType(), False),
        T.StructField("count", T.LongType(), False),
        T.StructField("movs", T.ArrayType(MOV_STRUCT), False),
    ]
)

# JSON payload carried by events.props (exercises from_json / F10).
PROPS = T.StructType([T.StructField("k", T.LongType(), True)])

# --- driver parquet fixtures (FIXTURES.md §B) ---------------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), False),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("n_chars", T.LongType(), False),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), False),
    ]
)

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
