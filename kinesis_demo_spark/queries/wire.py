"""Wire-format queries: S4 ingest serialization parity (the reference ships
one JSON string per record, functions.js:211) and the salted-aggregation
skew operator, both oracle-checked.

The roundtrip query proves to_json -> from_json is lossless by emitting the
PARSED fields; the oracle computes the same fields directly, so any loss or
coercion in the JSON path shows up as a value-hash mismatch. (The raw wire
bytes are deliberately not compared — key order/whitespace/float rendering
are engine-specific and semantically irrelevant.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..io import load_table
from ..operators.salting import salted_sum_count
from ..registry import register

_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@register(
    "json_wire_roundtrip",
    oracle="""
SELECT event_id, ts, event_type, value, user_id
FROM events
""",
)
def json_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize each event to the JSON wire record (F9) and parse it back
    (F10); emitting the parsed fields makes the oracle comparison a lossless-
    roundtrip proof. Timestamps carry microseconds through ISO-8601."""
    events = load_table(spark, sf_dir, "events")
    wire = events.select(
        "user_id",
        F.to_json(
            F.struct("event_id", "ts", "event_type", "value"),
            {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"},
        ).alias("wire"),
    )
    parsed = wire.select(
        "user_id",
        F.from_json(
            "wire", _WIRE_SCHEMA, {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}
        ).alias("r"),
    )
    return parsed.select("r.event_id", "r.ts", "r.event_type", "r.value", "user_id")


@register(
    "salted_sum_by_user",
    oracle="""
SELECT user_id,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       count(*) AS n_events
FROM events
GROUP BY user_id
""",
)
def salted_sum_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation (operators/salting.py) vs the oracle's
    plain GROUP BY — proving the skew-safe plan computes identical results.
    Decimal partials make the two-stage sum order-independent and exact."""
    return salted_sum_count(load_table(spark, sf_dir, "events"), "user_id", "value")
