"""Synthetic unbounded stream source: the rate source shaped into the
events schema — the throughput-testing stand-in for the Kinesis/Kafka
producer (reference client, functions.js:190-233). Deterministic per
``value`` (the rate source's monotonically increasing row id), so downstream
aggregates are reproducible for any consumed prefix.

In production the swap is one line: ``spark.readStream.format("kinesis")``
(or kafka) with the same downstream plan — sources are config, plans are
code."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_synthetic_events(
    spark: SparkSession, rows_per_second: int = 10_000, n_users: int = 150
) -> DataFrame:
    """rate -> events(event_id, ts, user_id, event_type, value, props)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    event_type = F.element_at(
        F.array(F.lit("click"), F.lit("view"), F.lit("scroll"), F.lit("move"), F.lit("error")),
        (F.col("value") % 5).cast("int") + 1,
    )
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % n_users).alias("user_id"),
        event_type.alias("event_type"),
        ((F.col("value") % 10_000) / 100.0).alias("value"),
        F.to_json(F.struct((F.col("value") % 100).alias("k"))).alias("props"),
    )
