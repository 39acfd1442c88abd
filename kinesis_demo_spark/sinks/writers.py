"""Sinks (SURVEY.md §2.1 S4/S5): partitioned lake writes, JSON-lines wire
output, and bucketed tables for zero-shuffle joins.

Scale notes baked into each writer:
- partitioned parquet: partition column choice bounds both file counts and
  partition-pruning effectiveness; per-partition file counts are controlled
  upstream (repartition on the partition key before write) so a 1000-executor
  job doesn't emit 1000 files per partition.
- JSON lines: the reference's wire format (functions.js:211); one object per
  line so downstream consumers can split files.
- bucketed tables: pre-shuffled storage — two tables bucketed on the same
  key join with NO exchange on either side (tests/test_sources.py asserts
  the plan), which is the single biggest join optimization available for a
  repeatedly-joined 100 TB fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_partitioned_parquet(df: DataFrame, path: str, partition_col: str) -> None:
    """One output dir per partition value; rows pre-clustered so each
    partition writes one file per shuffle partition that actually holds it."""
    df.repartition(F.col(partition_col)).write.mode("overwrite").partitionBy(
        partition_col
    ).parquet(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_wire_records(events: DataFrame, path: str) -> None:
    """S4 ingest-sink parity: one JSON wire string per record, partitioned by
    the stream key — the file-sink stand-in for PutRecords(PartitionKey)."""
    wire = events.select(
        "user_id",
        F.to_json(F.struct("event_id", "ts", "event_type", "value")).alias("wire"),
    )
    wire.repartition(F.col("user_id")).write.mode("overwrite").partitionBy("user_id").json(path)


def write_bucketed_table(df: DataFrame, name: str, bucket_col: str, n_buckets: int = 8) -> None:
    """Persist pre-shuffled by join key: subsequent equi-joins between tables
    bucketed on the same key skip both exchanges entirely."""
    df.write.mode("overwrite").bucketBy(n_buckets, bucket_col).sortBy(bucket_col).saveAsTable(name)
