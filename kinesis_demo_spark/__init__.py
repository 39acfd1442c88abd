"""kinesis_demo_spark — a PySpark-native analytics engine.

From-scratch, idiomatic-Spark implementation of the query and data-processing
capabilities of the ``dmtraverso/kinesis-demo`` reference (a keyed click-stream
pipeline: micro-batched ingest partitioned by user -> per-user 1-second
tumbling-window aggregates -> queryable serving table with range scans,
ordering, projection, limit -> downstream rollups such as sums, last-N
retention, and a LOCF-imputed position heatmap), extended with
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing) over the driver's document/embedding fixtures.

Everything is plain DataFrame/SQL + Structured Streaming: Catalyst plans the
physical execution (pushdown, pruning, AQE, broadcast), and Python UDFs appear
only where built-ins genuinely cannot express the semantics (Arrow-batched
pandas UDFs, never per-row).
"""

__version__ = "0.1.0"
