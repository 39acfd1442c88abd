"""The engine's core pipeline: keyed event stream -> per-(user, 1 s tumbling
window) aggregates -> queryable serving table.

Maps the driver's ``events`` fixture onto the reference's movement-stream data
model (FIXTURES.md §"Mapping A -> B"): ``ts`` plays the epoch-ms event time
(reference functions.js:54-58,255), ``user_id`` the stream partition key
(functions.js:212), and screen coordinates are derived deterministically from
``event_id`` so heatmap group-bys have realistic key cardinality. The
``'error'`` event type stands in for the idle-heartbeat ``(0,0)`` sentinel the
reference client emits for empty seconds (functions.js:196-204).

Scale notes: the aggregate is a single hash-partitioned shuffle on
``(user_id, window)`` with map-side partial aggregation; at 100 TB this is the
canonical Spark streaming/batch agg shape (no driver-side state, no skew
beyond what AQE's skew-join/partition-split handles). ``collect_list`` state
is bounded by the 1 s window width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Deterministic coordinate derivation (Knuth multiplicative constants).
# Both sides reduce event_id mod M BEFORE multiplying by (MULT % M) —
# mathematically identical to (event_id * MULT) % M but overflow-free for the
# entire BIGINT id range (max intermediate < M^2 < 4e6), so Spark's wrapping
# non-ANSI arithmetic and DuckDB's overflow-checked arithmetic can never
# diverge, at any scale factor.
X_MULT, X_MOD = 2654435761, 1920
Y_MULT, Y_MOD = 1013904223, 1080
SENTINEL_TYPE = "error"  # stands in for the reference's (0,0) idle heartbeat

# SQL fragments kept in one place so every oracle query derives coordinates
# exactly like the Spark plan does.
X_SQL = (
    f"CASE WHEN event_type = '{SENTINEL_TYPE}' THEN 0 "
    f"ELSE ((event_id % {X_MOD}) * {X_MULT % X_MOD}) % {X_MOD} END"
)
Y_SQL = (
    f"CASE WHEN event_type = '{SENTINEL_TYPE}' THEN 0 "
    f"ELSE ((event_id % {Y_MOD}) * {Y_MULT % Y_MOD}) % {Y_MOD} END"
)
SENTINEL_SQL = f"event_type = '{SENTINEL_TYPE}'"


def x_col() -> Column:
    return (
        F.when(F.col("event_type") == SENTINEL_TYPE, F.lit(0))
        .otherwise(((F.col("event_id") % X_MOD) * F.lit(X_MULT % X_MOD)) % F.lit(X_MOD))
        .cast("long")
    )


def y_col() -> Column:
    return (
        F.when(F.col("event_type") == SENTINEL_TYPE, F.lit(0))
        .otherwise(((F.col("event_id") % Y_MOD) * F.lit(Y_MULT % Y_MOD)) % F.lit(Y_MOD))
        .cast("long")
    )


def movements(events: DataFrame) -> DataFrame:
    """events -> movement records {user_id, x, y, time_ms, is_sentinel}.

    ``time_ms`` is epoch milliseconds like the reference's ``Time``
    (functions.js:255); kept alongside the native timestamp for window math.
    """
    return events.select(
        "event_id",
        "user_id",
        "ts",
        x_col().alias("x"),
        y_col().alias("y"),
        F.unix_millis(F.col("ts")).alias("time_ms"),
        (F.col("event_type") == SENTINEL_TYPE).alias("is_sentinel"),
    )


def movement_aggregates(events: DataFrame, window: str = "1 second") -> DataFrame:
    """Per-(user_id, tumbling window) aggregate: count + insertion-ordered movs.

    Reference semantics (SURVEY.md A1/A2/W1, reconstructed Lambda): one row per
    (user, 1 s bucket) carrying the movement count and the raw movement structs.
    ``collect_list`` order is non-deterministic in Spark, so the list is sorted
    by (time_ms, event_id) — the reference's lists are insertion-ordered
    (functions.js:361-377) and event time is the insertion order.
    """
    movs = movements(events)
    return (
        movs.groupBy("user_id", F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sort_array(
                F.collect_list(F.struct("time_ms", "event_id", "x", "y"))
            ).alias("movs"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("window_start"),
            "cnt",
            "movs",
        )
    )


# Oracle-side equivalent of movement_aggregates *without* the nested list
# (value-hash comparison needs flat columns; list parity is exercised by the
# flattening queries instead).
AGG_SQL = f"""
SELECT user_id,
       date_trunc('second', ts) AS window_start,
       count(*) AS cnt
FROM events
GROUP BY user_id, date_trunc('second', ts)
"""
