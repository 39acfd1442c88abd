"""E3 heatmap pipeline (SURVEY.md §3 E3): take a user's 10 most-recent
windows, flatten the raw movement structs, credit idle sentinels to the last
real position (W3 LOCF, functions.js:358-391), then grouped position counts
(A4) and the max intensity (A5).

LOCF semantics replicated from the reference client:
- a sentinel row (the (0,0) idle heartbeat, functions.js:196-204) is counted
  at the position of the most recent non-sentinel movement;
- sentinels with no preceding real movement are dropped (the ``if (id)`` guard
  at functions.js:379-381).

One deliberate, documented divergence: the reference iterates windows in
DESC order while movements inside each window are ASC (a client-side quirk of
consuming the reverse-scan response). We order the flattened stream globally
by event time — the natural stream order — and the DuckDB oracle is written to
the same spec, so the differential check pins the semantics we ship.

Scale: the LOCF is an ordered analytic window per user — Spark executes it as
one shuffle on user_id + in-partition sort, which is the optimal distributed
shape (no driver loop, no cross-partition carry needed since the carry key is
the partition key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .serving import range_scan


def flatten_movs(selected: DataFrame) -> DataFrame:
    """Explode the movs struct lists of the selected windows back into one
    movement row per element (functions.js:361-362 nested loop)."""
    return selected.select(
        "user_id",
        F.explode("movs").alias("m"),
    ).select(
        "user_id",
        F.col("m.time_ms").alias("time_ms"),
        F.col("m.event_id").alias("event_id"),
        F.col("m.x").alias("x"),
        F.col("m.y").alias("y"),
    )


def locf_positions(flat: DataFrame) -> DataFrame:
    """W3: carry the last non-sentinel (x, y) forward over event-time order;
    rows before the first real movement stay null and are dropped."""
    is_sentinel = (F.col("x") == 0) & (F.col("y") == 0)
    pos = F.when(~is_sentinel, F.struct("x", "y"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("time_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(pos, ignorenulls=True).over(w)
    return (
        flat.withColumn("p", carried)
        .filter(F.col("p").isNotNull())
        .select(
            "user_id",
            "time_ms",
            F.col("p.x").alias("x"),
            F.col("p.y").alias("y"),
        )
    )


def heatmap_counts(agg: DataFrame, user_id: int, now: str, n_windows: int = 10) -> DataFrame:
    """Full E3: last-N windows -> flatten -> LOCF -> per-position counts (A4)."""
    selected = range_scan(
        agg, user_id=user_id, upto=now, descending=True, limit=n_windows, project_movs=True
    )
    imputed = locf_positions(flatten_movs(selected))
    return imputed.groupBy("x", "y").agg(F.count(F.lit(1)).alias("cnt"))


def heatmap_max_intensity(points: DataFrame) -> DataFrame:
    """A5: the normalizing max over the grouped counts (functions.js:357,388)."""
    return points.agg(F.max("cnt").alias("max_cnt"))


def flatten_movs_with_window(selected: DataFrame) -> DataFrame:
    """Like flatten_movs but keeps window_start — needed to replicate the
    reference client's iteration order (windows DESC, movs ASC within)."""
    return selected.select("user_id", "window_start", F.explode("movs").alias("m")).select(
        "user_id",
        "window_start",
        F.col("m.time_ms").alias("time_ms"),
        F.col("m.event_id").alias("event_id"),
        F.col("m.x").alias("x"),
        F.col("m.y").alias("y"),
    )


def locf_positions_client_order(flat: DataFrame) -> DataFrame:
    """W3 LOCF in the REFERENCE CLIENT's exact iteration order: the client
    consumes the reverse-scan response window-by-window (DESC) while
    flattening each window's movs ASC (functions.js:361-377), so its
    last_position_id carry runs over (window DESC, time ASC). The engine's
    default (locf_positions) carries over global event-time ASC — both are
    shipped; tests/test_heatmap_parity.py pins exactly when they differ
    (sentinels in older windows with no in-window predecessor)."""
    is_sentinel = (F.col("x") == 0) & (F.col("y") == 0)
    pos = F.when(~is_sentinel, F.struct("x", "y"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("window_start").desc(), "time_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(pos, ignorenulls=True).over(w)
    return (
        flat.withColumn("p", carried)
        .filter(F.col("p").isNotNull())
        .select("user_id", "time_ms", F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    )


def heatmap_counts_client_order(
    agg: DataFrame, user_id: int, now: str, n_windows: int = 10
) -> DataFrame:
    """E3 with reference-faithful client iteration order."""
    selected = range_scan(
        agg, user_id=user_id, upto=now, descending=True, limit=n_windows, project_movs=True
    )
    imputed = locf_positions_client_order(flatten_movs_with_window(selected))
    return imputed.groupBy("x", "y").agg(F.count(F.lit(1)).alias("cnt"))
