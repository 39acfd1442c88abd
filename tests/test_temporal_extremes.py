"""Temporal-extremes pins (r12, VERDICT r11 #3 — the --time fixture class).

Three bug families the sixth hostile class exposed, each pinned here so a
regression is caught without re-running the full sweep:

1. Engine time math at the int64-nanosecond range edges is correct and
   TZ-independent — asserted via CAST AS STRING (server-side rendering
   under the engine's forced-UTC session), because the py4j/pandas
   COLLECTION round-trip is provably lossy there under real process zones
   (pytz rounds pre-1920 LMT to whole minutes; pandas projects
   America/New_York as EST beyond tzdata's horizon while the JVM says EDT).
2. Spark's streaming watermark initializes at EPOCH ZERO: stateful
   operators treat pre-1970 event times as late-on-arrival in the first
   micro-batch. dropDuplicatesWithinWatermark drops ts <= epoch;
   session_window drops rows whose prospective session end (ts + gap)
   fails to clear the initial watermark (end <= epoch). The registered oracles mirror
   exactly these predicates; this test pins the BOUNDARY rows.
3. Floor-vs-truncate on negative epochs: Spark window()/unix_millis FLOOR
   while DuckDB ``//``/epoch_ms TRUNCATE toward zero — the oracles carry
   explicit floor corrections (functions/timeutil.epoch_ms_sql, the
   hopping CASE) verified by the sweep; here the Spark side's floor
   behavior itself is pinned.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write_events(path, rows_ns):
    """rows_ns: list of (event_id, ts_ns, user_id, event_type, value)."""
    cols = list(zip(*rows_ns))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(cols[0], pa.int64()),
                "ts": pa.array(cols[1], pa.timestamp("ns")),
                "user_id": pa.array(cols[2], pa.int64()),
                "event_type": pa.array(cols[3], pa.string()),
                "value": pa.array(cols[4], pa.float64()),
                "props": pa.array(["{}"] * len(rows_ns), pa.string()),
            }
        ),
        str(path),
        version="2.6",
    )


NS_S = 1_000_000_000
MAX_NS = (1 << 63) - 1
MIN_NS = -(1 << 63) + 1


def test_bucket_math_at_ns_edges_cast_as_string(spark, tmp_path):
    """date_trunc / unix_millis / window() at near-edge nanos, asserted via
    server-side string rendering (immune to collection-layer TZ damage)."""
    from kinesis_demo_spark.io import load_table

    rows = [
        (0, MAX_NS - 3 * 86400 * NS_S, 1, "view", 1.0),   # 2262-04-08
        (1, MIN_NS + 3 * 86400 * NS_S, 2, "view", 2.0),   # 1677-09-24
        (2, -1500, 3, "view", 3.0),                        # -1.5 us
        (3, 0, 4, "view", 4.0),                            # epoch zero
    ]
    _write_events(tmp_path / "events.parquet", rows)
    ev = load_table(spark, str(tmp_path), "events")
    got = {
        r.event_id: (r.ts_s, r.h_s, r.ms)
        for r in ev.select(
            "event_id",
            F.col("ts").cast("string").alias("ts_s"),
            F.date_trunc("hour", "ts").cast("string").alias("h_s"),
            F.unix_millis("ts").alias("ms"),
        ).collect()
    }
    # ns -> us is truncation toward zero (matches DuckDB's CAST); hour
    # truncation is calendar floor; unix_millis FLOORS (Java convention)
    assert got[0] == ("2262-04-08 23:47:16.854775", "2262-04-08 23:00:00", 9223112836854)
    assert got[1] == ("1677-09-24 00:12:43.145225", "1677-09-24 00:00:00", -9223112836855)
    assert got[2] == ("1969-12-31 23:59:59.999999", "1969-12-31 23:00:00", -1)
    assert got[3] == ("1970-01-01 00:00:00", "1970-01-01 00:00:00", 0)


def test_streaming_dedup_initial_watermark_boundary(spark, tmp_path):
    """dropDuplicatesWithinWatermark under the epoch-zero initial watermark:
    every ts <= epoch row is late — the exact predicate the oracle mirrors."""
    from kinesis_demo_spark.streaming.pipeline import run_stream_dedup

    rows = [
        (0, -3600 * NS_S, 1, "view", 1.0),   # one hour pre-epoch: dropped
        (1, -1000, 2, "view", 1.0),          # -1 us: dropped
        (2, 0, 3, "view", 1.0),              # exactly epoch: boundary row
        (3, 3600 * NS_S, 4, "view", 1.0),    # post-epoch: kept
    ]
    _write_events(tmp_path / "events.parquet", rows)
    got = {r.user_id for r in run_stream_dedup(spark, str(tmp_path)).collect()}
    # strict >: the ts == watermark row is late too (oracle predicate ts > epoch)
    assert got == {4}, got


def test_streaming_session_window_initial_watermark_boundary(spark, tmp_path):
    """Native streaming session_window under the epoch-zero initial
    watermark: a row survives iff its prospective session end (ts + 24 h
    gap) clears the watermark — pinned at the exact boundary."""
    from kinesis_demo_spark.streaming.pipeline import run_stream_session_windows

    gap_ns = 24 * 3600 * NS_S
    rows = [
        (0, -gap_ns - 1000, 1, "view", 1.0),  # end < 0: dropped
        (1, -gap_ns, 2, "view", 1.0),         # end == 0: boundary row
        (2, -1000, 3, "view", 1.0),           # end > 0: kept
        (3, 3600 * NS_S, 4, "view", 1.0),     # plain post-epoch: kept
    ]
    _write_events(tmp_path / "events.parquet", rows)
    got = {r.user_id for r in run_stream_session_windows(spark, str(tmp_path)).collect()}
    # strict >: the end == 0 row is late (oracle predicate ts + gap > epoch)
    assert got == {3, 4}, got


def test_hopping_window_floor_on_negative_epochs(spark, tmp_path):
    """Spark window() FLOORS the slide index: an event 1 us before epoch
    belongs to the windows starting at -5 min and -10 min, never 0."""
    from kinesis_demo_spark.registry import all_queries

    rows = [(0, -1000, 1, "view", 1.0)]
    _write_events(tmp_path / "events.parquet", rows)
    q = all_queries()["hopping_window_counts"]
    got = sorted(
        str(r.window_start) for r in q(spark, str(tmp_path)).collect()
    )
    assert got == ["1969-12-31 23:50:00", "1969-12-31 23:55:00"]


def test_stream_stream_join_initial_watermark_boundary(spark, tmp_path):
    """Stream-stream interval join under the epoch-zero initial watermark:
    BOTH input sides drop ts <= epoch rows in the first micro-batch — a
    matched pre-epoch pair never emits, a pre-epoch/epoch click never
    null-pads. The interval-join oracles mirror the drop on both legs."""
    from kinesis_demo_spark.streaming.pipeline import (
        run_stream_outer_join,
        run_stream_stream_join,
    )

    h = 3600 * NS_S
    rows = [
        (0, -h, 1, "click", 1.0),            # pre-epoch click (matched below)
        (1, -1000, 2, "click", 1.0),         # -1 us click
        (2, 0, 3, "click", 1.0),             # exactly-epoch click
        (3, h, 4, "click", 1.0),             # post-epoch click, matched
        (4, -h + 60 * NS_S, 1, "view", 1.0),  # pre-epoch matching view
        (5, h + 60 * NS_S, 4, "view", 1.0),   # post-epoch matching view
    ]
    _write_events(tmp_path / "events.parquet", rows)
    outer = sorted(
        (r.click_id, r.view_id)
        for r in run_stream_outer_join(spark, str(tmp_path)).collect()
    )
    inner = sorted(
        (r.click_id, r.view_id)
        for r in run_stream_stream_join(spark, str(tmp_path)).collect()
    )
    assert outer == [(3, 5)], outer
    assert inner == [(3, 5)], inner
