"""Registry entry proving the streaming pipeline computes exactly the batch
answer: the fixture stream drained through the Structured Streaming windowed
aggregate (streaming/pipeline.py) is value-hash compared against the plain
batch SQL over the same table. This is the batch/streaming differential the
test strategy calls for (SURVEY.md §5.4), wired into the driver's oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.timeutil import epoch_ms_sql
from ..registry import register
from ..streaming.pipeline import (
    run_complete_to_memory,
    run_stream_dedup,
    run_stream_hopping_counts,
    run_stream_static_enrich,
    run_stream_stream_join,
)


@register(
    "streaming_window_counts",
    oracle="""
SELECT user_id,
       date_trunc('second', ts) AS window_start,
       count(*) AS cnt,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs a real Structured Streaming job (file source -> 1 s tumbling
    window agg -> memory sink, availableNow trigger) and returns the drained
    result. Incremental execution, identical answer to the batch oracle."""
    return run_complete_to_memory(spark, sf_dir)


@register(
    "streaming_interval_join",
    oracle=f"""
SELECT l.event_id AS click_id, r.event_id AS view_id, l.user_id,
       CAST({epoch_ms_sql('r.ts')} - {epoch_ms_sql('l.ts')} AS BIGINT) AS lag_ms
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND l.event_type = 'click' AND r.event_type = 'view'
 AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
WHERE CAST(l.ts AS TIMESTAMP) > TIMESTAMP '1970-01-01 00:00:00'
  AND CAST(r.ts AS TIMESTAMP) > TIMESTAMP '1970-01-01 00:00:00'
""",
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (clicks x views within 1 h,
    per user) drained over the fixture and value-hash compared against the
    plain batch range join — the batch/streaming differential for join
    state, like streaming_window_counts is for aggregate state. The 1 h
    interval is the vacuous-green retune (r11): 5 s matched zero pairs at
    every driver fixture, so the row carried no signal — see
    run_stream_stream_join's docstring for the measured pair counts.

    Epoch-zero initial watermark (r12, --time fixture): the stream-stream
    join drops input rows with ts <= epoch on BOTH sides in the first
    micro-batch — even a matched pre-epoch pair never emits (pinned at the
    boundary in tests/test_temporal_extremes.py); the oracle mirrors the
    drop on both legs."""
    return run_stream_stream_join(spark, sf_dir)


@register(
    "streaming_static_enrich",
    oracle="""
WITH hist AS (
  SELECT user_id,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS hist_avg
  FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id, e.value, h.hist_avg,
       CAST(CASE WHEN e.value > 2.0 * h.hist_avg THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM events e JOIN hist h ON e.user_id = h.user_id
""",
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join drained over the fixture: every event
    enriched with the user's batch-computed historical average (broadcast
    static dim) and an anomaly flag — the third streaming differential,
    covering join-against-static state the way streaming_window_counts
    covers aggregate state and streaming_interval_join covers stream-stream
    join state."""
    return run_stream_static_enrich(spark, sf_dir)


@register(
    "streaming_dedup_events",
    oracle="""
SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hour
FROM events
WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '1970-01-01 00:00:00'
""",
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming dedup drained over the fixture and
    checked against batch DISTINCT — exactly-once delivery semantics on the
    (user, type, hour) delivery key with state evicted at the watermark
    (see streaming/pipeline.py::run_stream_dedup for the bounded-state
    argument).

    Pre-epoch rows are excluded in BOTH engines: Spark's streaming
    watermark INITIALIZES AT EPOCH ZERO, so ``dropDuplicatesWithinWatermark``
    treats every event time at or before the epoch as already-late in the
    first micro-batch and drops it (strict: ts <= watermark is late, pinned
    at the boundary in tests/test_temporal_extremes.py) — a real engine behavior the --time fixture
    exposed (r12; 145 pre-epoch rows silently vanished from the drain). A
    deployment carrying legitimate pre-1970 event times must rebase them
    (or use processing time); the oracle mirrors the drop so the
    differential pins it instead of papering over it. The CAST truncates
    ns->us exactly like the stream's own ``ts DIV 1000`` load
    normalization, so the boundary row set is identical."""
    return run_stream_dedup(spark, sf_dir)


@register(
    "streaming_hopping_counts",
    oracle=f"""
WITH base AS (
  SELECT user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS u FROM events
),
hops AS (
  SELECT user_id, value,
         (u // {5 * 60_000_000}
          + CASE WHEN u % {5 * 60_000_000} < 0 THEN -1 ELSE 0 END) - k.k AS slide_idx
  FROM base,
       (SELECT unnest(range(2)) AS k) k
)
SELECT user_id,
       make_timestamp(slide_idx * {5 * 60_000_000}) AS window_start,
       count(*) AS cnt,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM hops
GROUP BY 1, 2
""",
)
def streaming_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window (10 min / 5 min slide) streaming aggregate drained and
    checked against the batch hop-assignment oracle — the overlapping-window
    state differential, completing the streaming family: tumbling aggregate,
    stream-stream join, stream-static join, dedup, and now hopping state,
    each value-hash-compared to batch SQL."""
    return run_stream_hopping_counts(spark, sf_dir)


@register(
    "streaming_outer_interval_join",
    oracle=f"""
WITH clicks AS (
  -- epoch-zero initial watermark: both join inputs drop ts <= epoch rows
  -- in the first micro-batch (r12 --time fixture; boundary pinned in
  -- tests/test_temporal_extremes.py) — a pre-epoch click neither matches
  -- nor null-pads, so the oracle excludes it on both legs
  SELECT event_id AS click_id, user_id AS click_user, ts AS click_ts
  FROM events WHERE event_type = 'click'
    AND CAST(ts AS TIMESTAMP) > TIMESTAMP '1970-01-01 00:00:00'
),
views AS (
  SELECT event_id AS view_id, user_id AS view_user, ts AS view_ts
  FROM events WHERE event_type = 'view'
    AND CAST(ts AS TIMESTAMP) > TIMESTAMP '1970-01-01 00:00:00'
)
SELECT c.click_id, v.view_id, c.click_user AS user_id,
       CAST({epoch_ms_sql('v.view_ts')} - {epoch_ms_sql('c.click_ts')} AS BIGINT) AS lag_ms
FROM clicks c LEFT OUTER JOIN views v
  ON c.click_user = v.view_user
 AND v.view_ts >= c.click_ts AND v.view_ts <= c.click_ts + INTERVAL 1 HOUR
""",
)
def streaming_outer_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER interval join drained over the
    fixture and value-hash compared against the batch left-outer range join
    — the null-padding join-state differential the inner variant can't
    exercise: an unmatched click may only emit once the watermark PROVES no
    view can still arrive, so correctness here is evidence the eviction
    machinery (and the bounded-drain watermark push, see
    streaming/pipeline.py::run_stream_outer_join) emits every held row
    exactly once."""
    from ..streaming.pipeline import run_stream_outer_join

    return run_stream_outer_join(spark, sf_dir)
