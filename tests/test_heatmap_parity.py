"""Pins the engine's documented LOCF-order divergence from the reference
client (ADVICE.md / plans/heatmap.py): the reference iterates windows DESC
(reverse-scan response order) while flattening movs ASC within each window,
so a sentinel in the OLDEST selected window can be credited to a position
from a NEWER window. The engine orders the flattened stream globally ASC by
event time. This test builds the one fixture where the two orders disagree
and asserts (a) the engine's spec, (b) exactly how the reference's
client-order credit would differ — keeping the divergence intentional and
visible rather than silent."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_demo_spark.plans.heatmap import locf_positions


def _flat(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, time_ms bigint, event_id bigint, x bigint, y bigint"
    )


def test_engine_credits_sentinel_to_event_time_predecessor(spark):
    # window 1: real movement at (5, 5); window 2: sentinel first, then (9, 9)
    rows = [
        (1, 1000, 1, 5, 5),
        (1, 2000, 2, 0, 0),  # sentinel: engine credits (5,5) — the event-time predecessor
        (1, 2100, 3, 9, 9),
    ]
    got = {(r.time_ms, r.x, r.y) for r in locf_positions(_flat(spark, rows)).collect()}
    assert got == {(1000, 5, 5), (2000, 5, 5), (2100, 9, 9)}


def test_leading_sentinels_dropped(spark):
    rows = [
        (1, 1000, 1, 0, 0),  # no predecessor -> dropped (functions.js:379-381 guard)
        (1, 2000, 2, 0, 0),
        (1, 3000, 3, 7, 7),
    ]
    got = [(r.time_ms, r.x, r.y) for r in locf_positions(_flat(spark, rows)).collect()]
    assert sorted(got) == [(3000, 7, 7)]


def test_reference_desc_iteration_would_differ_on_this_fixture(spark):
    """The divergence case: sentinel in the oldest window, real movements in
    newer windows. Reference client order = windows DESC then movs ASC, so
    its running `last_position_id` when reaching the old sentinel is the
    NEWEST window's last position — not the event-time predecessor."""
    # oldest window holds ONLY a sentinel; a newer window has a real movement
    rows = [
        (1, 1000, 1, 0, 0),  # engine: no event-time predecessor -> dropped
        (1, 2000, 2, 9, 9),
    ]
    engine = {(r.time_ms, r.x, r.y) for r in locf_positions(_flat(spark, rows)).collect()}
    assert engine == {(2000, 9, 9)}

    # reference emulation: iterate windows DESC (2 s window first), movs ASC —
    # its running last_position_id is already (9,9) when the old sentinel is
    # reached, so the sentinel is credited instead of dropped
    ref_order = [(2000, 9, 9), (1000, 0, 0)]
    last = None
    ref = set()
    for t, x, y in ref_order:
        if (x, y) != (0, 0):
            last = (x, y)
            ref.add((t, x, y))
        elif last is not None:
            ref.add((t, *last))
    assert (1000, 9, 9) in ref  # reference credits the NEWER position
    assert engine != ref  # divergence is real, documented, and pinned here