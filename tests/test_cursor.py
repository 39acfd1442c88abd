"""Q6 incremental-cursor property test (SURVEY.md §5.3): replaying the
reference client's polling loop — scan `window_start > cursor`, advance the
cursor to the max returned — must visit every window for the user exactly
once (no duplicates, no loss) with a strictly monotone cursor."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_demo_spark.io import load_table
from kinesis_demo_spark.plans.movements import movement_aggregates
from kinesis_demo_spark.plans.serving import range_scan

SF = "/root/testdata/sf0.001"
USER = 7


def test_cursor_replay_is_exactly_once(spark):
    agg = movement_aggregates(load_table(spark, SF, "events")).cache()
    cursor = "1970-01-01 00:00:00"
    seen: list = []
    cursors = [cursor]
    for _ in range(1000):  # bounded; breaks when drained
        batch = (
            range_scan(agg, user_id=USER, after=cursor)
            .select("window_start", "cnt")
            .orderBy("window_start")
            .collect()
        )
        if not batch:
            break
        seen.extend(batch)
        cursor = str(batch[-1].window_start)  # advance to max returned (functions.js:168)
        cursors.append(cursor)
    else:
        raise AssertionError("poll loop failed to drain")

    full = (
        agg.filter(F.col("user_id") == USER)
        .select("window_start", "cnt")
        .orderBy("window_start")
        .collect()
    )
    assert len(seen) == len(full) > 0          # no loss
    assert len({r.window_start for r in seen}) == len(seen)  # no duplicates
    assert seen == full                         # same content and order
    assert cursors == sorted(set(cursors))      # strictly monotone cursor
    agg.unpersist()


def test_cursor_bootstrap_matches_newest_existing_window(spark):
    """loadUserData bootstrap (functions.js:317-323): the initial cursor is
    the newest existing window at-or-before 'now'."""
    agg = movement_aggregates(load_table(spark, SF, "events"))
    newest = (
        range_scan(agg, user_id=USER, upto="2024-02-01 00:00:00", descending=True, limit=1)
        .select("window_start")
        .collect()[0]
        .window_start
    )
    direct = (
        agg.filter(F.col("user_id") == USER)
        .agg(F.max("window_start").alias("m"))
        .collect()[0]
        .m
    )
    assert newest == direct
