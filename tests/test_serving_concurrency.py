"""Serving-path r8 plans: the fused one-job poll and the request-coalesced
batch poll must answer EXACTLY what the original two-action composition
(range_scan page + poll_sum total) answers — the 64-client throughput work
(VERDICT r7 #6) is only admissible if the fast paths are value-identical.
Also pins the serving_table clustering invariants the cache-pruning relies
on."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from kinesis_demo_spark.io import load_table
from kinesis_demo_spark.plans.serving import (
    poll_many,
    poll_page_with_total,
    poll_sum,
    range_scan,
    serving_table,
)

SF = "/root/testdata/sf0.001"


def _agg(spark):
    return serving_table(load_table(spark, SF, "events")).cache()


def _probe_mix(agg, k: int):
    bounds = agg.agg(
        F.min("window_start").alias("t0"),
        F.max("window_start").alias("t1"),
        F.max("user_id").alias("mu"),
    ).collect()[0]
    span = (bounds.t1 - bounds.t0).total_seconds()
    probes = []
    for i in range(k):
        after = bounds.t0 + datetime.timedelta(seconds=(i * span / (k + 1)))
        upto = after + datetime.timedelta(seconds=max(span / 4, 1))
        probes.append((i, i % (bounds.mu + 1), after, upto))
    return probes


def test_fused_poll_matches_two_action_composition(spark):
    agg = _agg(spark)
    for _, user, after, upto in _probe_mix(agg, 8):
        fused = poll_page_with_total(
            agg, user, str(after), str(upto), limit=10
        ).collect()
        page = range_scan(
            agg, user, after=str(after), upto=str(upto), descending=True, limit=10
        ).collect()
        total = poll_sum(agg, user, after=str(after)).collect()[0][0]
        assert [(r.user_id, r.window_start, r.cnt) for r in fused] == [
            (r.user_id, r.window_start, r.cnt) for r in page
        ]
        if fused:
            assert all(r.total_events == total for r in fused)
        else:
            # empty page => either no matched windows at all (total NULL) or
            # all matched windows are past upto; nothing to cross-check
            pass
    agg.unpersist()


def test_poll_many_matches_per_request_fused_plan(spark):
    agg = _agg(spark)
    probes = _probe_mix(agg, 12)
    probes_df = spark.createDataFrame(
        probes, "poll_id long, user_id long, after timestamp, upto timestamp"
    )
    batched = poll_many(agg, probes_df, limit=10).collect()
    by_pid: dict[int, list] = {}
    for r in batched:
        by_pid.setdefault(r.poll_id, []).append(r)
    for pid, user, after, upto in probes:
        want = poll_page_with_total(
            agg, user, str(after), str(upto), limit=10
        ).collect()
        got = sorted(
            by_pid.get(pid, []), key=lambda r: r.window_start, reverse=True
        )
        assert [(r.user_id, r.window_start, r.cnt, r.total_events) for r in got] == [
            (r.user_id, r.window_start, r.cnt, r.total_events) for r in want
        ], f"poll {pid} diverged"
    agg.unpersist()


def test_serving_table_is_clustered_for_batch_pruning(spark):
    """The materialization contract the cache pruning rides on: rows within
    each partition are sorted by (user_id, window_start), and each user's
    rows land in exactly one partition (range partitioning on the leading
    key) — so per-batch min/max stats make a single-user poll skip every
    other batch."""
    agg = serving_table(load_table(spark, SF, "events"), partitions=4)
    parts = agg.select(
        F.spark_partition_id().alias("pid"), "user_id", "window_start"
    ).collect()
    by_pid: dict[int, list] = {}
    for r in parts:
        by_pid.setdefault(r.pid, []).append((r.user_id, r.window_start))
    assert len(by_pid) > 1  # range partitioning actually split
    for pid, rows in by_pid.items():
        assert rows == sorted(rows), f"partition {pid} not sorted"
    user_to_pids: dict[int, set] = {}
    for r in parts:
        user_to_pids.setdefault(r.user_id, set()).add(r.pid)
    # range partitioning may split AT a boundary user; all but at most
    # (n_partitions - 1) users must be partition-local
    split_users = [u for u, p in user_to_pids.items() if len(p) > 1]
    assert len(split_users) <= len(by_pid) - 1


def test_poll_many_collected_matches_poll_many(spark):
    """The r9 single-stage serving path (pushed IN-filter scan +
    coordinator assembly) must return per-request rows IDENTICAL to the
    probe-join poll_many plan — same pages, same order, same running
    totals — on a probe mix that actually matches data."""
    from kinesis_demo_spark.plans.serving import poll_many_collected

    agg = _agg(spark)
    probes = _probe_mix(agg, 12)
    probes_df = spark.createDataFrame(
        probes, "poll_id long, user_id long, after timestamp, upto timestamp"
    )
    want: dict[int, list] = {p[0]: [] for p in probes}
    for r in poll_many(agg, probes_df, limit=10).collect():
        want[r.poll_id].append((r.user_id, r.window_start, r.cnt, r.total_events))
    for pid in want:
        want[pid].sort(key=lambda t: t[1], reverse=True)
    got = poll_many_collected(agg, probes, limit=10)
    assert set(got) == set(want)
    n_nonempty = sum(1 for v in want.values() if v)
    assert n_nonempty >= len(probes) // 2, "probe mix mostly empty — vacuous"
    for pid in want:
        assert [
            (d["user_id"], d["window_start"], d["cnt"], d["total_events"])
            for d in got[pid]
        ] == want[pid], f"poll {pid} diverged"
    agg.unpersist()
