#!/usr/bin/env python
"""Long-running multi-client serving harness: the reference's API is a
long-lived query endpoint (functions.js:14-15 — every page visitor polls
``GET /v1/users/{id}/movements/{ts}`` on a 2 s budget, functions.js:185
``setInterval(..., TRACKING_INTERVAL*2)``). The engine reproduces that
query's semantics in plans/serving.py; this harness reproduces the
*endpoint shape*: a hot materialized serving table answering a sustained
stream of concurrent poll requests, each request a cursor-advancing
range-scan + running-sum pair, with per-request latency percentiles graded
against the 2 s budget.

Spark-first serving: the aggregate table is persisted once (the serving
layer's DynamoDB counterpart); each poll compiles to a pushed-filter scan of
the cached table + TakeOrderedAndProject, so request latency is O(matched
windows), never O(table). Concurrency = one Python thread per client — Spark
schedules concurrent actions from separate threads onto the shared executor
pool (FAIR-ready; local[] shares cores the same way a serving cluster
shares executors).

Prints ONE JSON line:
    {"metric": "serving_p99", "value": <sec>, "unit": "sec", "p50": ...,
     "p95": ..., "max": ..., "qps": ..., "requests": N, "clients": K,
     "within_budget_pct": ..., "sf": ...}
Exit 1 iff p99 exceeds the budget.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_demo_spark.io import load_table
from kinesis_demo_spark.plans.serving import events_aggregates, poll_sum, range_scan
from kinesis_demo_spark.session import get_spark

# Each poll scans this much window-time past its cursor (the reference client
# polls every 2 s and reads the new 1 s windows; at fixture density a few
# hours of windows per poll keeps result sizes realistic-but-small).
POLL_HORIZON_SEC = 4 * 3600


def run_serving_loop(
    spark, sf_dir: str, requests: int = 200, clients: int = 4, budget_sec: float = 2.0
) -> dict:
    agg = events_aggregates(load_table(spark, sf_dir, "events")).persist()
    bounds = agg.agg(
        {"window_start": "min", "user_id": "max"}
    ).collect()[0]
    t_min, max_user = bounds["min(window_start)"], bounds["max(user_id)"]
    agg.count()  # materialize the cache before timing begins
    t_span = (
        agg.agg({"window_start": "max"}).collect()[0][0] - t_min
    ).total_seconds()
    n_strides = max(1, int(t_span // POLL_HORIZON_SEC))

    def one_poll(i: int) -> float:
        # deterministic request mix: client i polls user (i mod users) with a
        # cursor walking forward through the fixture's time range — every
        # request exercises the pushed-filter range scan at a different
        # selectivity, like a fleet of clients at different poll positions.
        user = i % (max_user + 1)
        after = t_min + datetime.timedelta(seconds=(i % n_strides) * POLL_HORIZON_SEC)
        upto = after + datetime.timedelta(seconds=POLL_HORIZON_SEC)
        t0 = time.perf_counter()
        rows = range_scan(
            agg, user, after=str(after), upto=str(upto), descending=True, limit=10
        ).collect()
        total = poll_sum(agg, user, after=str(after)).collect()[0][0]
        dt = time.perf_counter() - t0
        if rows:  # running total over ws>after covers the (after,upto] page
            assert total >= sum(r["cnt"] for r in rows), "poll invariant broken"

        return dt

    one_poll(0)  # warm the codegen'd poll plans once; SLO grades steady state
    t_start = time.perf_counter()
    with ThreadPoolExecutor(max_workers=clients) as pool:
        lat = sorted(pool.map(one_poll, range(requests)))
    wall = time.perf_counter() - t_start
    agg.unpersist()  # callers (bench.py) share the session; leave no cache behind

    def pct(p: float) -> float:
        return round(lat[min(len(lat) - 1, int(p * len(lat)))], 4)

    return {
        "metric": "serving_p99",
        "value": pct(0.99),
        "unit": "sec",
        "p50": pct(0.50),
        "p95": pct(0.95),
        "max": round(lat[-1], 4),
        "qps": round(requests / wall, 2),
        "requests": requests,
        "clients": clients,
        "within_budget_pct": round(100.0 * sum(1 for x in lat if x <= budget_sec) / len(lat), 1),
        "budget_sec": budget_sec,
        "sf": float(m.group(1)) if (m := re.search(r"sf([0-9.]+)", sf_dir)) else -1.0,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--budget-sec", type=float, default=2.0)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    spark = get_spark("kinesis-demo-spark-serving")
    spark.sparkContext.setLogLevel("ERROR")
    stats = run_serving_loop(
        spark, args.sf_dir, args.requests, args.clients, args.budget_sec
    )
    print(json.dumps(stats))
    return 1 if stats["value"] > args.budget_sec else 0


if __name__ == "__main__":
    sys.exit(main())
