#!/usr/bin/env python
"""Combined ingest+serve SLA probe (VERDICT r9 #6): the reference's
deployment runs BOTH budgets at once — the Lambda consumer flushes 1 s
micro-batches into the store while browser clients poll it on a 2 s loop
(web/assets/js/functions.js:12,133 ingest cadence; :11,134 poll cadence).
STREAM_THROUGHPUT.json and SERVING_SF1.json seal those budgets separately;
this probe runs them CONCURRENTLY in one JVM (one scheduler, one executor
pool — exactly the contention a single-cluster deployment has) and seals
them together:

- ingest: the real A1/A2 movs shape (movement_aggregates = per-(user, 1 s
  window) count + sorted collect_list state) from the rate source at a
  sustainable rung from the sealed ladder, watermark 10 s, 1 s trigger,
  update mode, sf1 user cardinality — identical to the
  stream_throughput.py seal;
- serve: the sealed serving loop (tools/serving_loop.py, the coalesced
  single-stage batched poll) at 32 concurrent clients against the sf1
  serving table, polling throughout the ingest window.

Both SLAs must hold under interference: p99 batch duration < 1000 ms (the
1 s trigger) and p99 poll latency < 2 s (the reference's poll budget).
Writes PIPELINE_SLA.json:

    python tools/gen_sf1_events.py      # build /tmp/sf1 events once
    python tools/pipeline_sla.py [offered_rows_s] [clients] [requests]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_demo_spark.session import get_spark
from kinesis_demo_spark.sources.synthetic import stream_synthetic_events
from kinesis_demo_spark.plans.movements import movement_aggregates

# Descending offered-load ladder: the solo ingest ceiling is 244k rows/s
# (STREAM_THROUGHPUT.json); under 32-client serving interference the 100k
# rung sits ON the 1 s budget edge (measured p99 978 ms then 1608 ms on
# back-to-back runs), so the seal walks DOWN until both budgets hold and
# records every rung — the interference cost is the artifact, not a
# number to hide.
LADDER = (100_000, 75_000, 50_000, 25_000)
CLIENTS_DEFAULT = 32
REQUESTS_DEFAULT = 600


def _one_rung(spark, sf1_dir: str, offered: int, clients: int, requests: int) -> dict:
    import shutil

    ckpt = f"/tmp/pipeline_sla_ckpt_{offered}"
    shutil.rmtree(ckpt, ignore_errors=True)
    # ingest side: the sealed movs shape, started FIRST so the serving loop
    # runs entirely inside the ingest window
    events = stream_synthetic_events(
        spark, rows_per_second=offered, n_users=15_000
    ).withWatermark("ts", "10 seconds")
    q = (
        movement_aggregates(events)
        .writeStream.format("noop")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .option("checkpointLocation", ckpt)
        .start()
    )
    time.sleep(8)  # past stream warm-up so the poll window sees steady batches

    # serve side: the sealed coalesced poll loop, timed while the ingest
    # stream keeps its 1 s cadence on the same executor pool
    from tools.serving_loop import run_serving_loop

    serving = run_serving_loop(
        spark, sf1_dir, requests=requests, clients=clients, coalesce=True
    )

    time.sleep(2)
    progresses = [json.loads(p.json) for p in q.recentProgress]
    q.stop()

    # steady tail only (same convention as the throughput seal)
    tail = progresses[len(progresses) // 3 :]
    rows = sum(p["numInputRows"] for p in tail)
    dur_s = sum(p["batchDuration"] for p in tail) / 1000.0
    batch_ms = sorted(p["batchDuration"] for p in tail)
    pct = lambda f: batch_ms[min(len(batch_ms) - 1, int(f * len(batch_ms)))]  # noqa: E731
    st = [p["stateOperators"][0] for p in tail if p.get("stateOperators")]

    ingest = {
        "offered_rows_s": offered,
        "achieved_rows_s": round(rows / dur_s) if dur_s else 0,
        "batches": len(tail),
        # ADVICE r10: pct() indexes batch_ms[-1] on an empty tail — guard
        # the percentile fields the same way as batch_ms_max/budget_held
        "batch_ms_p50": pct(0.50) if batch_ms else None,
        "batch_ms_p99": pct(0.99) if batch_ms else None,
        "batch_ms_max": batch_ms[-1] if batch_ms else None,
        "state_rows_total": max(s["numRowsTotal"] for s in st) if st else None,
        "budget_held": bool(batch_ms) and pct(0.99) < 1000,
    }
    serving_ok = serving.get("value") is not None and serving["value"] < 2.0
    return {
        "ingest": ingest,
        "serving": serving,
        "both_budgets_held": bool(ingest["budget_held"] and serving_ok),
    }


def main() -> int:
    ladder = (int(sys.argv[1]),) if len(sys.argv) > 1 else LADDER
    clients = int(sys.argv[2]) if len(sys.argv) > 2 else CLIENTS_DEFAULT
    requests = int(sys.argv[3]) if len(sys.argv) > 3 else REQUESTS_DEFAULT
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
    if not os.path.exists(os.path.join(sf1_dir, "events.parquet")):
        print(f"missing {sf1_dir}/events.parquet; run tools/gen_sf1_events.py first",
              file=sys.stderr)
        return 1

    spark = get_spark("pipeline-sla")
    spark.sparkContext.setLogLevel("ERROR")

    rungs, sealed = [], None
    for offered in ladder:
        rung = _one_rung(spark, sf1_dir, offered, clients, requests)
        rungs.append(rung)
        print(json.dumps({"offered": offered,
                          "ingest_p99_ms": rung["ingest"]["batch_ms_p99"],
                          "serving_p99_s": rung["serving"].get("value"),
                          "both_budgets_held": rung["both_budgets_held"]}),
              file=sys.stderr)
        if rung["both_budgets_held"]:
            sealed = rung
            break

    doc = {
        "metric": "pipeline_sla_concurrent",
        "shape": "movs ingest (rate -> movement_aggregates, watermark 10s, "
                 "trigger 1s, update, n_users=15000) CONCURRENT WITH the "
                 f"{clients}-client coalesced serving loop on the sf1 table; "
                 "descending offered-load ladder, sealed = highest rung "
                 "where BOTH budgets held",
        "sealed": sealed,
        "rungs": rungs,
        "solo_references": {
            "ingest_ceiling_rows_s": "STREAM_THROUGHPUT.json",
            "serving_64c": "SERVING_SF1.json",
        },
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "PIPELINE_SLA.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({
        "metric": doc["metric"],
        "sealed_offered_rows_s": sealed["ingest"]["offered_rows_s"] if sealed else None,
        "sealed_ingest_p99_ms": sealed["ingest"]["batch_ms_p99"] if sealed else None,
        "sealed_serving_p99_s": sealed["serving"].get("value") if sealed else None,
    }))
    return 0 if sealed else 2


if __name__ == "__main__":
    sys.exit(main())
