#!/usr/bin/env python
"""Streaming throughput probe: drives the production pipeline shape (rate
source -> watermarked 1 s windowed aggregate -> noop sink, update mode) at a
configurable offered load and reports achieved rows/s from the query's own
progress metrics.

Usage:
    python tools/stream_throughput.py [rows_per_second] [seconds] [--wire]
    python tools/stream_throughput.py --seal   # writes STREAM_THROUGHPUT.json

``--wire`` routes every record through the transport codec first
(encode_wire_events -> decode_wire_events, the kafka branch's JSON wire
round-trip) so the achieved rate prices the serialization a real broker
deployment pays per record.

Prints one JSON line:
    {"metric": "stream_rows_per_s", "offered": R, "achieved": N,
     "batches": B, "unit": "rows/s"}

Separate from bench.py (whose contract is per-query seconds at a fixture
scale factor) because throughput is a sustained-rate property, not a
latency: the interesting question is whether the aggregate keeps up with the
offered load (achieved ~= offered) and how much headroom the micro-batch
cadence has. The reference's budget is its 1 s flush of ~60 client events/s
(SURVEY.md §6); the rate source offers 10k/s by default — three orders
beyond reference scale on one node."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_demo_spark.session import get_spark
from kinesis_demo_spark.sources.synthetic import stream_synthetic_events
from kinesis_demo_spark.streaming.pipeline import (
    decode_wire_events,
    encode_wire_events,
    windowed_aggregate,
)


def main() -> None:
    if "--seal" in sys.argv:
        seal(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "STREAM_THROUGHPUT.json"))
        return
    args = [a for a in sys.argv[1:] if a != "--wire"]
    wire = "--wire" in sys.argv
    rows_per_second = int(args[0]) if len(args) > 0 else 10_000
    seconds = int(args[1]) if len(args) > 1 else 20
    spark = get_spark("stream-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    events = stream_synthetic_events(spark, rows_per_second=rows_per_second)
    if wire:
        events = decode_wire_events(encode_wire_events(events))
    agg = windowed_aggregate(events, watermark="10 seconds")
    q = (
        agg.writeStream.format("noop")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    time.sleep(seconds)
    progresses = [json.loads(p.json) for p in q.recentProgress]
    q.stop()

    # Skip the first batches (stream warm-up) and average the steady tail.
    tail = progresses[len(progresses) // 3 :]
    rows = sum(p["numInputRows"] for p in tail)
    dur = sum(p["batchDuration"] for p in tail) / 1000.0
    print(
        json.dumps(
            {
                "metric": "stream_rows_per_s_wire" if wire else "stream_rows_per_s",
                "offered": rows_per_second,
                "achieved": round(rows / dur) if dur else 0,
                "batches": len(tail),
                "unit": "rows/s",
            }
        )
    )




def seal(out_path: str) -> dict:
    """Sustained-throughput seal for the SURVEY §7 state-blowup risk: drive
    the REAL A1/A2 shape — movement_aggregates, i.e. per-(user, 1 s window)
    count + sort_array(collect_list(struct)) — from the rate source at an
    escalating offered load, watermarked, 1 s trigger, update mode, with
    sf1-scale key cardinality (15 000 distinct users, the /tmp/sf1 events
    fixture's cardinality). A rung is SUSTAINED when the steady tail
    achieves >= 95% of offered AND p99 batch duration stays under the 1 s
    trigger. Records per rung: achieved rows/s, p50/p99/max batch ms, state
    rows and state memory bytes (the per-window collect_list state the
    reference's DynamoDB upsert held as items). The ceiling is the last
    sustained rung."""
    from kinesis_demo_spark.plans.movements import movement_aggregates

    spark = get_spark("stream-throughput-seal")
    spark.sparkContext.setLogLevel("ERROR")
    rungs = []
    ceiling = None
    for offered in (10_000, 50_000, 100_000, 200_000, 400_000, 800_000):
        events = stream_synthetic_events(
            spark, rows_per_second=offered, n_users=15_000
        ).withWatermark("ts", "10 seconds")
        agg = movement_aggregates(events)
        q = (
            agg.writeStream.format("noop")
            .outputMode("update")
            .trigger(processingTime="1 second")
            .option("checkpointLocation", f"/tmp/stream_seal_ckpt_{offered}")
            .start()
        )
        time.sleep(25)
        progresses = [json.loads(p.json) for p in q.recentProgress]
        q.stop()
        tail = progresses[len(progresses) // 3 :]
        if not tail:
            break
        rows = sum(p["numInputRows"] for p in tail)
        dur_s = sum(p["batchDuration"] for p in tail) / 1000.0
        batch_ms = sorted(p["batchDuration"] for p in tail)
        pct = lambda q_: batch_ms[min(len(batch_ms) - 1, int(q_ * len(batch_ms)))]  # noqa: E731
        st = [p["stateOperators"][0] for p in tail if p.get("stateOperators")]
        rung = {
            "offered_rows_s": offered,
            "achieved_rows_s": round(rows / dur_s) if dur_s else 0,
            "batches": len(tail),
            "batch_ms_p50": pct(0.50),
            "batch_ms_p99": pct(0.99),
            "batch_ms_max": batch_ms[-1],
            "state_rows_total": max(s["numRowsTotal"] for s in st) if st else None,
            "state_memory_bytes": max(s["memoryUsedBytes"] for s in st) if st else None,
        }
        rung["sustained"] = (
            rung["achieved_rows_s"] >= 0.95 * offered and rung["batch_ms_p99"] < 1000
        )
        rungs.append(rung)
        if rung["sustained"]:
            ceiling = rung
        else:
            break
    doc = {
        "metric": "stream_movs_state_throughput",
        "shape": "rate -> movement_aggregates (count + sorted collect_list state), "
                 "watermark 10s, trigger 1s, update mode, n_users=15000 (sf1 events cardinality)",
        "ceiling_rows_s": ceiling["achieved_rows_s"] if ceiling else 0,
        "ceiling_batch_ms_p99": ceiling["batch_ms_p99"] if ceiling else None,
        "ceiling_state_rows": ceiling["state_rows_total"] if ceiling else None,
        "ceiling_state_bytes": ceiling["state_memory_bytes"] if ceiling else None,
        "rungs": rungs,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: v for k, v in doc.items() if k != "rungs"}))
    return doc


if __name__ == "__main__":
    main()
