#!/usr/bin/env python
"""Streaming throughput probe: drives the production pipeline shape (rate
source -> watermarked 1 s windowed aggregate -> noop sink, update mode) at a
configurable offered load and reports achieved rows/s from the query's own
progress metrics.

Usage:
    python tools/stream_throughput.py [rows_per_second] [seconds] [--wire]

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


if __name__ == "__main__":
    main()
