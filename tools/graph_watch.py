#!/usr/bin/env python
"""Iterative-graph drift watch + lineage-form experiment (VERDICT r10 #3).

The r10 judge found the iterative-graph family (per-round localCheckpoint /
persist queries) re-times 1.3-2.3x above its seals across fresh sessions
even when control rows run FASTER than seal — host/IO drift concentrated on
eager per-round materialization, with nothing in the sealed record to
distinguish "disk got slower" from "someone broke the peel loop". This tool
seals both missing pieces:

1. **Two-session min+median watch panel** (the timeseries_user_similarity
   precedent from r9 #2): each WATCH query is timed min-of-3 in TWO fresh
   JVMs (subprocess children), alongside a control row. A future regression
   claim against this family must beat the WORSE of the two sessions, and
   the control row says whether the session itself was healthy.
2. **checkpoint-vs-cache head-to-head** for graph_kcore /
   graph_label_propagation's fixed-round loops, same session, min-of-3 each
   form, results cross-checked row-identical before timings count. The
   registered default in analytics.py follows the winner (see
   _round_break's docstring for why the fixpoint variants always keep the
   eager checkpoint).

Usage:
    python tools/graph_watch.py [sf_dir] [out.json]   # default sf0.1, GRAPH_WATCH.json
    python tools/graph_watch.py --child sf_dir        # internal: one fresh session
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WATCH = (
    "graph_kcore",
    "graph_label_propagation",
    "dedup_sorted_neighborhood",
    "ann_pq_adc_topk",
    "tpch_q1_pricing_summary",  # control: byte-stable cheap scan+agg
)


def _session(app: str):
    from kinesis_demo_spark.session import get_spark

    spark = get_spark(app)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _time_df(build, runs: int = 3) -> list[float]:
    from kinesis_demo_spark.io import release_persisted

    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
        release_persisted()
    return out


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def child(sf_dir: str) -> None:
    """One fresh session: min-of-3 + median for every WATCH query."""
    spark = _session("graph-watch-child")
    from kinesis_demo_spark.registry import all_queries

    qs = all_queries()
    rows = {}
    for name in WATCH:
        runs = _time_df(lambda: qs[name](spark, sf_dir))
        rows[name] = {"min": min(runs), "median": _median(runs), "runs": runs}
    print(json.dumps(rows))


def head_to_head(spark, sf_dir: str) -> dict:
    """checkpoint-form vs cache-form, same session, hash-equal first."""
    from kinesis_demo_spark.io import release_persisted
    from kinesis_demo_spark.queries.analytics import (
        graph_kcore,
        graph_label_propagation,
    )

    out = {}
    for name, fn in (("graph_kcore", graph_kcore),
                     ("graph_label_propagation", graph_label_propagation)):
        # results must be row-identical across forms before timings count
        a = sorted(map(tuple, fn(spark, sf_dir, lineage="checkpoint").collect()))
        release_persisted()
        b = sorted(map(tuple, fn(spark, sf_dir, lineage="cache").collect()))
        release_persisted()
        identical = a == b
        ck = _time_df(lambda: fn(spark, sf_dir, lineage="checkpoint"))
        ca = _time_df(lambda: fn(spark, sf_dir, lineage="cache"))
        out[name] = {
            "rows": len(a),
            "forms_row_identical": identical,
            "checkpoint": {"min": min(ck), "median": _median(ck), "runs": ck},
            "cache": {"min": min(ca), "median": _median(ca), "runs": ca},
            "cache_speedup_min": round(min(ck) / min(ca), 3) if min(ca) else None,
        }
    return out


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return 0
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "GRAPH_WATCH.json")

    spark = _session("graph-watch")
    h2h = {sf_dir: head_to_head(spark, sf_dir)}
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
    if os.path.exists(os.path.join(sf1_dir, "lineitem.parquet")):
        h2h[sf1_dir] = head_to_head(spark, sf1_dir)
    spark.stop()

    sessions = []
    for i in range(2):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", sf_dir],
            capture_output=True, text=True, cwd=REPO,
        )
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
        try:
            sessions.append(json.loads(line))
        except json.JSONDecodeError:
            sessions.append({"error": p.stderr[-2000:]})

    doc = {
        "sf_dir": sf_dir,
        "head_to_head": h2h,
        "watch_sessions": sessions,
        "note": (
            "watch_sessions: two FRESH JVMs, min-of-3 + median per query. A "
            "regression claim against this family must exceed the WORSE "
            "session here with a healthy control row; head_to_head is the "
            "checkpoint-vs-cache lineage experiment (forms verified "
            "row-identical before timing)."
        ),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"out": out_path, "h2h": {
        k: {q: v["cache_speedup_min"] for q, v in d.items()} for k, d in h2h.items()
    }}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
