#!/usr/bin/env python
"""Plan-shape audit across the ENTIRE query registry.

For every registered query this records, from the optimized physical plan,
the properties the 100 TB story depends on:

- ``shuffles``        — shuffle Exchange count (BroadcastExchange excluded)
- ``broadcasts``      — broadcast-exchange count (dim-side joins)
- ``sort_merge_joins`` / ``broadcast_hash_joins`` / ``bnl_joins``
- ``cartesian``       — CartesianProduct present (must be 0 everywhere)
- ``pushed_filters``  — parquet scans with a non-empty PushedFilters list
- ``python_stages``   — Arrow/pandas boundary operators
  (FlatMapGroupsInPandas / MapInPandas / ArrowEvalPython / MapInArrow /
  FlatMapGroupsInPandasWithState)
- ``take_ordered``    — TakeOrderedAndProject present (top-k done right)
- ``global_sort``     — a rangepartitioning Exchange (the top-k smell when
  paired with a later limit)

Output: one JSON line per query to stdout plus a sorted summary table to
stderr; ``--json PATH`` writes the full map to a sidecar (PLANS.json) so
plan-shape regressions show up in review diffs.

Streaming-drain queries (they EXECUTE on construction) are audited on their
batch-equivalent plans where construction is side-effect-free; the four
drain-to-memory queries are skipped with a note — their plan properties are
pinned by tests/test_streaming*.py instead.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_demo_spark.registry import all_queries
from kinesis_demo_spark.session import get_spark

# Queries whose construction DRAINS a stream (memory-sink differentials):
# building the DataFrame runs the job, so plan audit would re-execute them;
# their stateful plan shapes are asserted in the streaming test suite.
STREAM_DRAINS = {
    "streaming_window_counts",
    "streaming_interval_join",
    "streaming_static_enrich",
    "streaming_dedup_events",
    "streaming_hopping_counts",
    "sessionize_stateful_streaming",
    "streaming_outer_interval_join",
    # driver-sequenced iteration: building the result runs the training loop
    "bpe_train_merges",
    "pagerank_copurchase",
    "python_datasource_stream_events",
    # driver-side eigensolve consumes collected moments on construction
    "pca_embedding_components",
}

PY_STAGES = (
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "ArrowEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandasWithState",
    "BatchEvalPython",  # row-at-a-time Python — must never appear
)


def _plan(df, mode: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def _count_nodes(plan: str, token: str, exclude: tuple = ()) -> int:
    """Count PHYSICAL operators, not textual mentions: ``explain`` reprints
    a cached relation's child plan at EVERY reference (InMemoryRelation
    bodies carry the same ``plan_id`` each time they appear), so a shared
    cached stage used by three consumers showed 3x its real exchanges in
    the r2-r9 audits — the inflated 36-40-shuffle "depths" VERDICT r9 #5
    flagged were largely this repetition. Lines carrying a plan_id are
    deduped on (token, plan_id); ReusedExchange markers are skipped (the
    exchange they point at is already counted at its definition); lines
    without a plan_id fall back to per-occurrence counting."""
    seen: set = set()
    n = 0
    for line in plan.splitlines():
        if token not in line or any(x in line for x in exclude):
            continue
        if "ReusedExchange" in line and token != "ReusedExchange":
            continue
        m = re.search(r"plan_id=(\d+)", line)
        if m:
            key = (token, m.group(1))
            if key in seen:
                continue
            seen.add(key)
        n += 1
    return n


def audit_one(df) -> dict:
    simple = _plan(df, "simple")
    formatted = _plan(df, "formatted")
    pushed = len(
        [m for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted) if m.group(1).strip()]
    )
    return {
        "shuffles": _count_nodes(simple, "Exchange", exclude=("BroadcastExchange",)),
        "broadcasts": _count_nodes(simple, "BroadcastExchange"),
        "sort_merge_joins": _count_nodes(simple, "SortMergeJoin"),
        "broadcast_hash_joins": _count_nodes(simple, "BroadcastHashJoin"),
        "bnl_joins": _count_nodes(simple, "BroadcastNestedLoopJoin"),
        "cartesian": _count_nodes(simple, "CartesianProduct"),
        "pushed_filters": pushed,
        "python_stages": sum(_count_nodes(simple, p) for p in PY_STAGES),
        "row_python": _count_nodes(simple, "BatchEvalPython"),
        "take_ordered": int("TakeOrderedAndProject" in simple),
        "global_sort": _count_nodes(simple, "rangepartitioning"),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
    spark = get_spark("kinesis-demo-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict[str, dict] = {}
    for name, fn in sorted(all_queries().items()):
        if name in STREAM_DRAINS:
            report[name] = {"skipped": "stream-drain; plan pinned in streaming tests"}
            continue
        try:
            report[name] = audit_one(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — audit must cover the rest
            report[name] = {"error": f"{type(exc).__name__}: {exc}"}

    audited = {k: v for k, v in report.items() if "shuffles" in v}
    worst = sorted(audited.items(), key=lambda kv: -kv[1]["shuffles"])[:10]
    print("most-shuffling queries:", file=sys.stderr)
    for name, r in worst:
        print(f"  {name}: {r['shuffles']} shuffles, {r['broadcasts']} broadcasts", file=sys.stderr)
    n_cart = sum(v.get("cartesian", 0) for v in audited.values())
    n_rowpy = sum(v.get("row_python", 0) for v in audited.values())
    print(f"cartesian products: {n_cart}  row-python stages: {n_rowpy}", file=sys.stderr)

    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps({"audited": len(audited), "skipped": len(report) - len(audited),
                      "cartesian_products": n_cart, "row_python_stages": n_rowpy}))


if __name__ == "__main__":
    main()
