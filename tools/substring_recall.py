#!/usr/bin/env python
"""Measured recall of ``dedup_substring_runs`` (anchored + df-capped) against
the uncapped stride-1 brute force — the same probe discipline as
tools/lsh_frontier.py for the LSH family.

Ground truth: maximal aligned runs of consecutive (gap == 1) exact SUB_W-gram
matches over EVERY offset with no df-cap — i.e. maximal common aligned
substrings of length >= SUB_MIN_SPAN. The operator's approximation levers are
(a) content-defined anchor selection (h60 % SUB_ANCHOR_MOD == 0) and (b) the
corpus-relative hot-gram df-cap; both are one-sided (every emitted anchor is
a true exact match), so recall is the only number in question.

A truth run counts as recalled when the operator emits a run for the same
(doc_a, doc_b, diagonal) whose [start_a, start_a + span) interval overlaps it.

Usage: python tools/substring_recall.py [sf_dir ...] [--json]
"""

from __future__ import annotations

import json
import sys

import duckdb

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from kinesis_demo_spark.functions.hashing import h60_sql
from kinesis_demo_spark.queries.dedup import (
    DF_CAP_PERMILLE,
    SUB_DF_FLOOR,
    SUB_GAP,
    SUB_MIN_ANCHORS,
    SUB_MIN_SPAN,
    SUB_W,
)


def _runs_sql(anchor_mod: int, df_capped: bool, gap: int, min_anchors: int) -> str:
    anchor = (
        f"WHERE {h60_sql('gram')} % {anchor_mod} = 0" if anchor_mod > 1 else ""
    )
    cap_join = (
        f"""JOIN (SELECT gram, count(DISTINCT doc_id) AS df FROM anch GROUP BY 1) dft
              USING (gram),
              (SELECT greatest({SUB_DF_FLOOR}, count(*) * {DF_CAP_PERMILLE} // 1000)
                 AS df_cap FROM documents) cap
        WHERE dft.df <= cap.df_cap"""
        if df_capped
        else ""
    )
    return f"""
WITH grams AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos, substr(text, CAST(pos AS INT), {SUB_W}) AS gram
  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - {SUB_W - 1}, 0) + 1)) AS pos
        FROM documents)
),
anch AS (SELECT doc_id, pos, gram FROM grams {anchor}),
idx AS (SELECT a.doc_id, a.pos, a.gram FROM anch a {cap_join}),
hits AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, a.pos - b.pos AS diag
  FROM idx a JOIN idx b ON a.gram = b.gram AND a.doc_id < b.doc_id
),
marked AS (
  SELECT doc_a, doc_b, diag, pos_a,
    CASE WHEN pos_a - lag(pos_a) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a)
              > {gap} THEN 1 ELSE 0 END AS brk
  FROM hits
),
runs AS (
  SELECT doc_a, doc_b, diag, pos_a,
    sum(brk) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a
                   ROWS UNBOUNDED PRECEDING) AS run_id
  FROM marked
)
SELECT doc_a, doc_b, diag, min(pos_a) AS start_a,
       max(pos_a) - min(pos_a) + {SUB_W} AS span, count(*) AS n_anchors
FROM runs GROUP BY doc_a, doc_b, diag, run_id
HAVING max(pos_a) - min(pos_a) + {SUB_W} >= {SUB_MIN_SPAN}
   AND count(*) >= {min_anchors}
"""


def probe(sf_dir: str) -> dict:
    from kinesis_demo_spark.queries.dedup import SUB_ANCHOR_MOD

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    truth = con.execute(_runs_sql(1, False, 1, 1)).fetchall()
    got = con.execute(
        _runs_sql(SUB_ANCHOR_MOD, True, SUB_GAP, SUB_MIN_ANCHORS)
    ).fetchall()
    by_pair_diag: dict = {}
    for a, b, d, s, span, _n in got:
        by_pair_diag.setdefault((a, b, d), []).append((s, s + span))
    recalled = 0
    for a, b, d, s, span, _n in truth:
        ivs = by_pair_diag.get((a, b, d), ())
        if any(lo < s + span and s < hi for lo, hi in ivs):
            recalled += 1
    return {
        "sf_dir": sf_dir,
        "truth_runs": len(truth),
        "operator_runs": len(got),
        "recalled": recalled,
        "recall": round(recalled / len(truth), 4) if truth else 1.0,
    }


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--json"]
    as_json = "--json" in sys.argv[1:]
    dirs = args or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    out = [probe(d) for d in dirs]
    if as_json:
        print(json.dumps(out))
    else:
        for r in out:
            print(
                f"{r['sf_dir']}: recall {r['recall']} "
                f"({r['recalled']}/{r['truth_runs']} truth runs; "
                f"operator emitted {r['operator_runs']})"
            )
