#!/usr/bin/env python
"""Measured (band_bits x tables) frontier for the two sign-LSH operators
(``dedup_embedding_cosine_lsh``, ``ann_cosine_topk_lsh``).

For every config with ``bits * tables <= dim`` this computes, against the
exact in-repo definitions on the real fixture embeddings:

  - ``dup_recall``  — fraction of exact near-dup pairs (cosine >=
    COSINE_DUP_THRESHOLD) whose vectors share at least one (table, bucket).
    This is exactly the candidate-generation recall of
    ``dedup_embedding_cosine_lsh`` (its verify stage is exact, so pair
    recall == candidate recall).
  - ``ann_recall_at_k`` — fraction of exact top-K neighbors (per query
    vec_id < N_QUERIES) that are candidates. A true top-K neighbor that
    survives candidate generation always ranks inside the LSH top-K (its
    score beats every non-member), so this equals the operator's recall@K.
  - ``cand_pairs`` — number of DISTINCT candidate pairs (i < j) across all
    tables: the verify-join volume, the dominant cost at scale.
  - ``cand_frac`` — cand_pairs / all-pairs (1.0 == brute force: no pruning).
  - ``replication`` = tables: the corpus shuffle/explode multiplier.

The bucketing replicated here is bit-identical to
``functions.vectors.sign_bucket_band`` (bit d of table t = sign of
dim t*bits+d), so measured numbers transfer 1:1 to the operators.

Usage: python tools/lsh_frontier.py [sf_dir] [--json]
Prints a table (or one JSON line with --json) sorted by cand_pairs.
"""

from __future__ import annotations

import json
import sys

import duckdb
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from kinesis_demo_spark.queries.dedup import COSINE_DUP_THRESHOLD
from kinesis_demo_spark.queries.similarity import N_QUERIES, TOP_K

CONFIGS = (
    (4, 16), (4, 12), (4, 8),
    (5, 12), (6, 10), (6, 8),
    (8, 8), (8, 6), (10, 6),
    (12, 5), (16, 4),
)


def load_embeddings(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    emb = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, emb


def measure(sf_dir: str) -> list[dict]:
    ids, emb = load_embeddings(sf_dir)
    n, dim = emb.shape
    nrm = np.sqrt((emb * emb).sum(axis=1))
    cos = (emb @ emb.T) / np.outer(nrm, nrm)

    iu, ju = np.triu_indices(n, k=1)
    dup_mask = cos[iu, ju] >= COSINE_DUP_THRESHOLD
    dup_i, dup_j = iu[dup_mask], ju[dup_mask]

    # exact top-K per query (tie-break: smaller neighbor id first, matching
    # the operators' row_number ORDER BY score DESC, neighbor_id)
    q_idx = np.where(ids < N_QUERIES)[0]
    exact_topk: dict[int, set[int]] = {}
    for qi in q_idx:
        order = sorted(
            (j for j in range(n) if j != qi),
            key=lambda j: (-cos[qi, j], ids[j]),
        )[:TOP_K]
        exact_topk[qi] = set(order)

    signs = emb >= 0
    out = []
    for bits, tables in CONFIGS:
        if bits * tables > dim:
            continue
        # bucket id per (table, vector): bit d = sign of dim t*bits+d
        buckets = np.zeros((tables, n), dtype=np.int64)
        for t in range(tables):
            for d in range(bits):
                buckets[t] += signs[:, t * bits + d].astype(np.int64) << d

        collide_dup = np.zeros(len(dup_i), dtype=bool)
        for t in range(tables):
            collide_dup |= buckets[t, dup_i] == buckets[t, dup_j]
        dup_recall = float(collide_dup.mean()) if len(dup_i) else None

        # distinct candidate pairs across tables (i < j), encoded i*n+j
        pair_sets = []
        for t in range(tables):
            order = np.argsort(buckets[t], kind="stable")
            bt = buckets[t, order]
            starts = np.flatnonzero(np.r_[True, bt[1:] != bt[:-1]])
            ends = np.r_[starts[1:], len(bt)]
            for s, e in zip(starts, ends):
                if e - s < 2:
                    continue
                members = np.sort(order[s:e])
                a, b = np.triu_indices(len(members), k=1)
                pair_sets.append(members[a].astype(np.int64) * n + members[b])
        cand = np.unique(np.concatenate(pair_sets)) if pair_sets else np.array([], dtype=np.int64)
        cand_set_rows = cand // n

        # ANN recall@K: exact top-K members that are candidates of their query
        cand_pairs_set = set(cand.tolist())
        hits = total = 0
        for qi in q_idx:
            for j in exact_topk[qi]:
                a, b = (qi, j) if qi < j else (j, qi)
                hits += (a * n + b) in cand_pairs_set
                total += 1
        ann_recall = hits / total if total else None

        all_pairs = n * (n - 1) // 2
        out.append(
            {
                "bits": bits,
                "tables": tables,
                "dup_recall": round(dup_recall, 4) if dup_recall is not None else None,
                "ann_recall_at_k": round(ann_recall, 4) if ann_recall is not None else None,
                "cand_pairs": int(len(cand)),
                "cand_frac": round(len(cand) / all_pairs, 4),
                "replication": tables,
            }
        )
        del cand_set_rows
    out.sort(key=lambda r: r["cand_pairs"])
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--json"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    rows = measure(sf_dir)
    if "--json" in sys.argv:
        print(json.dumps({"metric": "lsh_frontier", "sf_dir": sf_dir, "configs": rows}))
        return
    print(f"{'bits':>4} {'tables':>6} {'dup_recall':>10} {'ann_r@k':>8} "
          f"{'cand_pairs':>10} {'cand_frac':>9} {'repl':>4}")
    for r in rows:
        print(f"{r['bits']:>4} {r['tables']:>6} {r['dup_recall']!s:>10} "
              f"{r['ann_recall_at_k']!s:>8} {r['cand_pairs']:>10} "
              f"{r['cand_frac']:>9} {r['replication']:>4}")


if __name__ == "__main__":
    main()
