#!/usr/bin/env python
"""Approximation-quality probe: every approximate/scale-path operator scored
against its exact in-repo baseline on the same fixtures — recall measured,
not guessed. (The oracle gate proves each variant computes ITS OWN spec
bit-exactly; this tool answers the other question: how much of the exact
answer the approximate spec retains.)

Reported:
  - ann_{lsh,ivf,pq,truncated,hamming}_recall_at_k: fraction of exact
    brute-force top-k neighbor pairs each ANN variant returns — the whole
    frontier measured side by side.
  - minhash_pair_recall / precision: MinHash+LSH verified duplicate pairs vs
    the exact inverted-index Jaccard pairs (recall < 1 comes from signature
    collisions missed by banding; precision = 1 by construction since
    candidates are exactness-verified).
  - simhash_vs_jaccard_overlap: SimHash hamming<=3 pairs that are also exact
    Jaccard duplicates (different similarity definitions — overlap, not
    recall).
  - df_capped_pair_recall / precision: corpus-relative hot-shingle-capped
    index vs the exact inverted index (precision = 1 by construction —
    candidates are exactness-verified; recall < 1 only when a true pair's
    every shared shingle crosses the 0.5%-of-docs cap).

Usage: python tools/approx_quality.py [sf_dir]   (default sf0.01)
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_demo_spark.io import release_persisted
from kinesis_demo_spark.registry import all_queries
from kinesis_demo_spark.session import get_spark


def _pairs(df, a, b):
    return {(r[a], r[b]) for r in df.collect()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("approx-quality")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()

    exact_ann = _pairs(q["ann_cosine_topk"](spark, sf_dir), "query_id", "neighbor_id")
    release_persisted()
    lsh_ann = _pairs(q["ann_cosine_topk_lsh"](spark, sf_dir), "query_id", "neighbor_id")
    release_persisted()
    ivf_ann = _pairs(q["ann_cosine_topk_ivf"](spark, sf_dir), "query_id", "neighbor_id")
    release_persisted()
    pq_ann = _pairs(q["ann_pq_adc_topk"](spark, sf_dir), "query_id", "neighbor_id")
    release_persisted()
    trunc_ann = _pairs(q["ann_cosine_topk_truncated"](spark, sf_dir), "query_id", "neighbor_id")
    release_persisted()
    ham_ann = _pairs(q["ann_hamming_binary"](spark, sf_dir), "query_id", "neighbor_id")
    release_persisted()

    # recall-after-merge (r12, VERDICT r11 #7): the IVF search runs against
    # base+delta under the FROZEN codebook (exactly the state
    # ann_ivf_delta_merge maintains), so its recall restricted to exact
    # pairs whose NEIGHBOR lies in the delta (the newest tenth by vec_id —
    # the same cut the merge query uses) measures whether tonight's merged
    # vectors are actually searchable before the retrain fires.
    from kinesis_demo_spark.io import load_table

    n_max = load_table(spark, sf_dir, "embeddings").agg({"vec_id": "max"}).collect()[0][0]
    cut = (n_max + 1) * 9 // 10
    release_persisted()
    exact_delta = {(a, b) for a, b in exact_ann if b >= cut}

    exact_emb = _pairs(q["dedup_embedding_cosine"](spark, sf_dir), "vec_a", "vec_b")
    release_persisted()
    lsh_emb = _pairs(q["dedup_embedding_cosine_lsh"](spark, sf_dir), "vec_a", "vec_b")
    release_persisted()

    exact_dup = _pairs(q["dedup_ngram_jaccard"](spark, sf_dir), "doc_a", "doc_b")
    release_persisted()
    mh_dup = _pairs(q["dedup_minhash_lsh"](spark, sf_dir), "doc_a", "doc_b")
    release_persisted()
    sh_dup = _pairs(q["dedup_simhash"](spark, sf_dir), "doc_a", "doc_b")
    release_persisted()
    dfcap_dup = _pairs(q["dedup_ngram_jaccard_df_capped"](spark, sf_dir), "doc_a", "doc_b")
    release_persisted()

    def ratio(n, d):
        return round(n / d, 4) if d else None

    print(
        json.dumps(
            {
                "metric": "approx_quality",
                "sf_dir": sf_dir,
                "ann_lsh_recall_at_k": ratio(len(lsh_ann & exact_ann), len(exact_ann)),
                "ann_ivf_recall_at_k": ratio(len(ivf_ann & exact_ann), len(exact_ann)),
                "ann_pq_recall_at_k": ratio(len(pq_ann & exact_ann), len(exact_ann)),
                "ann_truncated_recall_at_k": ratio(len(trunc_ann & exact_ann), len(exact_ann)),
                "ann_hamming_recall_at_k": ratio(len(ham_ann & exact_ann), len(exact_ann)),
                "emb_lsh_pair_recall": ratio(len(lsh_emb & exact_emb), len(exact_emb)),
                "minhash_pair_recall": ratio(len(mh_dup & exact_dup), len(exact_dup)),
                "minhash_pair_precision": ratio(len(mh_dup & exact_dup), len(mh_dup)),
                "simhash_vs_jaccard_overlap": ratio(len(sh_dup & exact_dup), len(sh_dup)),
                "df_capped_pair_recall": ratio(len(dfcap_dup & exact_dup), len(exact_dup)),
                "df_capped_pair_precision": ratio(len(dfcap_dup & exact_dup), len(dfcap_dup)),
                "ivf_delta_recall_after_merge": ratio(
                    len(ivf_ann & exact_delta), len(exact_delta)
                ),
                "n_exact_delta_pairs": len(exact_delta),
                "n_exact_ann_pairs": len(exact_ann),
                "n_exact_dup_pairs": len(exact_dup),
            }
        )
    )


if __name__ == "__main__":
    main()
