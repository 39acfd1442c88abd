"""Recall + structure pins for the product-quantization ANN
(queries/similarity.py::ann_pq_adc_topk). Value-hash parity lives in
test_oracle_parity; these pin that the shortlist-then-exact-re-rank pipeline
actually FINDS the true neighbors and that the codes compress as claimed."""

from __future__ import annotations

from kinesis_demo_spark.queries import similarity as S

SF = "/root/testdata/sf0.001"


def _topk_sets(rows):
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_pq_rerank_recall_at_10_vs_exact(spark):
    exact = _topk_sets(S.ann_cosine_topk(spark, SF).collect())
    pq = _topk_sets(S.ann_pq_adc_topk(spark, SF).collect())
    recalls = [len(exact[q] & pq[q]) / len(exact[q]) for q in exact]
    # measured 0.90 at sf0.001 / 0.88 at sf0.01; pin a floor with headroom —
    # a code or codebook regression collapses this to ~0.1 (raw-ADC level)
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_pq_rerank_scores_are_exact_cosine(spark):
    """Every emitted (query, neighbor) score must equal the exact
    brute-force cosine — the re-rank stage uses real math, only the
    SHORTLIST is approximate."""
    exact = {
        (r.query_id, r.neighbor_id): r.score
        for r in S.ann_cosine_topk(spark, SF).collect()
    }
    for r in S.ann_pq_adc_topk(spark, SF).collect():
        key = (r.query_id, r.neighbor_id)
        if key in exact:  # shared pairs must agree bit-for-bit
            assert r.cosine == exact[key], key


def test_pq_codes_are_within_codebook_range(spark):
    """Each subspace code is a 1-based index into the PQ_K-entry codebook —
    the 8-codes-per-vector representation IS the 32x compression claim."""
    from pyspark.sql import functions as F

    from kinesis_demo_spark.io import load_table, spread

    vb = spread(load_table(spark, SF, "embeddings")).select("vec_id", "embedding")
    cb = F.broadcast(
        vb.filter(F.col("vec_id") < S.PQ_K).agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("vec_id", "embedding"))),
                lambda s: s["embedding"],
            ).alias("cb")
        )
    )

    def dists(m):
        return F.transform(
            F.col("cb"), lambda c: S._subdist2(F.col("embedding"), c, m * S.PQ_SUB)
        )

    enc = vb.crossJoin(cb).select(
        "vec_id",
        *[
            F.array_position(dists(m), F.array_min(dists(m))).alias(f"code_{m}")
            for m in range(S.PQ_M)
        ],
    )
    agg = enc.agg(
        *[F.min(f"code_{m}").alias(f"mn_{m}") for m in range(S.PQ_M)],
        *[F.max(f"code_{m}").alias(f"mx_{m}") for m in range(S.PQ_M)],
    ).collect()[0]
    for m in range(S.PQ_M):
        assert 1 <= agg[f"mn_{m}"] and agg[f"mx_{m}"] <= S.PQ_K


def test_truncated_prescreen_recall_at_10_vs_exact(spark):
    """Dimension-truncated coarse pass + exact re-rank must find the true
    neighbors; measured 0.90 at sf0.01 with (16 dims, 300 shortlist) —
    pin a floor with headroom (a slicing/rank regression collapses it)."""
    exact = _topk_sets(S.ann_cosine_topk(spark, SF).collect())
    tr = _topk_sets(S.ann_cosine_topk_truncated(spark, SF).collect())
    recalls = [len(exact[q] & tr[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.75, recalls


def test_truncated_prescreen_scores_are_exact_cosine(spark):
    """Emitted scores must equal the exact cosine for that pair — the
    truncation may only affect WHICH pairs surface, never their scores."""
    exact = {
        (r.query_id, r.neighbor_id): r.score
        for r in S.ann_cosine_topk(spark, SF).collect()
    }
    for r in S.ann_cosine_topk_truncated(spark, SF).collect():
        key = (r.query_id, r.neighbor_id)
        if key in exact:
            assert r.cosine == exact[key], key


def test_pca_matches_numpy_and_run_deterministic(spark):
    import duckdb
    import numpy as np

    from kinesis_demo_spark.io import release_persisted
    from kinesis_demo_spark.queries.similarity import (
        PCA_TOP_COMPONENTS,
        pca_embedding_components,
    )

    vecs = np.array(
        duckdb.sql(f"SELECT embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id").fetchnumpy()[
            "embedding"
        ].tolist(),
        dtype=np.float64,
    )
    cov = np.cov(vecs, rowvar=False, ddof=1)
    vals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    want_ratios = vals[:PCA_TOP_COMPONENTS] / vals.sum()

    got = sorted(pca_embedding_components(spark, SF).collect(), key=lambda r: r.component)
    release_persisted()
    for r, wv, wr in zip(got, vals, want_ratios):
        # the engine folds float32-cast-to-double sequentially while numpy
        # sums pairwise over the same doubles — identical mathematical
        # covariance, last-ulp summation differences only
        assert abs(r.eigenvalue - wv) < 1e-9 * max(1.0, abs(wv)), r
        assert abs(r.explained_ratio - wr) < 1e-9, r
    # spectra are positive and ordered; ratios bounded
    assert all(g.eigenvalue > 0 for g in got)
    assert [g.component for g in got] == list(range(1, PCA_TOP_COMPONENTS + 1))
    # byte-identical across runs (ordered folds)
    again = sorted(pca_embedding_components(spark, SF).collect(), key=lambda r: r.component)
    release_persisted()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]


def test_hard_negatives_exclude_near_duplicates(spark):
    """Mined negatives must be disjoint from the near-dup set (score >=
    threshold) and be exactly the top-K below-threshold neighbors from the
    exact ranking."""
    from kinesis_demo_spark.queries.similarity import (
        HARD_NEG_MAX_SCORE,
        TOP_K,
        ann_cosine_topk,
        mine_hard_negatives,
    )

    sf = "/root/testdata/sf0.001"
    negs = mine_hard_negatives(spark, sf).collect()
    assert negs
    for r in negs:
        assert r.score < HARD_NEG_MAX_SCORE
    per_q = {}
    for r in negs:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rows in per_q.items():
        assert len(rows) <= TOP_K
        ranks = sorted(r.rnk for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        scores = [r.score for r in sorted(rows, key=lambda x: x.rnk)]
        assert scores == sorted(scores, reverse=True)
    # every exact top-k neighbor under the threshold must appear (the LSH
    # shortlist can only shrink recall, and at smoke scale buckets recall
    # these; disjointness with the dup window is the hard guarantee)
    exact = ann_cosine_topk(spark, sf).collect()
    dup_pairs = {(r.query_id, r.neighbor_id) for r in exact if r.score >= HARD_NEG_MAX_SCORE}
    neg_pairs = {(r.query_id, r.neighbor_id) for r in negs}
    assert not (dup_pairs & neg_pairs)


def test_hamming_binary_recall_at_10_vs_exact(spark):
    """Binary-quantized Hamming screen + exact re-rank; measured recall@10
    1.0 at sf0.01 / 0.96+ at sf0.001 with the 200-shortlist. Pin a floor
    with headroom — a packing or popcount regression collapses it."""
    exact = _topk_sets(S.ann_cosine_topk(spark, SF).collect())
    ham = _topk_sets(S.ann_hamming_binary(spark, SF).collect())
    recalls = [len(exact[q] & ham[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_hamming_binary_scores_are_exact_cosine(spark):
    """The screen may only affect WHICH pairs surface — emitted scores must
    equal the exact brute-force cosine bit-for-bit."""
    exact = {
        (r.query_id, r.neighbor_id): r.score
        for r in S.ann_cosine_topk(spark, SF).collect()
    }
    for r in S.ann_hamming_binary(spark, SF).collect():
        key = (r.query_id, r.neighbor_id)
        if key in exact:
            assert r.cosine == exact[key], key


def test_hamming_signature_words_pack_all_64_dims(spark):
    """Each sign word packs exactly 32 dims: flipping any single dimension's
    sign flips exactly one bit of exactly one word (probe two dims per
    word at the boundaries)."""
    from pyspark.sql import functions as F

    base = [1.0] * 64
    rows = [(0, base)]
    for probe in (1, 32, 33, 64):  # 1-based dim positions: word edges
        vec = list(base)
        vec[probe - 1] = -1.0
        rows.append((probe, vec))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {
        r.vec_id: (r.w0, r.w1)
        for r in df.select(
            "vec_id",
            S._sign_word(F.col("embedding"), 0).alias("w0"),
            S._sign_word(F.col("embedding"), 1).alias("w1"),
        ).collect()
    }
    full = (1 << 32) - 1
    assert out[0] == (full, full)
    assert out[1] == (full - 1, full)            # dim 1 -> bit 0 of w0
    assert out[32] == (full - (1 << 31), full)   # dim 32 -> bit 31 of w0
    assert out[33] == (full, full - 1)           # dim 33 -> bit 0 of w1
    assert out[64] == (full, full - (1 << 31))   # dim 64 -> bit 31 of w1


def test_pca_scatter_and_effective_rank_match_numpy(spark):
    """Integer scatter matrix and participation-ratio effective rank vs
    direct numpy evaluation on the same quantized embeddings — the two
    hash-checked halves of the PCA pipeline (the eigensolve half keeps its
    own differential above)."""
    import duckdb
    import numpy as np

    from kinesis_demo_spark.queries.similarity import (
        PCA_Q,
        pca_effective_rank,
        pca_scatter_moments,
    )

    V = np.array(
        duckdb.sql(
            f"SELECT embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
        ).fetchnumpy()["embedding"].tolist(),
        dtype=np.float64,
    )
    q = np.floor(V * PCA_Q + 0.5).astype(np.int64)
    n, dim = q.shape
    M = n * (q.T @ q) - np.outer(q.sum(0), q.sum(0))  # exact: |entries| << 2^53? no — int64 matmul
    got = {(r.i, r.j): r.scatter for r in pca_scatter_moments(spark, SF).collect()}
    assert len(got) == dim * (dim + 1) // 2
    for (i, j), v in got.items():
        assert v == int(M[i - 1, j - 1]), (i, j)
    r = pca_effective_rank(spark, SF).collect()[0]
    tr = int(np.trace(M))
    s2 = int((M.astype(object) * M.astype(object)).sum())
    assert r.trace_scatter == tr
    assert r.effective_rank6 == (tr * tr * 1_000_000) // s2
    assert r.n_vectors == n and r.dim == dim
    # the participation ratio agrees with the eigenvalue definition
    vals = np.linalg.eigvalsh(M.astype(np.float64))
    er_eig = float(vals.sum() ** 2 / (vals**2).sum())
    assert abs(r.effective_rank - er_eig) < 1e-3
    assert r.top_variance_dim == int(np.argmax(np.diag(M))) + 1
