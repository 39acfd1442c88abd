"""r12 operator pins: the sampled-truth ER audit and the incremental IVF
delta merge (VERDICT r11 #6/#7)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from .conftest import SF_SMOKE


def test_er_sampled_equals_exact_at_saturated_threshold(spark):
    """At fixtures with <= ER_SAMPLE_TARGET docs the hash threshold
    saturates: the sample IS the corpus, every true pair is anchored, and
    the estimator must EQUAL the exact audit's pairs_completeness — the
    in-driver-gate pin of estimator correctness. CI invariants hold too."""
    from kinesis_demo_spark.queries.dedup import (
        er_blocking_quality,
        er_blocking_quality_sampled,
    )

    s = er_blocking_quality_sampled(spark, SF_SMOKE).collect()[0]
    e = er_blocking_quality(spark, SF_SMOKE).collect()[0]
    assert s.n_docs == e.n_docs
    assert s.n_sampled == s.n_docs  # saturated
    assert s.sample_thr_ppm == 1_000_000
    assert s.n_true_anchored == e.n_true
    assert s.n_caught_anchored == e.n_caught
    assert s.pairs_completeness_est == e.pairs_completeness
    if s.n_true_anchored:
        assert 0.0 <= s.ci_low <= s.pairs_completeness_est <= s.ci_high <= 1.0


def test_ann_ivf_delta_merge_known_answer(spark, tmp_path):
    """Hand-planted corpus: 16 one-hot centroid vectors (the frozen
    codebook) plus four copies of centroid 0 — ids 16/17 land in the base,
    ids 18/19 in the delta (cut = 20*9 DIV 10 = 18). Cell 0 must report
    3 base / 2 delta, delta_mass 0.4 (> 0.15 -> rebuild), zero
    quantization error on both sides; every other cell is its own centroid
    alone, no delta, no rebuild."""
    from kinesis_demo_spark.queries.similarity import (
        N_CENTROIDS,
        ann_ivf_delta_merge,
    )

    dim = N_CENTROIDS
    vecs = []
    for i in range(N_CENTROIDS):
        v = [0.0] * dim
        v[i] = 1.0
        vecs.append((i, v, 0))
    e0 = [1.0] + [0.0] * (dim - 1)
    for i in range(16, 20):
        vecs.append((i, e0, 1))
    ids, embs, labels = zip(*vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(embs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    got = {
        r.cid: (r.n_base, r.n_delta, r.delta_mass, r.base_mean_qerr,
                r.delta_mean_qerr, r.rebuild)
        for r in ann_ivf_delta_merge(spark, str(tmp_path)).collect()
    }
    assert got[0] == (3, 2, 0.4, 0.0, 0.0, True)
    for cid in range(1, N_CENTROIDS):
        n_base, n_delta, mass, bq, dq, rb = got[cid]
        assert (n_base, n_delta, mass, rb) == (1, 0, 0.0, False)
        assert bq == 0.0 and dq is None


def test_classical_decomposition_linear_ramp(spark, tmp_path):
    """On a pure linear hourly ramp the centered moving average reproduces
    the series exactly: trend == y, seasonal == 0, remainder == 0, and only
    hours with the full 25-point window emit (indices 12..37 of 50)."""
    import datetime as dt

    from kinesis_demo_spark.queries.analytics import (
        timeseries_classical_decomposition,
    )

    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (i, t0 + dt.timedelta(hours=i), 1, "view", float(i))
        for i in range(50)
    ]
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(cols[0], pa.int64()),
                "ts": pa.array(cols[1], pa.timestamp("us")),
                "user_id": pa.array(cols[2], pa.int64()),
                "event_type": pa.array(cols[3], pa.string()),
                "value": pa.array(cols[4], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = sorted(
        (r.hour, r.y, r.trend, r.seasonal, r.remainder)
        for r in timeseries_classical_decomposition(spark, str(tmp_path)).collect()
    )
    assert len(got) == 26  # 50 hours, full 25-window at indices 12..37
    for k, (hour, y, trend, seasonal, remainder) in enumerate(got):
        i = k + 12
        assert y == float(i)
        assert trend == float(i)
        assert seasonal == 0.0
        assert remainder == 0.0


def test_er_sampled_null_ci_propagates(spark, tmp_path):
    """Zero anchored true pairs (every doc unique, no J >= t neighbor) must
    emit NULL ci_low/ci_high, not the misleading full-uncertainty [0, 1]
    that bare greatest/least produce by skipping a NULL phat (ADVICE r12
    #3) — cross-engine parity must not hinge on both engines agreeing to
    skip NULL args in greatest/least forever."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kinesis_demo_spark.queries.dedup import er_blocking_quality_sampled

    texts = [
        " ".join(f"tok{i}w{j}" for j in range(12)) for i in range(8)
    ]  # pairwise-disjoint shingle sets -> Jaccard 0 everywhere
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(8), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 8, pa.string()),
                "source": pa.array(["s0"] * 8, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    row = er_blocking_quality_sampled(spark, str(tmp_path)).collect()[0]
    assert row.n_true_anchored == 0
    assert row.pairs_completeness_est is None
    assert row.ci_low is None and row.ci_high is None
