"""Round-13 operators: the sparse decomposition twin and the corpus drift
report — known-answer pins beyond the fixture oracle differentials."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from .conftest import SF_SMOKE


def test_decomposition_sparse_equals_dense_on_observed(spark):
    """The sparse twin must emit EXACTLY the dense decomposition's rows
    restricted to observed hours — same engine, so any mismatch is the
    rewrite's fault, not cross-engine arithmetic."""
    from pyspark.sql import functions as F

    from kinesis_demo_spark.queries.analytics import (
        _events,
        timeseries_classical_decomposition,
        timeseries_decomposition_sparse,
    )
    from kinesis_demo_spark.functions.timeutil import trunc_hour_ntz

    dense = timeseries_classical_decomposition(spark, SF_SMOKE)
    sparse = timeseries_decomposition_sparse(spark, SF_SMOKE)
    obs = (
        _events(spark, SF_SMOKE)
        .select(
            "user_id",
            trunc_hour_ntz(F.col("ts").cast("timestamp_ntz")).alias("hour"),
        )
        .distinct()
    )
    dense_obs = dense.join(obs, ["user_id", "hour"])
    got = {tuple(r) for r in sparse.collect()}
    want = {tuple(r) for r in dense_obs.collect()}
    assert len(got) > 100
    assert got == want


def test_decomposition_sparse_gap_window(spark, tmp_path):
    """A 30-hour gap inside one user's series: hours adjacent to the gap
    lose their full 25-hour window on the DENSE grid (the zero-filled
    hours count), so the sparse twin must reproduce the dense trend that
    includes those zeros — the exact case a naive sparse MA gets wrong."""
    from kinesis_demo_spark.queries.analytics import (
        timeseries_classical_decomposition,
        timeseries_decomposition_sparse,
    )

    t0 = dt.datetime(2024, 3, 1)
    hours = list(range(40)) + list(range(70, 110))  # 30-hour hole
    rows = [(i, t0 + dt.timedelta(hours=h), 1, "view", float(h)) for i, h in enumerate(hours)]
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
    dense = {
        (r.hour, r.y): (r.trend, r.seasonal, r.remainder)
        for r in timeseries_classical_decomposition(spark, str(tmp_path)).collect()
        if r.y != 0.0  # observed hours all have y = float(h) > 0 except h=0
        or r.hour == t0
    }
    sparse = {
        (r.hour, r.y): (r.trend, r.seasonal, r.remainder)
        for r in timeseries_decomposition_sparse(spark, str(tmp_path)).collect()
    }
    assert sparse == dense
    # the gap-adjacent observed hour 39 has a full window only because the
    # dense grid supplies zero-filled hours 40..51: its trend must reflect
    # the zeros (MA over [27..51] = values 27..39 plus 12 zeros)
    h39 = t0 + dt.timedelta(hours=39)
    want_trend = sum(range(27, 40)) / 25.0
    assert sparse[(h39, 39.0)][0] == want_trend


def test_corpus_drift_report_known_answer(spark, tmp_path):
    """Hand-planted two-source corpus: one source drifts (disjoint vocab
    between halves -> TVD 1, Jaccard 0), one is byte-stable across halves
    with doc_ids chosen so the h60 split puts one copy in each half
    (TVD 0, Jaccard 1)."""
    from kinesis_demo_spark.functions.hashing import h60
    from pyspark.sql import functions as F

    from kinesis_demo_spark.queries.corpus import corpus_drift_report

    # find doc_ids per half under the real split hash
    ids = spark.range(0, 64).select(
        "id", (h60(F.col("id").cast("string")) % 2).alias("half")
    ).collect()
    a_ids = [r.id for r in ids if r.half == 0]
    b_ids = [r.id for r in ids if r.half == 1]
    assert len(a_ids) >= 2 and len(b_ids) >= 2

    docs = [
        # stable source: identical text in both halves
        (a_ids[0], "alpha beta gamma", "en", "stable"),
        (b_ids[0], "alpha beta gamma", "en", "stable"),
        # drifted source: disjoint vocab between halves
        (a_ids[1], "old1 old2 old3", "en", "drifted"),
        (b_ids[1], "new1 new2 new3", "en", "drifted"),
    ]
    cols = list(zip(*docs))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(cols[0], pa.int64()),
                "text": pa.array(cols[1], pa.string()),
                "lang": pa.array(cols[2], pa.string()),
                "source": pa.array(cols[3], pa.string()),
                "n_chars": pa.array([len(t) for t in cols[1]], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = {r.source: r for r in corpus_drift_report(spark, str(tmp_path)).collect()}
    s, d = rows["stable"], rows["drifted"]
    assert (s.n_docs_a, s.n_docs_b, s.tokens_a, s.tokens_b) == (1, 1, 3, 3)
    assert s.tvd == 0.0 and s.vocab_jaccard == 1.0
    assert s.n_new_terms == 0 and s.n_dropped_terms == 0 and s.n_common_terms == 3
    assert d.tvd == 1.0 and d.vocab_jaccard == 0.0
    assert d.n_new_terms == 3 and d.n_dropped_terms == 3 and d.n_common_terms == 0


def test_corpus_drift_report_empty_half_is_null(spark, tmp_path):
    """A source whose docs all hash into one half: drift undefined -> NULL
    tvd, counts still exact."""
    from kinesis_demo_spark.functions.hashing import h60
    from pyspark.sql import functions as F

    from kinesis_demo_spark.queries.corpus import corpus_drift_report

    ids = spark.range(0, 64).select(
        "id", (h60(F.col("id").cast("string")) % 2).alias("half")
    ).collect()
    a_ids = [r.id for r in ids if r.half == 0]
    docs = [(a_ids[0], "solo tokens here", "en", "onesided")]
    cols = list(zip(*docs))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(cols[0], pa.int64()),
                "text": pa.array(cols[1], pa.string()),
                "lang": pa.array(cols[2], pa.string()),
                "source": pa.array(cols[3], pa.string()),
                "n_chars": pa.array([len(t) for t in cols[1]], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    row = corpus_drift_report(spark, str(tmp_path)).collect()[0]
    assert (row.n_docs_a, row.n_docs_b) == (1, 0)
    assert row.tokens_b == 0
    assert row.tvd is None
    assert row.n_dropped_terms == 3 and row.n_new_terms == 0
