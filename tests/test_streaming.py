"""Batch/streaming differential (SURVEY.md §5.4): the Structured Streaming
pipeline must produce exactly the batch answer, through both the test sink
(complete/memory) and the production sink shape (update + foreachBatch
upsert)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_demo_spark.io import load_table
from kinesis_demo_spark.streaming import pipeline as P

SF = "/root/testdata/sf0.001"


def _batch_answer(spark):
    events = load_table(spark, SF, "events")
    return (
        events.groupBy("user_id", F.window("ts", "1 second").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select("user_id", F.col("w.start").alias("window_start"), "cnt", "sum_value")
    )


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_complete_mode_equals_batch(spark):
    got = P.run_complete_to_memory(spark, SF, name="t_stream_complete")
    assert _as_set(got) == _as_set(_batch_answer(spark))


def test_foreach_batch_upsert_equals_batch(spark, tmp_path):
    got = P.run_foreach_batch_upsert(
        spark,
        SF,
        out_dir=str(tmp_path / "serving"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert _as_set(got) == _as_set(_batch_answer(spark))


def test_foreach_batch_upsert_is_idempotent_per_key(spark, tmp_path):
    """Re-running the drained stream with a fresh checkpoint re-merges every
    window; the keyed upsert must not duplicate rows."""
    out = str(tmp_path / "serving")
    P.run_foreach_batch_upsert(spark, SF, out_dir=out, checkpoint_dir=str(tmp_path / "c1"))
    got = P.run_foreach_batch_upsert(spark, SF, out_dir=out, checkpoint_dir=str(tmp_path / "c2"))
    batch = _batch_answer(spark)
    assert got.count() == batch.count()
    assert _as_set(got) == _as_set(batch)
