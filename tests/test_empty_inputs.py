"""Empty-input robustness: every operator family must return an empty (or
correctly degenerate) result on empty tables — not crash. At 100 TB, empty
partitions/date-ranges are routine, not exceptional."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_demo_spark.schemas import DOCUMENTS, EMBEDDINGS, EVENTS


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for name, schema in (
        ("documents", DOCUMENTS),
        ("embeddings", EMBEDDINGS),
        ("events", EVENTS),
    ):
        spark.createDataFrame([], schema).write.parquet(str(out / f"{name}.parquet"))
    return str(out)


def test_dedup_suite_on_empty_documents(spark, empty_dir):
    from kinesis_demo_spark.queries import dedup as D

    assert D.dedup_exact_text(spark, empty_dir).count() == 0
    assert D.dedup_ngram_jaccard(spark, empty_dir).count() == 0
    assert D.dedup_minhash_lsh(spark, empty_dir).count() == 0
    assert D.dedup_simhash(spark, empty_dir).count() == 0


def test_ann_on_empty_embeddings(spark, empty_dir):
    from kinesis_demo_spark.queries import similarity as S

    assert S.ann_cosine_topk(spark, empty_dir).count() == 0
    assert S.ann_cosine_topk_lsh(spark, empty_dir).count() == 0
    assert S.ann_cosine_topk_ivf(spark, empty_dir).count() == 0


def test_sessionize_and_serving_on_empty_events(spark, empty_dir):
    from kinesis_demo_spark.operators.sessionize import batch_sessionize
    from kinesis_demo_spark.io import load_table
    from kinesis_demo_spark.plans.movements import movement_aggregates

    events = load_table(spark, empty_dir, "events")
    assert batch_sessionize(events).count() == 0
    assert movement_aggregates(events).count() == 0


def test_single_word_and_empty_docs_shingle_safely(spark, tmp_path):
    from kinesis_demo_spark.queries.dedup import shingles_col

    rows = [(0, ""), (1, "one"), (2, "two words"), (3, "now three words")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r.s for r in df.select("doc_id", shingles_col().alias("s")).collect()}
    assert out[0] == [] and out[1] == [] and out[2] == []
    assert out[3] == ["now three words"]


def test_round3_ops_on_empty_tables(spark, empty_dir):
    from kinesis_demo_spark.queries import dedup as D
    from kinesis_demo_spark.queries import text as T
    from kinesis_demo_spark.queries import training_prep as P

    assert D.dedup_embedding_cosine_lsh(spark, empty_dir).count() == 0
    assert D.dedup_contamination_check(spark, empty_dir).count() == 0
    assert D.dedup_ngram_jaccard_prefix(spark, empty_dir).count() == 0
    assert T.text_tfidf(spark, empty_dir).count() == 0
    assert T.text_pii_redact(spark, empty_dir).count() == 0
    assert P.sample_stratified_documents(spark, empty_dir).count() == 0
    assert P.sequence_packing(spark, empty_dir).count() == 0
    assert P.embedding_quantize_int8(spark, empty_dir).count() == 0


def test_r5_operators_on_empty_tables(spark, empty_dir):
    from kinesis_demo_spark.queries import analytics as A
    from kinesis_demo_spark.queries import corpus as C
    from kinesis_demo_spark.queries import dedup as D
    from kinesis_demo_spark.queries import similarity as S

    assert A.funnel_user_stages(spark, empty_dir).count() == 0
    assert A.cohort_weekly_retention(spark, empty_dir).count() == 0
    assert A.event_transition_matrix(spark, empty_dir).count() == 0
    assert A.event_cooccurrence_lift(spark, empty_dir).count() == 0
    assert A.hopping_window_counts(spark, empty_dir).count() == 0
    assert D.dedup_shingle_containment(spark, empty_dir).count() == 0
    assert S.ann_pq_adc_topk(spark, empty_dir).count() == 0
    assert C.retrieval_rank_fusion(spark, empty_dir).count() == 0


def test_r5_continuation_text_ops_on_empty_documents(spark, empty_dir):
    from kinesis_demo_spark.queries import text as X

    assert X.text_winnowing_fingerprints(spark, empty_dir).count() == 0
    assert X.dedup_winnowing_overlap(spark, empty_dir).count() == 0
    assert X.text_freq_quality(spark, empty_dir).count() == 0
    assert X.text_bigram_lm(spark, empty_dir).count() == 0


def test_bpe_trainer_on_empty_documents(spark, empty_dir):
    from kinesis_demo_spark.queries.corpus import bpe_train_merges

    # no pairs anywhere -> the loop must terminate with an empty merge table
    assert bpe_train_merges(spark, empty_dir).count() == 0


def test_truncated_ann_and_drift_on_empty_embeddings(spark, empty_dir):
    from kinesis_demo_spark.queries import similarity as S

    assert S.ann_cosine_topk_truncated(spark, empty_dir).count() == 0
    assert S.embedding_source_drift(spark, empty_dir).count() == 0


def test_trend_and_pit_on_empty_events(spark, empty_dir, tmp_path_factory):
    from kinesis_demo_spark.queries.analytics import trend_slope_per_user

    assert trend_slope_per_user(spark, empty_dir).count() == 0


def test_final_wave_event_ops_on_empty_events(spark, empty_dir):
    from kinesis_demo_spark.queries import analytics as A

    assert A.interval_union_coverage(spark, empty_dir).count() == 0
    assert A.top_event_paths(spark, empty_dir).count() == 0
    assert A.cusum_value_alarms(spark, empty_dir).count() == 0
    assert A.trimmed_mean_value_by_type(spark, empty_dir).count() == 0
    assert A.twap_value_per_user(spark, empty_dir).count() == 0
    assert A.rolling_active_users(spark, empty_dir).count() == 0


def test_r6_additions_on_empty_documents(spark, empty_dir):
    from kinesis_demo_spark.queries import dedup as D
    from kinesis_demo_spark.queries import multimodal as M

    assert D.dedup_ngram_jaccard_df_capped(spark, empty_dir).count() == 0
    assert D.dedup_clusters(spark, empty_dir).count() == 0  # converges round 1
    report = D.dedup_quality_report(spark, empty_dir).collect()
    assert len(report) == 1  # one metrics row even on an empty corpus
    assert (report[0].n_truth, report[0].n_approx, report[0].tp) == (0, 0, 0)
    assert report[0].precision is None and report[0].recall is None
    assert M.multimodal_decode_real(spark, empty_dir).count() == 0


def test_filtering_suite_on_empty_documents(spark, empty_dir):
    from kinesis_demo_spark.queries import filtering as FL

    assert FL.filter_gopher_rules(spark, empty_dir).count() == 0
    assert FL.lm_fluency_score(spark, empty_dir).count() == 0
    assert FL.dsir_importance_resample(spark, empty_dir).count() == 0
    assert FL.training_order_shuffle(spark, empty_dir).count() == 0
    assert FL.token_shard_assembly(spark, empty_dir).count() == 0


def test_star_clusters_and_binary_ann_on_empty_inputs(spark, empty_dir):
    from kinesis_demo_spark.queries.dedup import dedup_clusters_star
    from kinesis_demo_spark.queries.similarity import ann_hamming_binary

    assert dedup_clusters_star(spark, empty_dir).count() == 0
    assert ann_hamming_binary(spark, empty_dir).count() == 0
