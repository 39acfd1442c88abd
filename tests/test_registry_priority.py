"""The driver's CORRECTNESS gate only checks the FIRST
``DRIVER_CORRECTNESS_CAP`` registry entries (round 2's file stopped at
exactly 50 of 80, in registration order), so the curated ``PRIORITY_ORDER``
must stay exactly cap-sized, fully registered, and contain at least one
representative of every operator family."""

from __future__ import annotations

from kinesis_demo_spark.registry import (
    DRIVER_CORRECTNESS_CAP,
    PRIORITY_ORDER,
    all_oracle_sql,
    all_queries,
)

# family -> member names; each family needs a member inside the driver cap
# OR a member with a recorded driver CORRECTNESS row from a past round (the
# rotation ledger — below-cap members stay verified every round by
# tests/test_oracle_parity.py). This is the r6 form of the invariant: the
# cap is a rotation window for first-time evidence, not a permanent home.
FAMILY_REPRESENTATIVES = {
    "text": ("text_lang_id", "text_quality_score", "text_token_count", "text_fingerprint"),
    "tfidf": ("text_tfidf",),
    "sampling": ("sample_stratified_documents", "sample_k_per_group"),
    "packing": ("sequence_packing",),
    "quantization": ("embedding_quantize_int8",),
    "contamination": ("dedup_contamination_check",),
    "multimodal": ("multimodal_metadata", "multimodal_decode_features", "multimodal_frame_sample"),
    "streaming": ("streaming_window_counts",),
    "stream_stream_join": ("streaming_interval_join",),
    "sessionize": (
        "sessionize_events",
        "sessionize_stateful_streaming",
        "sessionize_builtin_window",
    ),
    "stats": (
        "stats_moments_percentiles_by_type",
        "stats_corr_value_props",
        "stats_argminmax_value",
        "stats_mode_event_type_per_user",
    ),
    "timeseries": ("timeseries_hourly_gapfill", "timeseries_user_similarity"),
    # approx_percentiles_value / uuid_generate are oracle=None (permanent
    # `no_oracle` driver rows) so they never hold cap slots; the sketch family
    # is represented by the hash-checkable count-min-sketch query and F1's
    # parity lives in scalar_functions_parity's md5 surrogate.
    "approx_sketch": ("heavy_hitters_cms",),
    "pii": ("text_pii_redact",),
    "training_pipeline": ("pipeline_training_corpus", "pipeline_training_manifest"),
    "map_in_arrow": ("map_in_arrow_vector_norms",),
    "ewma": ("ewma_value_per_user",),
    "phash": ("phash_image_neardup",),
    "subquery_decorrelation": ("orders_above_customer_avg",),
    "window_funcs": ("window_functions_battery",),
    "scalar_extended": ("scalar_extended_battery", "scalar_array_functions"),
    "wire": ("json_wire_roundtrip",),
    "skew": ("salted_sum_by_user",),
    "pandas_udf": ("pandas_udf_text_normalize", "grouped_pandas_user_stats"),
    "reshape": ("pivot_value_by_type_per_user", "unpivot_order_amounts", "posexplode_document_tokens"),
    "serving_q": ("serving_forward_poll", "serving_reverse_limit", "serving_cursor_bootstrap"),
    "window_agg": ("agg_window_movs_stats", "last10_per_user"),
    "heatmap_locf": ("heatmap_rollup", "locf_impute_value"),
    "scalar_parity": ("scalar_functions_parity",),
    # F10 JSON parse is exercised by both: the roundtrip query parses what it
    # serialized, so either satisfies the family while the other rotates out.
    "json": ("json_extract_props", "json_wire_roundtrip"),
    # the SQL front-end query is a joins+aggregate shape over the same star
    # schema — a valid relational-agg representative while TPC-H rows rotate.
    "relational_agg": ("tpch_q1_pricing_summary", "sql_frontend_revenue_by_nation"),
    "relational_join": ("star_join_revenue_by_region",),
    "set_ops": ("set_ops_nations",),
    "asof_range_join": ("asof_join_orders_events", "range_join_events_before_orders"),
    "dedup": ("dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_cosine_lsh", "dedup_quality_report", "dedup_clusters"),
    "ann": ("ann_cosine_topk_lsh", "ann_pq_adc_topk", "ann_cosine_topk_truncated"),
    # families that debut in the r6 cap
    "tpch": ("tpch_q1_pricing_summary", "tpch_q9_product_profit", "tpch_q21_waiting_suppliers"),
    "recursive": ("recursive_hierarchy_rollup",),
    "python_datasource": ("python_datasource_events", "python_datasource_stream_events"),
    "sql_surfaces": ("sql_modern_surfaces", "sql_table_function_summary"),
    "temporal_join": ("pit_feature_join_orders", "temporal_join_orders_state"),
    "retrieval": ("text_bm25_topk", "retrieval_rank_fusion"),
    "corpus_mixture": ("corpus_mixture_report", "sample_mixture_weighted", "curriculum_quality_buckets"),
    "bpe": ("bpe_merge_candidates", "bpe_train_merges"),
    "real_codec": ("multimodal_decode_real",),
    "iterative_graph": ("pagerank_copurchase", "dedup_clusters"),
    "kmeans": ("kmeans_embeddings", "embedding_centroid_by_label"),
    # families that debut in the r11 cap
    "linkpred": ("graph_linkpred_common_neighbors",),
    "forecast_eval": ("timeseries_seasonal_naive_eval", "holt_linear_forecast"),
}


def _past_driver_rows() -> set[str]:
    """Query names with at least one recorded driver CORRECTNESS row."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        try:
            rows = json.load(open(f))
        except Exception:
            continue
        # Only GREEN rows count as driver evidence: a hash match, or a
        # rows-only match for the sanctioned oracle-None iteratives. Red rows
        # and err='no_oracle' placeholders don't verify anything (ADVICE r6).
        for name, row in rows.items():
            if isinstance(row, dict) and (
                row.get("hash_match") is True or row.get("rows_match") is True
            ):
                seen.add(name)
    return seen


def test_priority_is_exactly_cap_sized():
    assert len(PRIORITY_ORDER) == DRIVER_CORRECTNESS_CAP
    assert len(set(PRIORITY_ORDER)) == DRIVER_CORRECTNESS_CAP


def test_priority_names_all_registered():
    registered = set(all_queries())
    missing = [n for n in PRIORITY_ORDER if n not in registered]
    assert not missing, f"PRIORITY_ORDER names not in registry: {missing}"


def test_registry_leads_with_priority_order():
    names = list(all_queries())
    assert names[:DRIVER_CORRECTNESS_CAP] == list(PRIORITY_ORDER)


def test_every_family_has_driver_evidence():
    """Every family has a member inside the current cap OR a member with a
    past driver CORRECTNESS row (whose plan the rotation policy requires to
    be untouched while below-cap — see registry.py)."""
    window = set(list(all_queries())[:DRIVER_CORRECTNESS_CAP])
    past = _past_driver_rows()
    uncovered = {
        fam: reps
        for fam, reps in FAMILY_REPRESENTATIVES.items()
        if not any(r in window or r in past for r in reps)
    }
    assert not uncovered, f"families with no driver evidence at all: {uncovered}"


def test_cap_rows_nonempty_at_gate_sf_unless_allowlisted(spark):
    """VERDICT r10 #6: a green driver row with spark_rows == 0 is a vacuous
    match — for every cap query, its MOST RECENT recorded driver row must be
    non-empty unless the emptiness is declared (with a reason) on
    registry.MAY_BE_EMPTY, OR the current plan provably returns rows at the
    gate SF now (a query rotated into the cap precisely BECAUSE its vacuity
    was fixed this round — graph_kcore r11 — has only the stale 0-row record
    until the next driver round, so those candidates are re-run LIVE at
    sf0.01 instead of trusting the stale record either way). New cap
    entrants without any driver row are skipped (their first row lands next
    round and this test then bites)."""
    import glob
    import json
    import os
    import re

    from kinesis_demo_spark.io import release_persisted
    from kinesis_demo_spark.registry import may_be_empty_at

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest: dict[str, tuple[int, dict]] = {}
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        try:
            rows = json.load(open(f))
        except Exception:
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("rows_match") is True:
                if name not in newest or rnd > newest[name][0]:
                    newest[name] = (rnd, row)
    candidates = [
        name
        for name in PRIORITY_ORDER
        if name in newest
        and newest[name][1].get("spark_rows") == 0
        and not may_be_empty_at(name, "/root/testdata/sf0.01")
    ]
    qs = all_queries()
    vacuous = []
    for name in candidates:
        n = qs[name](spark, "/root/testdata/sf0.01").count()
        release_persisted()
        if n == 0:
            vacuous.append(name)
    assert not vacuous, (
        f"cap queries whose most recent driver row is a 0-row match, whose "
        f"current plan is STILL empty at the gate SF, and which are not "
        f"declared in registry.MAY_BE_EMPTY: {vacuous}"
    )


def test_may_be_empty_names_are_registered():
    from kinesis_demo_spark.registry import MAY_BE_EMPTY

    registered = set(all_queries())
    bad = [n for n in MAY_BE_EMPTY if n not in registered]
    assert not bad, f"MAY_BE_EMPTY names not in registry: {bad}"


def test_oracle_order_is_a_subsequence_of_query_order():
    qnames = list(all_queries())
    onames = list(all_oracle_sql())
    pos = {n: i for i, n in enumerate(qnames)}
    assert all(n in pos for n in onames)
    assert onames == sorted(onames, key=pos.__getitem__)


def test_micro_fixture_match_is_positive(tmp_path):
    """ADVICE r11 #1: the "micro" allowance must match POSITIVELY (marker
    file or well-known basename), never "any dir outside /root/testdata" —
    a full-scale generated fixture like /tmp/sf1 must keep the full
    vacuous-green guard."""
    from kinesis_demo_spark.registry import MICRO_MARKER, may_be_empty_at

    name = "search_phrase_positions"  # declared ("sf0.001", "micro")

    # a full-scale fixture dir outside /root/testdata, no marker: NOT micro
    big = tmp_path / "sf1"
    big.mkdir()
    assert not may_be_empty_at(name, str(big))

    # same dir carrying the generator's marker: micro
    (big / MICRO_MARKER).write_text("x")
    assert may_be_empty_at(name, str(big))

    # well-known hostile basenames match without a marker
    adv = tmp_path / "sfadv"
    adv.mkdir()
    assert may_be_empty_at(name, str(adv))

    # driver-fixture declaration matches through a relative path (realpath)
    import os

    rel = os.path.relpath("/root/testdata/sf0.001", os.getcwd())
    assert may_be_empty_at(name, rel)
    assert not may_be_empty_at(name, "/root/testdata/sf0.01")
