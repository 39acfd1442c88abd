"""Adversarial-fixture regression pins (r8): the 21 queries the hostile
micro-fixture sweep (tools/gen_adversarial_fixture.py + tools/parity_sweep.py,
artifact PARITY_ADVERSARIAL.json) caught diverging from their oracles or
crashing on dirty data — NULL keys/values/types, corrupt JSON, empty and
whitespace-only documents, ties everywhere, zero spreads, duplicate event
ids. Each fix is a behavior contract now; this module re-runs exactly those
queries against the generated fixture so any regression in NULL semantics,
tie-break order, or empty-input guards fails fast in the normal suite
(the full-registry adversarial sweep stays a per-round artifact — 254
queries are too heavy for pytest).
"""

from __future__ import annotations

import subprocess
import sys

import pytest

from kinesis_demo_spark.registry import all_oracle_sql, all_queries

from .oracle_harness import compare, duckdb_conn

# The r8 adversarial-sweep catch list — crashes first, then NULL/tie gaps.
CAUGHT = (
    "ewma_value_per_user",            # empty frame -> descending sequence -> OOB weight index
    "skipgram_pair_counts",           # 1-token doc -> negative slice length
    "outliers_value_mad",             # MAD=0 -> ANSI divide-by-zero
    "seasonal_hour_anomalies",        # all-zero baseline -> ANSI divide-by-zero
    "grouped_pandas_user_stats",      # NaN astype int64 crash; NULL group key
    "variant_props_extract",          # parse_json FAILFAST on corrupt props
    "sessionize_stateful_streaming",  # NaN cents crash; all-NULL session sum
    "json_extract_props",             # oracle crashed on malformed JSON
    "stats_corr_value_props",         # oracle crashed on malformed JSON
    "feature_quantile_binning",       # NULL value -> phantom bin row
    "stats_argminmax_value",          # NULL-field struct ordering flips per engine
    "agg_collect_set_event_types",    # collect_set drops NULLs, list(DISTINCT) keeps
    "profile_events_columns",         # HUGEINT sum dtype drift
    "table_checksums",                # concat_ws skips NULLs vs || nulls the row
    "top_event_paths",                # NULL leg -> fake pair path vs NULL path
    "window_functions_battery",       # NULLS FIRST/LAST default mismatch in rank sort
    "sql_table_function_summary",     # = vs <=> on the NULL key group
    "er_golden_record",               # survivorship tie must prefer attested over NULL
    "streaming_session_windows",      # streaming state drops NULL keys, batch kept them
    "multimodal_decode_features",     # ascii('') is 0, not NULL, in the oracle
    "multimodal_frame_sample",        # same, for the sampled byte of an empty payload
    # r9 continuation-session catches, pinned the same way:
    "rolling_active_users_intervals",  # dense grid emitted zero-active hours
    "approx_percentile_rank_bound",    # equi-join dropped the NULL event_type group
)


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sfadv")
    subprocess.run(
        [sys.executable, "tools/gen_adversarial_fixture.py", str(out)],
        check=True,
        cwd="/root/repo",
    )
    return str(out)


@pytest.fixture(scope="module")
def adv_con(adv_dir):
    con = duckdb_conn(adv_dir)
    yield con
    con.close()


QUERIES = all_queries()
ORACLE = all_oracle_sql()


@pytest.mark.parametrize("name", CAUGHT)
def test_adversarial_fixture_parity(name, spark, adv_dir, adv_con):
    df = QUERIES[name](spark, adv_dir)
    problems = compare(df, adv_con, ORACLE[name], name)
    assert not problems, "\n".join(problems)


# --- unicode axis (the --unicode fixture; multimodal excluded by design) ------

# the two r8 unicode catches plus representative text-family coverage:
# shingling/dedup, tokenization stats, language ID, chunking, fingerprints
UNICODE_PINNED = (
    "pandas_udf_text_normalize",   # full-vs-simple case mapping of U+0130
    "dedup_sorted_neighborhood",   # zero Jaccard union on shingle-less pairs
    "dedup_exact_text",
    "dedup_ngram_jaccard",
    "dedup_substring_runs",
    "text_token_count",
    "text_vocab_topk",
    "text_lang_id",
    "text_chunk_documents",
    "text_fingerprint",
    "bpe_encode_corpus",
    "corpus_datacard",
)


@pytest.fixture(scope="module")
def uni_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sfuni")
    subprocess.run(
        [sys.executable, "tools/gen_adversarial_fixture.py", "--unicode", str(out)],
        check=True,
        cwd="/root/repo",
    )
    return str(out)


@pytest.fixture(scope="module")
def uni_con(uni_dir):
    con = duckdb_conn(uni_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", UNICODE_PINNED)
def test_unicode_fixture_parity(name, spark, uni_dir, uni_con):
    df = QUERIES[name](spark, uni_dir)
    problems = compare(df, uni_con, ORACLE[name], name)
    assert not problems, "\n".join(problems)
