"""Invariant + differential tests for the corpus-level retrieval/curation
operators (queries/corpus.py). The value-hash gate lives in
test_oracle_parity; these pin the SEMANTICS: BM25 ranking behavior,
boilerplate-removal guarantees, mixture-share conservation, and a direct
Python recount differential for the BPE pair scan."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from kinesis_demo_spark.queries.corpus import (
    BM25_QUERY_TERMS,
    BM25_TOP_K,
    BPE_TOP_K,
    PARA_FOOTER_A,
    PARA_FOOTER_B,
    PARA_SEP,
    bpe_merge_candidates,
    corpus_mixture_report,
    dedup_boilerplate_paragraphs,
    text_bm25_topk,
)

from .conftest import SF_SMOKE


def _doc_texts() -> dict[int, str]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    con.close()
    return dict(rows)


def test_bm25_ranking_semantics(spark):
    out = text_bm25_topk(spark, SF_SMOKE).collect()
    assert 0 < len(out) <= BM25_TOP_K
    # ranks contiguous from 1, scores non-increasing, deterministic tie-break
    ranks = [r["rnk"] for r in out]
    assert ranks == list(range(1, len(out) + 1))
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # every hit matches at least one query term, and the tf columns agree
    # with a direct recount of the raw text
    texts = _doc_texts()
    for r in out:
        tfs = [r[f"tf_{i}"] for i in range(len(BM25_QUERY_TERMS))]
        assert sum(tfs) > 0 and r["score"] > 0
        toks = texts[r["doc_id"]].split(" ")
        for i, term in enumerate(BM25_QUERY_TERMS):
            assert tfs[i] == sum(1 for x in toks if x == term)


def test_boilerplate_footers_always_removed(spark):
    rows = dedup_boilerplate_paragraphs(spark, SF_SMOKE).collect()
    texts = _doc_texts()
    assert len(rows) == len(texts)
    for r in rows:
        # planted footers occur in |corpus|/3 (resp. /7) docs >= threshold,
        # so they must never survive
        assert PARA_FOOTER_A not in r["clean_text"]
        assert PARA_FOOTER_B not in r["clean_text"]
        # conservation: parts in clean_text == n_paras - n_removed
        n_kept = len(r["clean_text"].split(PARA_SEP)) if r["clean_text"] else 0
        assert n_kept == r["n_paras"] - r["n_removed"]
        # construction arity: body + optional footers
        expected_paras = 1 + (r["doc_id"] % 3 == 0) + (r["doc_id"] % 7 == 0)
        assert r["n_paras"] == expected_paras
    # a unique-bodied doc with no planted footer passes through verbatim
    body_freq = Counter(texts.values())
    untouched = [
        r
        for r in rows
        if r["doc_id"] % 3 != 0 and r["doc_id"] % 7 != 0 and body_freq[texts[r["doc_id"]]] < 3
    ]
    assert untouched, "fixture should contain unique plain docs"
    for r in untouched:
        assert r["clean_text"] == texts[r["doc_id"]]
        assert r["n_removed"] == 0


def test_mixture_report_conserves_tokens(spark):
    rows = corpus_mixture_report(spark, SF_SMOKE).collect()
    texts = _doc_texts()
    total = sum(len(t.split(" ")) for t in texts.values())
    assert sum(r["n_tokens"] for r in rows) == total
    assert sum(r["n_docs"] for r in rows) == len(texts)
    for r in rows:
        assert 0 < r["token_share"] <= 1
        # weight is share^0.5; upsample is its reciprocal
        assert r["sampling_weight"] == pytest.approx(r["token_share"] ** 0.5, rel=1e-12)
        assert r["upsample_factor"] == pytest.approx(1.0 / r["sampling_weight"], rel=1e-12)
    # shares sum to 1 across the partition of the corpus
    assert sum(r["token_share"] for r in rows) == pytest.approx(1.0, rel=1e-9)


def test_bpe_pairs_match_python_recount(spark):
    out = bpe_merge_candidates(spark, SF_SMOKE).collect()
    counter: Counter[str] = Counter()
    for text in _doc_texts().values():
        toks = text.split(" ")
        counter.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    expected = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_K]
    got = [(r["pair"], r["n"]) for r in sorted(out, key=lambda r: r["rnk"])]
    assert got == expected


def test_mixture_weighted_sample_rates(spark):
    from kinesis_demo_spark.queries.corpus import MIX_PPM, sample_mixture_weighted

    rows = sample_mixture_weighted(spark, SF_SMOKE).collect()
    assert rows
    # the rarest stratum is kept at exactly 100% (its keep_ppm is the
    # normalization anchor: floor(1.0 * PPM))
    assert max(r["keep_ppm"] for r in rows) == MIX_PPM
    # determinism: hash-threshold sampling reproduces exactly
    again = sample_mixture_weighted(spark, SF_SMOKE).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in again)
    # realized keep rate per stratum tracks keep_ppm (binomial tolerance)
    con = duckdb.connect()
    totals = dict(
        con.execute(
            f"SELECT source || '|' || lang, count(*) FROM '{SF_SMOKE}/documents.parquet' GROUP BY 1"
        ).fetchall()
    )
    con.close()
    kept: Counter[str] = Counter()
    ppm: dict[str, int] = {}
    for r in rows:
        key = f"{r['source']}|{r['lang']}"
        kept[key] += 1
        ppm[key] = r["keep_ppm"]
    for key, k in kept.items():
        n = totals[key]
        p = ppm[key] / MIX_PPM
        # 4-sigma binomial band; avoids flakiness while still catching a
        # broken threshold comparison
        sigma = (n * p * (1 - p)) ** 0.5
        assert abs(k - n * p) <= 4 * sigma + 1


def test_snapshot_diff_status_semantics(spark):
    from kinesis_demo_spark.queries.analytics import snapshot_diff_user_state

    rows = snapshot_diff_user_state(spark, SF_SMOKE).collect()
    assert rows
    assert {r["status"] for r in rows} <= {"added", "removed", "changed", "unchanged"}
    # one verdict per user, and 'unchanged' iff the latest event is identical
    users = [r["user_id"] for r in rows]
    assert len(users) == len(set(users))
    for r in rows:
        if r["status"] == "unchanged":
            assert r["last_id_a"] == r["last_id_b"] and r["val_a"] == r["val_b"]
        if r["status"] == "changed":
            assert r["last_id_a"] != r["last_id_b"]
        if r["status"] == "added":
            assert r["last_id_a"] == -1 and r["last_id_b"] != -1
        if r["status"] == "removed":
            assert r["last_id_b"] == -1 and r["last_id_a"] != -1


def test_curriculum_buckets_are_quartiles(spark):
    from kinesis_demo_spark.queries.corpus import curriculum_quality_buckets

    rows = curriculum_quality_buckets(spark, SF_SMOKE).collect()
    assert rows and {r["bucket"] for r in rows} == {0, 1, 2, 3}
    # bucket ordering respects score ordering
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["score"])
    for lo, hi in ((0, 1), (1, 2), (2, 3)):
        assert max(by_bucket[lo]) <= min(by_bucket[hi])
    # quartiles: no bucket holds more than ~35% of a 4-way split (exact
    # interpolated thresholds; ties can skew counts slightly)
    n = len(rows)
    for b, scores in by_bucket.items():
        assert len(scores) <= 0.35 * n, (b, len(scores), n)


def test_rank_fusion_score_is_rrf_of_both_legs(spark):
    from kinesis_demo_spark.queries import corpus as C

    rows = C.retrieval_rank_fusion(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= C.RRF_TOP_K
    for r in rows:
        expect = 0.0
        if r.lex_rnk is not None:
            expect += 1.0 / (C.RRF_K + r.lex_rnk)
        if r.dense_rnk is not None:
            expect += 1.0 / (C.RRF_K + r.dense_rnk)
        assert r.rrf_score == expect
    # fusion actually uses BOTH systems: at least one doc per leg
    assert any(r.lex_rnk is not None for r in rows)
    assert any(r.dense_rnk is not None for r in rows)
    # ranks are dense, deterministic, 1..n
    assert sorted(r.fused_rnk for r in rows) == list(range(1, len(rows) + 1))


# --- iterative BPE trainer ---------------------------------------------------


def _py_bpe(texts, rounds, sep):
    """Reference BPE trainer: greedy max-count pair (ties lexicographic),
    leftmost non-overlapping application."""
    docs = [t.split(" ") for t in texts if len(t.split(" ")) >= 2]
    merges = []
    for rnd in range(1, rounds + 1):
        counts = {}
        for toks in docs:
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] = counts.get((toks[i], toks[i + 1]), 0) + 1
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, a, b, a + sep + b, n))
        out_docs = []
        for toks in docs:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + sep + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            out_docs.append(out)
        docs = out_docs
    return merges


def test_bpe_trainer_matches_python_reference(spark):
    import duckdb

    from kinesis_demo_spark.queries.corpus import BPE_ROUNDS, BPE_SEP, bpe_train_merges

    sf = "/root/testdata/sf0.001"
    texts = [
        r[0]
        for r in duckdb.sql(f"SELECT text FROM '{sf}/documents.parquet'").fetchall()
    ]
    expected = _py_bpe(texts, BPE_ROUNDS, BPE_SEP)
    got = [
        (r.round, r.sym_a, r.sym_b, r.merged, r.n)
        for r in bpe_train_merges(spark, sf).orderBy("round").collect()
    ]
    assert got == expected


def test_bpe_merge_application_is_leftmost_nonoverlapping(spark):
    from pyspark.sql import functions as F

    from kinesis_demo_spark.queries.corpus import _apply_merge

    df = spark.createDataFrame(
        [(0, ["a", "a", "a"]), (1, ["a", "b", "a", "a", "b"]), (2, ["x"])],
        "doc_id bigint, toks array<string>",
    )
    out = {
        r.doc_id: r.m
        for r in df.select(
            "doc_id", _apply_merge(F.col("toks"), F.lit("a"), F.lit("a")).alias("m")
        ).collect()
    }
    assert out[0] == ["a+a", "a"]          # no overlap reuse
    assert out[1] == ["a", "b", "a+a", "b"]
    assert out[2] == ["x"]


def test_bpe_trainer_survives_docs_collapsing_to_one_token(spark, tmp_path):
    """ADVICE r5: a 2-token doc whose pair is the round's best merge collapses
    to 1 token; the next round's pair scan must skip it (sequence(1, size-1)
    on size=1 yields descending [1,0] -> element_at index-0 job failure)."""
    import duckdb

    from kinesis_demo_spark.queries.corpus import BPE_ROUNDS, BPE_SEP, bpe_train_merges

    sf = str(tmp_path)
    # "a b" dominates round 1, collapsing the 2-token docs to ["a__b"]; the
    # remaining rounds must still run over the survivors.
    texts = ["a b"] * 10 + ["c d e c d"] * 3 + ["x"]
    duckdb.sql(
        "COPY (SELECT CAST(i AS BIGINT) AS doc_id, t AS text, 'web' AS source, "
        "'en' AS lang FROM (SELECT unnest(range(14)) AS i, "
        f"unnest({texts!r}) AS t)) TO '{sf}/documents.parquet' (FORMAT PARQUET)"
    )
    got = [
        (r.round, r.sym_a, r.sym_b, r.n)
        for r in bpe_train_merges(spark, sf).orderBy("round").collect()
    ]
    expected = _py_bpe(texts, BPE_ROUNDS, BPE_SEP)
    assert got == [(r, a, b, n) for (r, a, b, _m, n) in expected]
    assert got[0] == (1, "a", "b", 10)


def test_bpe_encode_matches_python_reference_encoding(spark):
    """Corpus-wide encode == applying the Python-reference merge table in
    priority order to every doc (leftmost non-overlapping per merge)."""
    import duckdb

    from kinesis_demo_spark.queries.corpus import (
        BPE_ROUNDS,
        BPE_SEP,
        bpe_encode_corpus,
    )

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
    ).fetchall()
    merges = _py_bpe([t for _, t in rows], BPE_ROUNDS, BPE_SEP)

    def encode(text):
        toks = text.split(" ")
        for _rnd, a, b, m, _n in merges:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(m)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return toks

    expected = {doc_id: encode(text) for doc_id, text in rows}
    got = {
        r.doc_id: (r.n_tokens, r.toks_str)
        for r in bpe_encode_corpus(spark, sf).collect()
    }
    assert set(got) == set(expected)  # every doc encoded, incl. single-token
    for doc_id, toks in expected.items():
        assert got[doc_id] == (len(toks), " ".join(toks)), doc_id
