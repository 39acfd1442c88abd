"""Text-analysis semantics on real-language inputs (the synthetic fixture's
31-word tech vocab exercises parity, not classification quality)."""

from __future__ import annotations

import pytest

from kinesis_demo_spark.queries import similarity as S
from kinesis_demo_spark.queries import text as X

SENTENCES = [
    (0, "the cat and the dog sat in the garden and it was warm", "en"),
    (1, "der hund und die katze sind nicht mit der maus zu hause", "de"),
    (2, "le chat et la souris sont dans le jardin pour la nuit", "fr"),
    (3, "el perro y la casa no son los mismos que una mesa para dos", "es"),
    (4, "我 的 朋友 是 不 在 这 里 了 他 有 我 的 书", "zh"),
]


@pytest.fixture(scope="module")
def real_docs_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("textq")
    rows = [(i, t, lang, "src", len(t)) for i, t, lang in SENTENCES]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(out / "documents.parquet"))
    return str(out)


def test_lang_id_classifies_real_sentences(spark, real_docs_dir):
    rows = X.text_lang_id(spark, real_docs_dir).collect()
    assert {r.doc_id: r.predicted_lang for r in rows} == {
        i: lang for i, _, lang in SENTENCES
    }


def test_quality_score_penalizes_repetition(spark, tmp_path):
    rows = [
        (0, "spam " * 49 + "spam", "en", "s", 249),          # 50x one token
        (1, " ".join(f"word{i}" for i in range(50)), "en", "s", 349),  # all distinct
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in X.text_quality_score(spark, str(tmp_path)).collect()}
    assert out[0].max_rep_ratio == 1.0 and out[0].quality_score == 0.0
    assert out[1].type_token_ratio == 1.0
    assert out[1].quality_score > out[0].quality_score


def test_token_count_bpe_splits_mixed_text(spark, tmp_path):
    rows = [(0, "abc123 def!", "en", "s", 11)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    r = X.text_token_count(spark, str(tmp_path)).collect()[0]
    assert r.n_ws_tokens == 2
    assert r.n_bpe_tokens == 4  # abc | 123 | def | !


def test_fingerprint_invariant_to_whitespace_runs(spark, tmp_path):
    rows = [(0, "hello  world", "en", "s", 12), (1, "hello world", "en", "s", 11)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r.content_fp for r in X.text_fingerprint(spark, str(tmp_path)).collect()}
    assert out[0] == out[1]


def test_ann_topk_is_exact_vs_numpy(spark):
    """Brute-force ANN must agree with an independent numpy computation."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64)
           for r in spark.read.parquet(f"{sf}/embeddings.parquet").collect()}
    got = S.ann_cosine_topk(spark, sf).collect()
    by_query: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rnk)):
        by_query.setdefault(r.query_id, []).append(r.neighbor_id)
    for q, neighbors in by_query.items():
        qv = emb[q]
        scores = {
            c: float(qv @ cv / (np.linalg.norm(qv) * np.linalg.norm(cv)))
            for c, cv in emb.items()
            if c != q
        }
        expected = [c for c, _ in sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]]
        assert neighbors == expected


def test_pii_patterns_redact_real_examples(spark):
    from kinesis_demo_spark.queries.text import EMAIL_RE, IP_RE, PHONE_RE
    from pyspark.sql import functions as F

    samples = [
        ("reach me at jane.doe+spam@corp.example.co.uk today", "<EMAIL>"),
        ("server 192.168.100.42 answered", "<IP>"),
        ("call 555-0123 now", "<PHONE>"),
    ]
    df = spark.createDataFrame([(s,) for s, _ in samples], "raw string")
    red = df.select(
        F.regexp_replace(
            F.regexp_replace(F.regexp_replace("raw", EMAIL_RE, "<EMAIL>"), IP_RE, "<IP>"),
            PHONE_RE,
            "<PHONE>",
        ).alias("out")
    ).collect()
    for (raw, marker), r in zip(samples, red):
        assert marker in r["out"], (raw, r["out"])
        for leak in ("jane", "192.168", "555-0123"):
            if leak in raw:
                assert leak not in r["out"]


# --- chunking ---------------------------------------------------------------


@pytest.fixture(scope="module")
def chunk_docs_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("chunkq")
    texts = [
        (0, "x" * 199),            # shorter than one chunk -> 1 chunk
        (1, "a" * 200),            # exactly one chunk, but 200 > stride 150 -> 2 chunks
        (2, "".join(chr(97 + i % 26) for i in range(731))),  # several chunks + ragged tail
        (3, "tiny"),
    ]
    rows = [(i, t, "en", "src", len(t)) for i, t in texts]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(out / "documents.parquet"))
    return str(out)


def test_chunking_covers_every_char_with_exact_overlap(spark, chunk_docs_dir):
    from kinesis_demo_spark.queries.text import CHUNK_CHARS, CHUNK_STRIDE

    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(chunk_docs_dir + "/documents.parquet").collect()
    }
    rows = X.text_chunk_documents(spark, chunk_docs_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in texts.items():
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        # chunk count = number of stride starts inside the text
        assert len(chunks) == (len(text) - 1) // CHUNK_STRIDE + 1
        for k, r in enumerate(chunks):
            assert r.chunk_idx == k
            assert r.chunk_text == text[k * CHUNK_STRIDE : k * CHUNK_STRIDE + CHUNK_CHARS]
            assert r.chunk_chars == len(r.chunk_text)
        # consecutive full chunks overlap by exactly CHUNK_CHARS - CHUNK_STRIDE
        for a, b in zip(chunks, chunks[1:]):
            if a.chunk_chars == CHUNK_CHARS:
                assert a.chunk_text[CHUNK_STRIDE:] == b.chunk_text[: CHUNK_CHARS - CHUNK_STRIDE]
        # concatenating each chunk's non-overlapping head reconstructs the doc
        rebuilt = "".join(c.chunk_text[:CHUNK_STRIDE] for c in chunks[:-1]) + chunks[-1].chunk_text
        assert rebuilt == text


# --- repetition scoring -----------------------------------------------------


def test_repetition_score_flags_repeated_text(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("repq")
    docs = [
        (0, "spam ham eggs " * 50),        # one phrase looped -> dup_frac near 1
        (1, " ".join(f"w{i}" for i in range(100))),  # all-unique trigrams -> 0
        (2, "one two"),                     # < 3 tokens -> no grams, frac 0
    ]
    rows = [(i, t.strip(), "en", "src", len(t)) for i, t in docs]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(out / "documents.parquet"))
    got = {r.doc_id: r for r in X.text_repetition_score(spark, str(out)).collect()}
    # doc 0: 150 tokens -> 148 trigrams, only 3 distinct rotations of the loop
    assert got[0].n_grams == 148 and got[0].n_distinct == 3
    assert got[0].dup_frac == (148 - 3) / 148
    assert got[1].n_distinct == got[1].n_grams and got[1].dup_frac == 0.0
    assert got[2].n_grams == 0 and got[2].dup_frac == 0.0


# --- winnowing --------------------------------------------------------------


def test_winnowing_guarantee_shared_passage_shares_fingerprint(spark, tmp_path_factory):
    """The winnowing contract: any common token run of length >= w + k - 1
    is detected via at least one shared fingerprint, however the
    surrounding text differs."""
    from kinesis_demo_spark.queries.text import WINNOW_K, WINNOW_W, _winnow_fps

    out = tmp_path_factory.mktemp("winnow")
    passage = " ".join(f"shared{i}" for i in range(WINNOW_W + WINNOW_K - 1))
    docs = [
        (0, "alpha beta gamma " + passage + " delta epsilon"),
        (1, "uno dos tres cuatro " + passage),
        (2, " ".join(f"other{i}" for i in range(30))),  # no overlap
    ]
    rows = [(i, t, "en", "src", len(t)) for i, t in docs]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(out / "documents.parquet"))
    fps = _winnow_fps(
        spark.read.parquet(str(out / "documents.parquet"))
    ).collect()
    by_doc = {d: {r.fp for r in fps if r.doc_id == d} for d in (0, 1, 2)}
    assert by_doc[0] & by_doc[1], "shared passage must share a fingerprint"
    assert not (by_doc[0] & by_doc[2]) and not (by_doc[1] & by_doc[2])


def test_winnowing_density_bound(spark, tmp_path_factory):
    """Winnowing never selects more than one fingerprint per window step:
    |fps| <= n_grams, and for long docs roughly 2n/(w+1) — assert the hard
    upper bound and the non-triviality lower bound n_grams/w."""
    import math

    from kinesis_demo_spark.queries.text import WINNOW_K, WINNOW_W, _winnow_fps

    out = tmp_path_factory.mktemp("winnowd")
    n_tok = 100
    text = " ".join(f"t{i % 37}x{i % 11}" for i in range(n_tok))
    spark.createDataFrame(
        [(0, text, "en", "src", len(text))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(out / "documents.parquet"))
    fps = _winnow_fps(spark.read.parquet(str(out / "documents.parquet"))).collect()
    n_grams = n_tok - (WINNOW_K - 1)
    # one fingerprint per window position at most; at least one per w-run
    assert len(fps) <= n_grams
    assert len(fps) >= math.ceil(n_grams / WINNOW_W)
