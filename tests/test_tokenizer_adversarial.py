"""Adversarial tokenizer differentials (VERDICT r7 #7): hostile corpora
engineered so the induced vocabularies are PREFIX-CLOSED chains and
OVERLAPPING-piece families — the classic greedy-longest-match and Viterbi
failure classes — with the Spark implementations matched piece-for-piece
against the independent pure-Python references from test_tokenizer.py on
every corpus. The fixture-corpus differentials prove the happy path; these
prove the edges:

- prefix-closed chains ("a", "aa", "aaa", ...): every prefix of a piece is
  also a piece, so a longest-match bug (off-by-one in the candidate length
  sweep, wrong tie order) silently picks a shorter piece and still
  reconstructs losslessly — only the piece-for-piece differential catches it;
- overlapping families ("ab", "ba", "aba", "bab"): pieces share characters
  across alignments, so greedy vs optimal segmentations genuinely diverge
  and the tie-break spec (longest piece / highest score, then fewest pieces,
  then lexicographic) is load-bearing;
- WP_MAX_PIECE boundary runs: words of exactly the max piece length and one
  more, where the candidate sweep's upper bound is exercised;
- repeated-bigram words at even/odd lengths, where the greedy cut points
  shift by alignment.
"""

from __future__ import annotations

from collections import Counter

import pytest

from kinesis_demo_spark.queries.tokenizer import (
    WP_MAX_PIECE,
    WP_TOP_GRAMS,
    unigram_encode_corpus,
    unigram_tokenizer_train,
    wordpiece_encode_words,
)

from .test_tokenizer import _reference_train, _reference_viterbi

# Each corpus is a list of document texts. Counts are skewed (repetition)
# so the hostile grams dominate the top-gram vocabulary selection.
ADVERSARIAL_CORPORA = {
    "prefix_chain": [
        " ".join(["a" * k for k in range(1, WP_MAX_PIECE + 3)] * 3),
        " ".join(["a" * WP_MAX_PIECE] * 10),
        "a aa aaa aaaa",
    ],
    "overlapping_ab": [
        " ".join(["ab" * k for k in range(1, 8)] * 2),
        " ".join(["ba" * k for k in range(1, 8)]),
        "aba bab abab baba ababa babab",
        " ".join(["ab" * 7, "ba" * 7] * 5),
    ],
    "max_piece_boundary": [
        " ".join(["b" * WP_MAX_PIECE, "b" * (WP_MAX_PIECE + 1), "b" * (2 * WP_MAX_PIECE)] * 4),
        "b bb " + "b" * (WP_MAX_PIECE - 1),
    ],
    "shared_suffix_prefix": [
        # "abc" family where "ab", "bc", "abc" all rank: the greedy cut after
        # "ab" leaves "c"; after "abc" leaves nothing — differential-sensitive
        " ".join(["abc" * k for k in range(1, 6)] * 3),
        "ab bc abc abcabc bcabc",
        " ".join(["ab", "bc"] * 10),
    ],
    # Multibyte/unicode: substring() and length() must count CODEPOINTS
    # identically in the Spark plan, the DuckDB oracle, and the Python
    # references — a byte-indexed implementation would split é/中/🎉 mid-
    # sequence or mis-size pieces. Mixed-width words (1-4 bytes/char),
    # combining accents, and repeated CJK runs.
    "unicode_multibyte": [
        " ".join(["héllo wörld naïve café", "中文分词 中文 分词"] * 4),
        "🎉🎉🎉 🎉a🎉 é és ész",
        " ".join(["中" * k for k in range(1, 7)] * 2),
        "éclair école",  # combining accent (decomposed NFD)
    ],
}


@pytest.fixture(scope="module")
def corpora_dirs(spark, tmp_path_factory):
    dirs = {}
    for name, texts in ADVERSARIAL_CORPORA.items():
        d = tmp_path_factory.mktemp(f"adv_{name}")
        rows = [
            (i, t, "xx", "adversarial", len(t)) for i, t in enumerate(texts)
        ]
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).write.parquet(str(d / "documents.parquet"))
        dirs[name] = str(d)
    return dirs


def _python_wordpiece(texts):
    """The same chars+top-grams vocab derivation and greedy-longest-match
    encode as test_tokenizer.test_wordpiece_matches_python_greedy, factored
    for reuse over arbitrary corpora."""
    wcount = Counter(w for t in texts for w in t.split(" ") if w != "")
    vocab = {c for w in wcount for c in w}
    gweight = Counter()
    for w, c in wcount.items():
        for l in range(2, WP_MAX_PIECE + 1):
            for i in range(len(w) - l + 1):
                gweight[w[i : i + l]] += c
    top = sorted(gweight.items(), key=lambda kv: (-kv[1], kv[0]))[:WP_TOP_GRAMS]
    vocab |= {p for p, _ in top}

    def encode(w):
        out, pos = [], 0
        while pos < len(w):
            for l in range(min(WP_MAX_PIECE, len(w) - pos), 0, -1):
                if w[pos : pos + l] in vocab:
                    out.append(w[pos : pos + l])
                    pos += l
                    break
        return out

    return wcount, {w: encode(w) for w in wcount}


@pytest.mark.parametrize("name", sorted(ADVERSARIAL_CORPORA))
def test_wordpiece_hostile_vocab_matches_python(spark, corpora_dirs, name):
    texts = ADVERSARIAL_CORPORA[name]
    wcount, want = _python_wordpiece(texts)
    got = {r.word: r for r in wordpiece_encode_words(spark, corpora_dirs[name]).collect()}
    assert set(got) == set(wcount), name
    for w, pieces in want.items():
        r = got[w]
        assert r.wcount == wcount[w], (name, w)
        assert r.encoded == " ".join(pieces), (name, w, r.encoded, pieces)
        assert r.n_pieces == len(pieces), (name, w)
        assert "".join(pieces) == w  # lossless on every hostile corpus


@pytest.mark.parametrize("name", sorted(ADVERSARIAL_CORPORA))
def test_unigram_hostile_vocab_matches_reference(spark, corpora_dirs, name):
    texts = ADVERSARIAL_CORPORA[name]
    want_vocab = _reference_train(texts)
    got_vocab = sorted(
        ((r.piece, r.usage) for r in unigram_tokenizer_train(spark, corpora_dirs[name]).collect()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert got_vocab == [(p, n) for p, n in want_vocab], name

    usage = dict(want_vocab)
    total = sum(usage.values())
    enc = {
        r.doc_id: r for r in unigram_encode_corpus(spark, corpora_dirs[name]).collect()
    }
    assert set(enc) == set(range(len(texts))), name
    for doc_id, text in enumerate(texts):
        words = [w for w in text.split(" ") if w]
        want_pieces = [
            p for w in words for p in _reference_viterbi(w, usage, total)
        ]
        r = enc[doc_id]
        assert r.n_words == len(words), (name, doc_id)
        assert r.pieces_str == " ".join(want_pieces), (name, doc_id)
        assert r.n_pieces == len(want_pieces), (name, doc_id)
        assert "".join(want_pieces) == "".join(words)  # lossless per doc
