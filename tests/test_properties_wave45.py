"""Pure-Python property tests (hypothesis, no Spark session) for the wave-4/5
algorithms whose fixture differentials exercise only one data distribution:

- the two-pass histogram-narrowing k-selection (exact_quantiles_selection):
  the float bucketing must NEVER misplace a rank — for any multiset of
  doubles, walking bucket counts to the target bucket and resolving the
  residual rank inside it must reproduce the true order statistic. This is
  the algorithm's core claim, proven here over adversarial inputs
  (duplicates, near-boundary values, all-equal, single-element).
- the WordPiece greedy longest-match: for any word and any vocabulary that
  contains every single character, the encode terminates, reconstructs the
  word losslessly, and every emitted piece is exactly the LONGEST vocab
  prefix of the remainder at its position.

Both mirror the registered queries' arithmetic step for step (same floor/
clamp bucket expression, same ceil-rank integer cross-multiplication), so a
property failure here is a real algorithm bug, not model drift.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_demo_spark.queries.selection import SELECTION_BUCKETS, SELECTION_QS
from kinesis_demo_spark.queries.tokenizer import WP_MAX_PIECE

_settings = settings(max_examples=300, deadline=None)


# --- histogram-narrowing k-selection ------------------------------------------------


def _select_by_narrowing(values: list[float], q: int) -> tuple[int, float]:
    """Pure-Python mirror of exact_quantiles_selection's two passes: same
    bucket expression (floor((v-mn)/width), clamped to B-1; single bucket
    when mn == mx), same ceil rank (n*q+99)//100, same residual-rank
    resolution over the distinct-value histogram inside the bucket."""
    n = len(values)
    k = (n * q + 99) // 100
    mn, mx = min(values), max(values)
    b = SELECTION_BUCKETS

    width = (mx - mn) / b if mx > mn else 0.0

    def bucket(v: float) -> int:
        # mirrors the query's degenerate-width guard: a subnormal range
        # underflows the width to 0.0 -> single bucket, pruning disabled
        if width <= 0.0:
            return 0
        return min(int(math.floor((v - mn) / width)), b - 1)

    counts: dict[int, int] = {}
    for v in values:
        counts[bucket(v)] = counts.get(bucket(v), 0) + 1
    cum = 0
    target_bucket, residual = None, None
    for bi in range(b):
        c = counts.get(bi, 0)
        if cum + c >= k:
            target_bucket, residual = bi, k - cum
            break
        cum += c
    assert target_bucket is not None
    hist: dict[float, int] = {}
    for v in values:
        if bucket(v) == target_bucket:
            hist[v] = hist.get(v, 0) + 1
    c2 = 0
    for v in sorted(hist):
        c2 += hist[v]
        if c2 >= residual:
            return k, v
    raise AssertionError("residual rank not found inside target bucket")


# adversarial floats: duplicates, tight clusters, huge spreads, negatives
_float_lists = st.lists(
    st.one_of(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        st.sampled_from([0.0, -0.0, 1.0, 1.0 + 2**-50, 99.99, 100.0, -100.0]),
    ),
    min_size=1,
    max_size=200,
)


@given(_float_lists)
@_settings
def test_narrowing_selection_equals_order_statistic(values):
    srt = sorted(values)
    n = len(values)
    for q in SELECTION_QS:
        k, got = _select_by_narrowing(values, q)
        assert k == (n * q + 99) // 100  # ceil(n*q/100) by cross-multiplication
        assert got == srt[k - 1]


@given(st.integers(min_value=1, max_value=10_000))
@_settings
def test_ceil_rank_formula(n):
    for q in SELECTION_QS:
        k = (n * q + 99) // 100
        assert k == math.ceil(n * q / 100)
        assert 1 <= k <= n


# --- WordPiece greedy longest-match ---------------------------------------------------


_alphabet = "abc"
_words = st.text(alphabet=_alphabet, min_size=1, max_size=24)
_extra_pieces = st.lists(
    st.text(alphabet=_alphabet, min_size=2, max_size=WP_MAX_PIECE),
    max_size=12,
)


def _greedy(word: str, vocab: set[str]) -> list[str]:
    out, pos = [], 0
    while pos < len(word):
        for l in range(min(WP_MAX_PIECE, len(word) - pos), 0, -1):
            if word[pos : pos + l] in vocab:
                out.append(word[pos : pos + l])
                pos += l
                break
        else:
            raise AssertionError("single-char coverage violated")
    return out


@given(_words, _extra_pieces)
@_settings
def test_wordpiece_greedy_invariants(word, extra):
    vocab = set(_alphabet) | {p for p in extra if p}
    pieces = _greedy(word, vocab)
    # lossless reconstruction and bounded piece count
    assert "".join(pieces) == word
    assert 1 <= len(pieces) <= len(word)
    # every piece is the LONGEST vocab prefix of the remainder at its position
    pos = 0
    for p in pieces:
        assert p in vocab
        for l in range(len(p) + 1, min(WP_MAX_PIECE, len(word) - pos) + 1):
            assert word[pos : pos + l] not in vocab
        pos += len(p)
