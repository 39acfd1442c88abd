"""Property-based tests (hypothesis): the tricky stateful semantics checked
against independent pure-Python reference implementations on randomized small
inputs — the oracle gate covers the fixtures; these cover the input space
around the edges (leading sentinels, ties, single-row groups, empty gaps).

Example counts are kept small (Spark jobs per example); deadline disabled for
JVM warmup jitter.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kinesis_demo_spark.operators.sessionize import SESSION_GAP_MS, batch_sessionize
from kinesis_demo_spark.plans.heatmap import locf_positions

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


# --- LOCF vs pure-Python reference ------------------------------------------------

movement = st.tuples(
    st.integers(min_value=1, max_value=3),     # user_id
    st.integers(min_value=0, max_value=50),    # time step
    st.booleans(),                              # sentinel?
    st.integers(min_value=1, max_value=9),     # x (non-sentinel)
    st.integers(min_value=1, max_value=9),     # y
)


def _locf_reference(rows):
    """Straight port of the engine's spec: per user in (time, event_id)
    order, carry the last non-sentinel position; drop rows before the first
    real movement. Returns a MULTISET (Counter) — duplicate (user, time)
    rows must match in count, not just presence."""
    from collections import Counter

    out: Counter = Counter()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r[0], []).append(r)
    for user, rs in by_user.items():
        last = None
        for (u, t, eid, x, y) in sorted(rs, key=lambda r: (r[1], r[2])):
            if (x, y) != (0, 0):
                last = (x, y)
            if last is not None:
                out[(u, t, *last)] += 1
    return out


@given(st.lists(movement, min_size=0, max_size=25))
@_settings
def test_locf_matches_reference_implementation(spark, movements):
    rows = [
        (u, t * 1000, i, 0 if s else x, 0 if s else y)
        for i, (u, t, s, x, y) in enumerate(movements)
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, time_ms bigint, event_id bigint, x bigint, y bigint"
    ) if rows else None
    if df is None:
        return
    from collections import Counter

    got = Counter(
        (r.user_id, r.time_ms // 1000, r.x, r.y) for r in locf_positions(df).collect()
    )
    want = _locf_reference([(u, t // 1000, i, x, y) for (u, t, i, x, y) in rows])
    assert got == want


# --- sessionize vs pure-Python reference ------------------------------------------


event = st.tuples(
    st.integers(min_value=0, max_value=2),                 # user
    st.integers(min_value=0, max_value=100),               # hours offset
    st.integers(min_value=0, max_value=9999),              # cents
)


def _sessions_reference(rows, gap_ms=SESSION_GAP_MS):
    from collections import Counter

    out: Counter = Counter()
    by_user: dict[int, list] = {}
    for i, (u, h, c) in enumerate(rows):
        by_user.setdefault(u, []).append((h * 3_600_000, i, c))
    for u, evs in by_user.items():
        evs.sort()
        start = end = None
        n = cents = 0
        for t, _i, c in evs:
            if start is None:
                start, end, n, cents = t, t, 1, c
            elif t - end > gap_ms:
                out[(u, start, end, n, cents)] += 1
                start, end, n, cents = t, t, 1, c
            else:
                end, n, cents = t, n + 1, cents + c
        if start is not None:
            out[(u, start, end, n, cents)] += 1
    return out


@given(st.lists(event, min_size=1, max_size=30))
@_settings
def test_batch_sessionize_matches_reference_implementation(spark, events):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(hours=h), u, c / 100.0)
        for i, (u, h, c) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint, value double")
    from collections import Counter

    got = Counter(
        (
            r.user_id,
            int((r.session_start - base).total_seconds() * 1000),
            int((r.session_end - base).total_seconds() * 1000),
            r.n_events,
            round(r.sum_value * 100),
        )
        for r in batch_sessionize(df).collect()
    )
    want = _sessions_reference(events)
    assert got == want


# --- chunking vs pure-Python reference --------------------------------------------

# printable unicode incl. multi-byte glyphs: character (not byte) semantics
# must agree between Spark substring and the Python slice reference
_doc_text = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Z"), exclude_characters="\x00"
    ),
    min_size=0,
    max_size=700,
)


@given(st.lists(_doc_text, min_size=1, max_size=5))
@_settings
def test_chunking_matches_python_slices(spark, texts):
    from kinesis_demo_spark.queries.text import CHUNK_CHARS, CHUNK_STRIDE, text_chunk_documents
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        rows = [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)]
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).write.mode("overwrite").parquet(d + "/documents.parquet")
        got = {
            (r.doc_id, r.chunk_idx, r.chunk_text)
            for r in text_chunk_documents(spark, d).collect()
        }
    want = {
        (i, k, t[k * CHUNK_STRIDE : k * CHUNK_STRIDE + CHUNK_CHARS])
        for i, t in enumerate(texts)
        if len(t) > 0
        for k in range((len(t) - 1) // CHUNK_STRIDE + 1)
    }
    assert got == want


@given(st.lists(st.lists(st.sampled_from("ab cd ef gh".split()), max_size=30), min_size=1, max_size=4))
@_settings
def test_repetition_matches_python_reference(spark, docs):
    from kinesis_demo_spark.queries.text import REP_NGRAM, text_repetition_score
    import tempfile

    texts = [" ".join(toks) for toks in docs]
    with tempfile.TemporaryDirectory() as d:
        rows = [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)]
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).write.mode("overwrite").parquet(d + "/documents.parquet")
        got = {
            (r.doc_id, r.n_grams, r.n_distinct, r.dup_frac)
            for r in text_repetition_score(spark, d).collect()
        }
    want = set()
    for i, t in enumerate(texts):
        toks = t.split(" ")  # split semantics: '' yields [''], like both engines
        grams = [
            " ".join(toks[j : j + REP_NGRAM]) for j in range(len(toks) - REP_NGRAM + 1)
        ] if len(toks) >= REP_NGRAM else []
        n, nd = len(grams), len(set(grams))
        want.add((i, n, nd, (n - nd) / n if n else 0.0))
    assert got == want


_word = st.sampled_from("alpha beta gamma delta epsilon zeta eta theta".split())


@given(st.lists(st.lists(_word, min_size=0, max_size=20), min_size=2, max_size=5))
@_settings
def test_containment_dominates_jaccard_on_random_corpora(spark, word_lists):
    """For EVERY co-shingled pair, each directed containment >= Jaccard
    (|A∩B|/|A| >= |A∩B|/|A∪B| since A ⊆ A∪B) and containment <= 1 — the
    algebraic relation that makes containment the quote detector. Verified
    on random corpora against the independently computed Python sets."""
    import tempfile

    from kinesis_demo_spark.queries.dedup import (
        dedup_ngram_jaccard,
        dedup_shingle_containment,
    )

    texts = [" ".join(ws) for ws in word_lists]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            list(enumerate(texts)), "doc_id bigint, text string"
        ).write.mode("overwrite").parquet(d + "/documents.parquet")
        cont = {
            (r.contained_id, r.container_id): r.containment
            for r in dedup_shingle_containment(spark, d).collect()
        }
        jacc = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in dedup_ngram_jaccard(spark, d).collect()
        }

    def shingles(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)} if len(w) >= 3 else set()

    sets = {i: shingles(t) for i, t in enumerate(texts)}
    for (a, b), c in cont.items():
        sa, sb = sets[a], sets[b]
        inter = len(sa & sb)
        assert 0 < c <= 1.0
        assert c == inter / len(sa)  # exact directed containment
        # dominates symmetric Jaccard whenever that pair was emitted
        j = jacc.get((min(a, b), max(a, b)))
        if j is not None:
            assert c >= j


# --- winnowing vs pure-Python reference -------------------------------------------


def _winnow_reference(tokens, k, w):
    """Direct implementation of the spec: hash every k-gram (the engine's
    packed (h60 % 2^39) << 20 | pos key), take the min over every window of
    up to w consecutive positions (leading partial windows included), dedupe."""
    import hashlib

    n = len(tokens) - (k - 1)
    if n <= 0:
        return set()
    combined = []
    for pos in range(1, n + 1):
        gram = " ".join(tokens[pos - 1 : pos - 1 + k])
        h60 = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
        combined.append((h60 % (1 << 39)) * (1 << 20) + pos)
    sel = set()
    for t in range(len(combined)):
        sel.add(min(combined[max(0, t - w + 1) : t + 1]))
    return {(c % (1 << 20), c >> 20) for c in sel}


token = st.sampled_from(["alpha", "beta", "gamma", "delta", "x", "y"])


@given(st.lists(token, min_size=0, max_size=24))
@_settings
def test_winnowing_matches_reference(spark, tokens):
    from kinesis_demo_spark.queries.text import WINNOW_K, WINNOW_W, _winnow_fps

    df = spark.createDataFrame(
        [(0, " ".join(tokens))], "doc_id bigint, text string"
    )
    got = {(r.pos, r.fp) for r in _winnow_fps(df).collect()}
    assert got == _winnow_reference(tokens, WINNOW_K, WINNOW_W)


# --- unigram Viterbi: optimality by brute force -----------------------------------

_vit_word = st.text(alphabet="ab", min_size=1, max_size=8)
_vit_usages = st.dictionaries(
    st.text(alphabet="ab", min_size=2, max_size=4),
    st.integers(min_value=0, max_value=9),
    max_size=6,
)


@settings(max_examples=300, deadline=None)
@given(word=_vit_word, extra=_vit_usages, ua=st.integers(1, 9), ub=st.integers(1, 9))
def test_viterbi_is_optimal_by_brute_force(word, extra, ua, ub):
    """viterbi_segment must return THE (score desc, fewer pieces, lex
    smallest) optimum over every possible segmentation — checked by full
    enumeration on small random vocabularies. Pure Python, no Spark."""
    from fractions import Fraction

    from kinesis_demo_spark.queries.tokenizer import UNI_MAX_PIECE, viterbi_segment

    usage = {"a": ua, "b": ub, **extra}
    total = sum(usage.values()) or 1

    def all_segs(w):
        if not w:
            yield ()
            return
        for i in range(1, min(len(w), UNI_MAX_PIECE) + 1):
            head = w[:i]
            if head in usage:
                for rest in all_segs(w[i:]):
                    yield (head,) + rest

    def score(seg):
        s = Fraction(1)
        for p in seg:
            s *= Fraction(usage[p], total)
        return s

    best = min(all_segs(word), key=lambda seg: (-score(seg), len(seg), seg))
    got = viterbi_segment(word, usage, total)
    assert "".join(got) == word
    assert (score(got), len(got), got) == (score(best), len(best), best)


# --- binary-ANN sign packing vs a bit-twiddling reference -------------------------

_vec = st.lists(
    st.floats(min_value=-2.0, max_value=2.0, allow_nan=False, width=32),
    min_size=64,
    max_size=64,
)


@_settings
@given(vecs=st.lists(_vec, min_size=1, max_size=8))
def test_sign_words_match_python_reference(spark, vecs):
    from pyspark.sql import functions as F

    from kinesis_demo_spark.queries.similarity import _sign_word

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id bigint, embedding array<float>"
    )
    got = {
        r.vec_id: (r.w0, r.w1)
        for r in df.select(
            "vec_id",
            _sign_word(F.col("embedding"), 0).alias("w0"),
            _sign_word(F.col("embedding"), 1).alias("w1"),
        ).collect()
    }
    import numpy as np

    for i, v in enumerate(vecs):
        # reference packs the FLOAT32-cast values, matching the column type
        v32 = np.array(v, dtype=np.float32)
        w0 = sum((1 << d) for d in range(32) if v32[d] >= 0)
        w1 = sum((1 << d) for d in range(32) if v32[32 + d] >= 0)
        assert got[i] == (w0, w1), (i, got[i], (w0, w1))


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # (doc_a, doc_b, diag) bucket id
            st.integers(min_value=1, max_value=500),  # pos_a
        ),
        min_size=0,
        max_size=60,
    )
)
@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_substring_fold_merge_matches_window_formulation(spark, hits):
    """The r9 gaps-and-islands FOLD (sort_array(collect_list) + aggregate
    lambda, one exchange) must produce run-identical output to the r8
    window-lag + running-sum + regroup formulation on arbitrary anchor
    position multisets — including duplicates, ties, and empty groups."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from kinesis_demo_spark.queries.dedup import SUB_GAP, SUB_W

    rows = [(g, 1000 + g, g, p) for g, p in hits]  # distinct (a, b, diag) per bucket
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_a long, doc_b long, diag long, pos_a long")

    fold = f"""
      aggregate(
        ps,
        cast(array() as array<struct<s: bigint, e: bigint, n: bigint>>),
        (acc, p) -> CASE
          WHEN size(acc) = 0 OR p - element_at(acc, -1).e > {SUB_GAP}
          THEN concat(acc, array(named_struct(
                 's', p, 'e', p, 'n', cast(1 as bigint))))
          ELSE concat(slice(acc, 1, size(acc) - 1), array(named_struct(
                 's', element_at(acc, -1).s, 'e', p,
                 'n', element_at(acc, -1).n + cast(1 as bigint))))
        END)
    """
    got = {
        (r.doc_a, r.doc_b, r.diag, r.s, r.e, r.n)
        for r in df.groupBy("doc_a", "doc_b", "diag")
        .agg(F.sort_array(F.collect_list("pos_a")).alias("ps"))
        .select("doc_a", "doc_b", "diag", F.explode(F.expr(fold)).alias("run"))
        .select("doc_a", "doc_b", "diag", "run.s", "run.e", "run.n")
        .collect()
    }
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    marked = df.withColumn(
        "brk",
        F.when(F.col("pos_a") - F.lag("pos_a").over(w) > SUB_GAP, F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("run_id", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    want = {
        (r.doc_a, r.doc_b, r.diag, r.s, r.e, r.n)
        for r in marked.groupBy("doc_a", "doc_b", "diag", "run_id")
        .agg(F.min("pos_a").alias("s"), F.max("pos_a").alias("e"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
