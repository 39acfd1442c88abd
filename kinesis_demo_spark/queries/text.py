"""Text-analysis operators over the ``documents`` fixture — the
training-data-pipeline surface (SURVEY.md §7 Phase 5): language ID, quality
scoring, token counting, and document fingerprinting.

All metrics are pure JVM-side expression work (split / regexp / array HOFs —
no Python UDFs), mirrored exactly in DuckDB SQL for the value-hash gate.
Language ID uses real stopword marker lists; on the synthetic fixture corpus
(31-word tech vocab) every doc scores 0 and falls back to 'und', which is the
honest answer — tests/test_text.py proves the classifier on real sentences in
all five languages.

Scale: every query is scan -> per-row expressions -> (optionally) one small
aggregation; no joins, no skew, embarrassingly parallel at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions.hashing import h60, h60_sql
from ..io import load_table, spread
from ..registry import register
from .dedup import SHINGLES_SQL as SHINGLES_SQL_REF

# Small, public stopword marker lists (most-frequent function words).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "von", "mit", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es": ("el", "la", "los", "y", "es", "no", "por", "que", "una", "para"),
    "zh": ("的", "是", "不", "了", "在", "有", "我", "他", "这", "中"),
}
LANG_ORDER = tuple(LANG_MARKERS)  # deterministic tie precedence

BPE_ISH_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"  # letter runs | digit runs | other glyphs
FP_PREFIX_CHARS = 120
FP_KGRAM = 8


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: every query here is per-row expression-bound; see io.spread
    return spread(load_table(spark, sf_dir, "documents"))


def _tokens() -> Column:
    return F.split(F.col("text"), " ")


# --- language ID ----------------------------------------------------------------


def _marker_hits(lang: str) -> Column:
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(_tokens(), lambda t: F.array_contains(markers, t))).cast("long")


def _marker_hits_sql(lang: str) -> str:
    arr = "[" + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]"
    return (
        f"CAST(len(list_filter(string_split(text, ' '), t -> list_contains({arr}, t))) AS BIGINT)"
    )


# Shared by text_lang_id and langid_confusion_matrix: per-doc marker hits +
# argmax prediction with fixed precedence, as a reusable oracle SELECT.
_LANGID_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang,
         {", ".join(f"{_marker_hits_sql(lg)} AS hits_{lg}" for lg in LANG_ORDER)}
  FROM documents
)
SELECT doc_id, labeled_lang, {", ".join(f"hits_{lg}" for lg in LANG_ORDER)},
       CASE
         {" ".join(f"WHEN hits_{lg} > 0 AND hits_{lg} >= greatest({', '.join('hits_' + o for o in LANG_ORDER)}) THEN '{lg}'" for lg in LANG_ORDER)}
         ELSE 'und'
       END AS predicted_lang
FROM scored
"""


@register("text_lang_id", oracle=_LANGID_ORACLE)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID: count function-word hits per language,
    argmax with fixed precedence ({" > ".join(LANG_ORDER)}), 'und' when no
    marker fires."""
    scored = _docs(spark, sf_dir).select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[_marker_hits(lg).alias(f"hits_{lg}") for lg in LANG_ORDER],
    )
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in LANG_ORDER])
    pred = F.lit("und")
    for lg in reversed(LANG_ORDER):  # build CASE so earlier langs win ties
        pred = F.when((F.col(f"hits_{lg}") > 0) & (F.col(f"hits_{lg}") >= best), F.lit(lg)).otherwise(pred)
    return scored.select(
        "doc_id", "labeled_lang", *[f"hits_{lg}" for lg in LANG_ORDER], pred.alias("predicted_lang")
    )


# --- quality scoring ---------------------------------------------------------------


@register(
    "text_quality_score",
    oracle="""
WITH t AS (
  SELECT doc_id, n_chars,
         string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
m AS (
  SELECT doc_id, n_chars, n_tokens,
         CAST(len(list_distinct(toks)) AS DOUBLE) / n_tokens AS type_token_ratio,
         CAST(list_max(list_transform(list_distinct(toks),
              w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE) / n_tokens AS max_rep_ratio,
         CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_token_len
  FROM t
)
SELECT doc_id, n_tokens, type_token_ratio, max_rep_ratio, avg_token_len,
       least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * type_token_ratio * (1.0 - max_rep_ratio) AS quality_score
FROM m
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length saturation x lexical diversity x
    (1 - repetition). All array HOFs; the worst-case per-row cost is
    O(|vocab| * n_tokens), bounded and embarrassingly parallel."""
    toks = _tokens()
    t = _docs(spark, sf_dir).select(
        "doc_id",
        "n_chars",
        toks.alias("toks"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    distinct_toks = F.array_distinct("toks")
    max_rep = F.array_max(
        F.transform(distinct_toks, lambda w: F.size(F.filter(F.col("toks"), lambda x: x == w)))
    )
    m = t.select(
        "doc_id",
        "n_tokens",
        (F.size(distinct_toks).cast("double") / F.col("n_tokens")).alias("type_token_ratio"),
        (max_rep.cast("double") / F.col("n_tokens")).alias("max_rep_ratio"),
        ((F.col("n_chars") - (F.col("n_tokens") - 1)).cast("double") / F.col("n_tokens")).alias(
            "avg_token_len"
        ),
    )
    score = (
        F.least(F.col("n_tokens").cast("double") / 64.0, F.lit(1.0))
        * F.col("type_token_ratio")
        * (F.lit(1.0) - F.col("max_rep_ratio"))
    )
    return m.select(
        "doc_id", "n_tokens", "type_token_ratio", "max_rep_ratio", "avg_token_len",
        score.alias("quality_score"),
    )


# --- token counting -----------------------------------------------------------------


@register(
    "text_token_count",
    oracle=f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_ISH_RE}')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_measured
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish sub-token count (letter runs / digit
    runs / individual other glyphs — the GPT-2-style pre-tokenizer shape,
    regex kept to char classes valid in both Java regex and RE2)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(_tokens()).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_RE), 0)).cast("long").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


# --- document fingerprinting -----------------------------------------------------------


@register(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
       {h60_sql("trim(regexp_replace(text, ' +', ' ', 'g'))")} AS content_fp,
       CASE WHEN length(text) >= {FP_KGRAM} THEN
         list_min(list_transform(range(1, least(length(text), {FP_PREFIX_CHARS}) - {FP_KGRAM - 2}),
                  i -> {h60_sql(f"substr(text, CAST(i AS INT), {FP_KGRAM})")}))
       ELSE NULL END AS min_kgram_fp
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: whole-content hash of whitespace-normalized
    text, plus a winnowing-style min-hash over rolling {FP_KGRAM}-char grams
    of the first {FP_PREFIX_CHARS} chars (prefix-bounded so per-row cost is
    constant at any document length)."""
    docs = _docs(spark, sf_dir)
    normalized = F.trim(F.regexp_replace("text", " +", " "))
    n_grams = F.least(F.length("text"), F.lit(FP_PREFIX_CHARS)) - (FP_KGRAM - 1)
    kgram_hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: h60(F.col("text").substr(i, F.lit(FP_KGRAM))),
    )
    min_fp = F.when(F.length("text") >= FP_KGRAM, F.array_min(kgram_hashes)).otherwise(
        F.lit(None).cast("long")
    )
    return docs.select(
        "doc_id",
        h60(normalized).alias("content_fp"),
        min_fp.alias("min_kgram_fp"),
    )


# --- TF-IDF term scoring -------------------------------------------------------------


TFIDF_TOP_K = 3


@register(
    "text_tfidf",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) * (CAST(n.n_docs + 1 AS DOUBLE) / CAST(df.df + 1 AS DOUBLE)) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, term, tf, df, score, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {TFIDF_TOP_K}
""",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_TOP_K} characteristic terms per document by tf-rarity
    score: tf * (N+1)/(df+1). The rarity ratio replaces log-idf because
    ln() is a libm transcendental whose last-ulp rounding differs across
    engines — the ratio is pure IEEE-exact arithmetic, same ranking, and
    keeps the differential gate bit-exact.

    Shape at scale: explode -> two hash aggregates (term-frequency per doc,
    document-frequency per term) -> equi-join on term -> per-doc top-k
    window. The df table is |vocab|-sized (small); the join shuffles on term
    with no skew beyond natural Zipf, which AQE skew-split handles; N rides
    in as a literal-free cross join of a 1-row aggregate (broadcast)."""
    docs = _docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = (
        tok.select("doc_id", "term").distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = (
        F.col("tf").cast("double")
        * ((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1).cast("double"))
    ).alias("score")
    scored = tf.join(df, "term").crossJoin(F.broadcast(n)).select(
        "doc_id", "term", "tf", "df", score
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


# --- PII redaction -------------------------------------------------------------------

# Conservative patterns valid in BOTH regex dialects (Java for Spark, RE2 for
# DuckDB): no lookarounds, no backrefs.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IP_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PHONE_RE = r"[0-9]{3}-[0-9]{4}"

# The fixture corpus contains no PII, so the query plants a deterministic
# fake contact line derived from doc_id — both engines build the identical
# string, so the redaction work is real and still value-hash checked.
_INJECT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'"
    " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
    " || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@register(
    "text_pii_redact",
    oracle=f"""
WITH injected AS (
  SELECT doc_id, {_INJECT_SQL} AS raw FROM documents
),
step1 AS (
  SELECT doc_id, raw,
         CAST(len(regexp_extract_all(raw, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
         regexp_replace(raw, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
  FROM injected
),
step2 AS (
  SELECT *, CAST(len(regexp_extract_all(t1, '{IP_RE}')) AS BIGINT) AS n_ips,
         regexp_replace(t1, '{IP_RE}', '<IP>', 'g') AS t2
  FROM step1
)
SELECT doc_id, n_emails, n_ips,
       CAST(len(regexp_extract_all(t2, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       regexp_replace(t2, '{PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM step2
""",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass a training corpus gets before any
    model sees it: emails, then IPv4 addresses, then phone-shaped numbers,
    each replaced with a typed placeholder and counted (sequential order
    matters — an email's host would otherwise count as an address). Pure
    JVM regexp expressions, zero shuffles, linear at any corpus size."""
    d = F.col("doc_id").cast("string")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"), d, F.lit("@mail.example.com"),
        F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
        F.lit(" call 555-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    out = _docs(spark, sf_dir).select("doc_id", raw.alias("raw"))
    out = out.select(
        "doc_id",
        F.size(F.regexp_extract_all("raw", F.lit(EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.regexp_replace("raw", EMAIL_RE, "<EMAIL>").alias("t1"),
    )
    out = out.select(
        "doc_id",
        "n_emails",
        F.size(F.regexp_extract_all("t1", F.lit(IP_RE), 0)).cast("long").alias("n_ips"),
        F.regexp_replace("t1", IP_RE, "<IP>").alias("t2"),
    )
    return out.select(
        "doc_id",
        "n_emails",
        "n_ips",
        F.size(F.regexp_extract_all("t2", F.lit(PHONE_RE), 0)).cast("long").alias("n_phones"),
        F.regexp_replace("t2", PHONE_RE, "<PHONE>").alias("redacted"),
    )


# --- context-window chunking ----------------------------------------------------

CHUNK_CHARS = 200  # context-window size in characters
CHUNK_STRIDE = 150  # CHUNK_CHARS - 50 overlap: adjacent chunks share 50 chars


@register(
    "text_chunk_documents",
    oracle=f"""
WITH g AS (
  SELECT doc_id, text,
         unnest(generate_series(0, (length(text) - 1) // {CHUNK_STRIDE})) AS i
  FROM documents WHERE length(text) > 0
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       substr(text, CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT), {CHUNK_CHARS}) AS chunk_text,
       CAST(length(substr(text, CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT), {CHUNK_CHARS})) AS BIGINT)
         AS chunk_chars
FROM g
""",
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window prep: every document split into overlapping
    fixed-size character chunks (200 chars, stride 150 -> 50-char overlap so
    no boundary phrase is lost to a cut). The chunk grid is arithmetic on
    length(text) — ``sequence``+``posexplode`` JVM expressions, no UDF —
    so a 100 TB corpus chunks scan-parallel with zero shuffles; output rows
    carry (doc_id, chunk_idx) so downstream tokenize/pack stages keep
    provenance. Both engines compute identical integer chunk starts and
    substring bounds, making the chunk text itself value-hash exact."""
    d = _docs(spark, sf_dir).filter(F.length("text") > 0)
    return (
        d.select(
            "doc_id",
            F.posexplode(
                F.expr(f"sequence(0, CAST((length(text) - 1) DIV {CHUNK_STRIDE} AS INT))")
            ).alias("p", "i"),
            F.col("text"),
        )
        .select(
            "doc_id",
            F.col("i").cast("long").alias("chunk_idx"),
            F.expr(f"substring(text, i * {CHUNK_STRIDE} + 1, {CHUNK_CHARS})").alias("chunk_text"),
        )
        .withColumn("chunk_chars", F.length("chunk_text").cast("long"))
    )


# --- repetition scoring (Gopher-style duplicate n-gram signal) ------------------

REP_NGRAM = 3  # word trigrams


@register(
    "text_repetition_score",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {REP_NGRAM}
              THEN list_transform(generate_series(1, len(t) - {REP_NGRAM - 1}),
                                  i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
              ELSE [] END AS g
  FROM toks
)
SELECT doc_id,
       CAST(len(g) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct,
       CASE WHEN len(g) > 0
            THEN CAST(len(g) - len(list_distinct(g)) AS DOUBLE) / CAST(len(g) AS DOUBLE)
            ELSE 0.0 END AS dup_frac
FROM grams
""",
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate word-trigram fraction per document — the repetition quality
    signal (a high duplicate-n-gram share marks boilerplate/degenerate text
    that a training corpus filters out; same family as the Gopher repetition
    rules). Trigram list, distinct count, and the dup fraction are all array
    HOF expressions over the token split — per-row work, no shuffle, no UDF;
    the one division is a single IEEE op on identical integers in both
    engines, so the score is value-hash exact."""
    t = _tokens()
    grams = F.when(
        F.size(t) >= REP_NGRAM,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - REP_NGRAM),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i + 1), F.element_at(t, i + 2), F.element_at(t, i + 3)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = _docs(spark, sf_dir).select("doc_id", grams.alias("g"))
    n = F.size("g").cast("long")
    nd = F.size(F.array_distinct("g")).cast("long")
    return d.select(
        "doc_id",
        n.alias("n_grams"),
        nd.alias("n_distinct"),
        F.when(n > 0, (n - nd).cast("double") / n.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


# --- vocabulary build -----------------------------------------------------------

VOCAB_TOP_K = 100


@register(
    "text_vocab_topk",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
counts AS (
  SELECT token, count(*) AS n FROM tok WHERE token <> '' GROUP BY token
),
ranked AS (
  SELECT token, n, row_number() OVER (ORDER BY n DESC, token) AS token_id
  FROM counts
)
SELECT CAST(token_id AS BIGINT) AS token_id, token, n
FROM ranked WHERE token_id <= {VOCAB_TOP_K}
""",
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep vocabulary build: corpus-wide token frequencies, top-K
    by count with a deterministic (count desc, token asc) tie-break, ids
    assigned by rank — the table a frequency-based tokenizer trains from.
    Scale: explode -> token-keyed count is ONE hash aggregate with map-side
    partials (Zipf-head tokens partially aggregate before the exchange, so
    skew never concentrates raw rows); the top-K itself is
    ``orderBy().limit(K)`` = TakeOrderedAndProject — every partition keeps
    its local K, the driver merges |partitions| x K candidates — NEVER a
    global row_number window over the full vocabulary (that would funnel
    every distinct token through one partition). Only the K survivors pass
    through the tiny rank window that assigns ids."""
    tok = (
        _docs(spark, sf_dir)
        .select(F.explode(_tokens()).alias("token"))
        .filter(F.col("token") != "")
    )
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    topk = counts.orderBy(F.col("n").desc(), "token").limit(VOCAB_TOP_K)
    return topk.select(
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("token")))
        .cast("long")
        .alias("token_id"),
        "token",
        "n",
    )


# --- corpus length histogram ----------------------------------------------------

HIST_BUCKET_CHARS = 50
HIST_N_BUCKETS = 10  # lengths >= 450 land in the top bucket


@register(
    "doc_length_histogram",
    oracle=f"""
SELECT least(n_chars // {HIST_BUCKET_CHARS}, {HIST_N_BUCKETS - 1}) AS bucket,
       count(*) AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean_chars
FROM documents
GROUP BY 1
""",
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: fixed-width document-length buckets with
    count/min/max/mean per bucket — the sizing histogram that picks sequence
    length and packing parameters for a training run. Integer bucket
    arithmetic is identical in both engines and the mean is one IEEE
    division of exact integers; a single map-side-combined aggregate at any
    corpus size."""
    d = _docs(spark, sf_dir)
    bucket = F.least(
        (F.col("n_chars") / HIST_BUCKET_CHARS).cast("long"),
        F.lit(HIST_N_BUCKETS - 1),
    ).alias("bucket")
    return (
        d.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("mean_chars"),
        )
    )


# --- Cross-source n-gram novelty (data-diversity measurement) ----------------------


@register(
    "text_source_novelty",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, source, {SHINGLES_SQL_REF} AS shingles FROM documents
),
ex AS (
  SELECT doc_id, source, unnest(shingles) AS s FROM sh
),
spread AS (
  SELECT s, count(DISTINCT source) AS n_sources FROM ex GROUP BY s
)
SELECT e.doc_id, e.source,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN sp.n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exclusive,
       CAST(sum(CASE WHEN sp.n_sources = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS novelty
FROM ex e JOIN spread sp ON e.s = sp.s
GROUP BY e.doc_id, e.source
""",
)
def text_source_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source n-gram novelty: per document, the fraction of its word
    trigrams that no OTHER source's corpus contains — the data-diversity
    signal mixture tuning needs (a source whose documents are mostly
    shingle-shared with the rest of the corpus adds volume, not diversity).
    A shingle counts as exclusive when exactly one source uses it, which is
    computable from ONE global (shingle -> distinct-source count) aggregate
    instead of per-(doc, other-source) comparisons.

    Scale: same inverted-index skeleton as the dedup family — explode
    shingles once, one map-side-combinable distinct-count per shingle, one
    join back (the spread table is vocabulary-sized; at 100 TB it stays a
    keyed shuffle join, never broadcast-hinted), one per-doc aggregate.
    The novelty ratio is a single BIGINT/BIGINT -> double division."""
    from .dedup import shingles_col

    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "source", "text"))
    sh = docs.select("doc_id", "source", shingles_col().alias("shingles"))
    ex = sh.select("doc_id", "source", F.explode("shingles").alias("s"))
    spread_tbl = ex.groupBy("s").agg(F.count_distinct("source").alias("n_sources"))
    joined = ex.join(spread_tbl, "s")
    return joined.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("n_sources") == 1, 1).otherwise(0)).alias("n_exclusive"),
        (
            F.sum(F.when(F.col("n_sources") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("novelty"),
    )


# --- Winnowing fingerprints (MOSS) ---------------------------------------------------

WINNOW_K = 3  # tokens per k-gram
WINNOW_W = 4  # hashes per winnowing window
_WIN_POS_BITS = 20  # pos packs into the low 20 bits of the combined key
_WIN_HASH_MOD = 1 << 39  # 39-bit hash keeps hash*2^20 + pos < 2^59


def _winnow_fps_sql() -> str:
    """DuckDB fragment: the winnowed (doc_id, pos, fp) set, as a CTE body."""
    kgram = f"array_to_string(list_slice(toks, CAST(pos AS INT), CAST(pos + {WINNOW_K - 1} AS INT)), ' ')"
    return f"""
tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
grams AS (
  SELECT doc_id, unnest(range(1, length(toks) - {WINNOW_K - 2})) AS pos, toks
  FROM tok WHERE length(toks) >= {WINNOW_K}
),
hashed AS (
  SELECT doc_id, pos,
         ({h60_sql(kgram)} % {_WIN_HASH_MOD}) * {1 << _WIN_POS_BITS} + pos AS combined
  FROM grams
),
winmin AS (
  SELECT doc_id,
         min(combined) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW) AS sel
  FROM hashed
),
fps AS (
  SELECT DISTINCT doc_id,
         sel % {1 << _WIN_POS_BITS} AS pos,
         sel // {1 << _WIN_POS_BITS} AS fp
  FROM winmin
)
"""


def _winnow_fps(docs: DataFrame) -> DataFrame:
    """Winnowed fingerprints as a (doc_id, pos, fp) DataFrame."""
    toks = docs.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= WINNOW_K
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.size("toks") - (WINNOW_K - 1))
        ).alias("pos"),
        "toks",
    )
    kgram = F.array_join(F.slice("toks", F.col("pos"), WINNOW_K), " ")
    hashed = grams.select(
        "doc_id",
        "pos",
        (
            (h60(kgram) % _WIN_HASH_MOD) * (1 << _WIN_POS_BITS) + F.col("pos")
        ).alias("combined"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WINNOW_W - 1), Window.currentRow)
    )
    return (
        hashed.select("doc_id", F.min("combined").over(w).alias("sel"))
        .distinct()
        .select(
            "doc_id",
            (F.col("sel") % (1 << _WIN_POS_BITS)).alias("pos"),
            (F.col("sel") / (1 << _WIN_POS_BITS)).cast("long").alias("fp"),
        )
    )


@register(
    "text_winnowing_fingerprints",
    oracle=f"""
WITH {_winnow_fps_sql()}
SELECT doc_id, CAST(pos AS BIGINT) AS pos, CAST(fp AS BIGINT) AS fp FROM fps
""",
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every {WINNOW_K}-token k-gram, slide a {WINNOW_W}-hash
    window, keep each window's minimum — any shared passage of at least
    {WINNOW_W + WINNOW_K - 1} tokens between two documents is GUARANTEED to
    share a selected fingerprint, at ~2/(w+1) the density of keeping every
    hash. Tie-breaks and 'which window selected it' are made engine-free by
    packing (hash, position) into one BIGINT — hash in the high 39 bits,
    position in the low {_WIN_POS_BITS} — so the window min IS the
    lexicographic (hash, leftmost-pos) winner and both engines select
    byte-identical sets. Leading partial windows (the first w-1 positions)
    participate, a documented standard variant. Positions above 2^{_WIN_POS_BITS}
    would collide in the packing; chunk longer documents upstream
    (text_chunk_documents) before fingerprinting.

    Scale: explode -> per-row JVM md5 -> ONE window sort per doc partition
    (doc_id partitioning, no global sort) -> distinct, which reuses the
    same doc_id-keyed exchange. Output is ~2n/(w+1) rows per document."""
    return _winnow_fps(_docs(spark, sf_dir)).select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "fp"
    )


@register(
    "dedup_winnowing_overlap",
    oracle=f"""
WITH {_winnow_fps_sql()},
inv AS (SELECT DISTINCT doc_id, fp FROM fps),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fps
  FROM inv a JOIN inv b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared_fps FROM pairs WHERE shared_fps >= 8
""",
)
def dedup_winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection over winnowed fingerprints — the MOSS
    report: document pairs sharing >= 8 selected fingerprints, i.e. pairs
    with many guaranteed-common token runs. Complements the shingle/minhash
    family: winnowing's window guarantee localizes WHERE the overlap is
    (contiguous passages), so it catches partial-plagiarism shapes that
    whole-document Jaccard dilutes below threshold.

    Scale: the same inverted-index skeleton as every dedup op here — pairs
    are generated ONLY within same-fingerprint buckets (no all-pairs), the
    per-doc fingerprint set is already ~2/(w+1) sparse, and hot fingerprints
    (boilerplate runs) are exactly the hot-shingle skew AQE's skew-join
    split handles; the pair count aggregate shuffles on the (a, b) key
    once."""
    fps = _winnow_fps(_docs(spark, sf_dir)).select("doc_id", "fp").distinct()
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= 8)
    )


# --- Corpus-frequency quality score --------------------------------------------------

RARE_PER_MILLE = 1  # token is rare when corpus_count * 1000 < corpus_total


@register(
    "text_freq_quality",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
vocab AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
tot AS (SELECT count(*) AS total FROM tok)
SELECT t.doc_id,
       count(*) AS n_tok,
       CAST(sum(v.cnt) AS BIGINT) AS freq_mass,
       CAST(sum(v.cnt) AS DOUBLE) / CAST(count(*) * (SELECT total FROM tot) AS DOUBLE) AS mean_token_freq,
       CAST(sum(CASE WHEN v.cnt * {1000 // RARE_PER_MILLE} < (SELECT total FROM tot) THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       CAST(sum(CASE WHEN v.cnt * {1000 // RARE_PER_MILLE} < (SELECT total FROM tot) THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS rare_token_ratio
FROM tok t JOIN vocab v USING (term)
GROUP BY t.doc_id
""",
)
def text_freq_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency quality signals per document: the mean corpus
    frequency of its tokens (low = rare-token-heavy, the frequency-based
    quality filter of web-scale curation pipelines) and the fraction of
    tokens rarer than {RARE_PER_MILLE} per mille. The usual mean of
    per-token probabilities is a float sum whose order differs across
    engines; instead the SAME number is computed as
    sum(corpus_count) / (n_tok * corpus_total) — an exact BIGINT mass over
    one product — so both engines perform one identical IEEE division.
    Rarity compares integers (cnt * 1000 < total), never a float
    threshold.

    Scale: one explode -> one vocabulary aggregate (|vocab| rows, map-side
    combined) -> join back on term (vocabulary table broadcasts when it
    fits, else a keyed shuffle with natural-Zipf skew for AQE) -> one
    per-doc aggregate; the corpus total rides in as a broadcast 1-row
    aggregate."""
    docs = _docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(_tokens()).alias("term"))
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    rare = F.col("cnt") * 1000 < F.col("total")
    return (
        tok.join(F.broadcast(vocab), "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("cnt").alias("freq_mass"),
            (
                F.sum("cnt").cast("double")
                / (F.count(F.lit(1)) * F.first("total")).cast("double")
            ).alias("mean_token_freq"),
            F.sum(F.when(rare, 1).otherwise(0)).alias("n_rare"),
            (
                F.sum(F.when(rare, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("rare_token_ratio"),
        )
    )


# --- bigram language-model table -----------------------------------------------------


@register(
    "text_bigram_lm",
    oracle="""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
pairs AS (
  SELECT toks[CAST(pos AS INT)] AS ctx, toks[CAST(pos + 1 AS INT)] AS nxt
  FROM tok, unnest(range(1, length(toks))) AS u(pos)
  WHERE length(toks) >= 2
),
pc AS (SELECT ctx, nxt, count(*) AS pair_n FROM pairs GROUP BY 1, 2),
cc AS (SELECT ctx, CAST(sum(pair_n) AS BIGINT) AS ctx_n FROM pc GROUP BY 1)
SELECT pc.ctx, pc.nxt, pc.pair_n, cc.ctx_n,
       CAST(pc.pair_n AS DOUBLE) / CAST(cc.ctx_n AS DOUBLE) AS cond_p
FROM pc JOIN cc ON pc.ctx = cc.ctx
""",
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language model: P(next | context) estimated from
    adjacent-token counts — the n-gram LM table behind classic perplexity
    filtering and contamination heuristics, and the natural companion to
    the BPE pair scan (same explode skeleton, probabilistic output). The
    conditional probability is one BIGINT/BIGINT division (context counts
    are the SUM of that context's pair counts, so the distribution rows
    for each context sum to exactly 1 in both engines — no separate
    unigram pass that could disagree at document edges).

    Scale: one explode -> one (ctx, nxt) aggregate with map-side partials
    -> a |contexts|-sized re-aggregate joined back on ctx (broadcast when
    the vocabulary fits, keyed shuffle with AQE skew-split otherwise —
    Zipf heads are the textbook skew case). Output is vocabulary-bounded,
    not corpus-bounded."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(F.split("text", " ").alias("toks")).filter(F.size("toks") >= 2)
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.element_at("toks", i).alias("ctx"),
                    F.element_at("toks", i + 1).alias("nxt"),
                ),
            )
        ).alias("p")
    ).select("p.ctx", "p.nxt")
    pc = pairs.groupBy("ctx", "nxt").agg(F.count(F.lit(1)).alias("pair_n"))
    cc = pc.groupBy("ctx").agg(F.sum("pair_n").alias("ctx_n"))
    return pc.join(F.broadcast(cc), "ctx").select(
        "ctx",
        "nxt",
        "pair_n",
        "ctx_n",
        (F.col("pair_n").cast("double") / F.col("ctx_n").cast("double")).alias("cond_p"),
    )


# --- keyed pseudonymization + k-anonymity suppression -------------------------------

PSEUDO_SALT = "pseudo-v1"  # rotate per release; never derivable from output
K_ANON = 5


@register(
    "pseudonymize_user_activity",
    oracle=f"""
WITH pseudo AS (
  SELECT substr(md5('{PSEUDO_SALT}' || CAST(user_id AS VARCHAR)), 1, 16) AS pseudonym,
         event_type, value
  FROM events
),
rolled AS (
  SELECT pseudonym,
         count(*) AS n_events,
         count(DISTINCT event_type) AS n_types,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM pseudo GROUP BY pseudonym
)
SELECT * FROM rolled WHERE n_events >= {K_ANON}
""",
)
def pseudonymize_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-preserving activity export: user ids replaced by keyed
    pseudonyms (salted md5 prefix — consistent across every table salted
    with the same release key, so joins still line up; rotate the salt to
    break linkability between releases), rolled up per pseudonym, and
    groups smaller than {K_ANON} SUPPRESSED — the k-anonymity floor that
    keeps rare users from being re-identified by their own row. This is
    the privacy side of the curation pipeline next to text_pii_redact
    (which scrubs payload content; this one de-identifies the subject).

    Scale: the pseudonym is one per-row JVM md5 inside codegen; the
    rollup is a map-side-combinable aggregate on the pseudonym key; the
    suppression predicate is a post-aggregate integer filter (HAVING)."""
    ev = spread(load_table(spark, sf_dir, "events"))
    pseudonym = F.substring(
        F.md5(F.concat(F.lit(PSEUDO_SALT), F.col("user_id").cast("string"))), 1, 16
    )
    return (
        ev.groupBy(pseudonym.alias("pseudonym"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("event_type").alias("n_types"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .filter(F.col("n_events") >= K_ANON)
    )


# --- exact phrase search over a positional inverted index --------------------------

PHRASE = ("fast", "hash", "join")  # the query phrase; tokens joined at pos+i


@register(
    "search_phrase_positions",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
post AS (
  SELECT doc_id,
         unnest(ws) AS tok,
         unnest(range(0, len(ws))) AS pos
  FROM toks
),
m AS (
  SELECT p0.doc_id, p0.pos AS start_pos
  FROM post p0
  JOIN post p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
  JOIN post p2 ON p2.doc_id = p0.doc_id AND p2.pos = p0.pos + 2
  WHERE p0.tok = '{PHRASE[0]}' AND p1.tok = '{PHRASE[1]}' AND p2.tok = '{PHRASE[2]}'
)
SELECT doc_id,
       count(*) AS n_occurrences,
       CAST(min(start_pos) AS BIGINT) AS first_pos
FROM m GROUP BY doc_id
""",
)
def search_phrase_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("{' '.join(PHRASE)}") via a POSITIONAL inverted
    index — the IR capability the bag-of-words retrieval family (tfidf /
    BM25 / RRF) cannot express: token adjacency. Postings are (doc, token,
    pos); the k-token phrase is a chain of k-1 self-equi-joins on
    (doc_id, pos + i). Per match the doc reports occurrence count and first
    position.

    Scale: the postings list is FILTERED TO THE PHRASE'S TOKENS before any
    join (Catalyst pushes the token predicate into the scan of a stored
    postings table — the phrase-irrelevant 99.9% of the index is never
    read), so each join is keyed on (doc_id, pos): high-cardinality
    composite keys, no token hot-key skew even for stopword phrases. In a
    search system the postings table is the materialized artifact,
    bucketed by token; here it derives inline from the fixture with
    identical shape."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    post = spread(docs).select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
    )
    post = post.filter(F.col("tok").isin(*PHRASE))
    chain = post.filter(F.col("tok") == PHRASE[0]).select("doc_id", F.col("pos").alias("start_pos"))
    for i, t in enumerate(PHRASE[1:], start=1):
        nxt = post.filter(F.col("tok") == t).select(
            "doc_id", (F.col("pos") - i).alias("start_pos")
        )
        chain = chain.join(nxt, ["doc_id", "start_pos"])
    return chain.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("start_pos").cast("long").alias("first_pos"),
    )


# --- vocabulary coverage curve (tokenizer sizing) -----------------------------------

COVERAGE_TARGETS = (50, 90, 99)


@register(
    "vocab_coverage_curve",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
vc AS (SELECT token, count(*) AS cnt FROM tok WHERE token <> '' GROUP BY token),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS n_types FROM vc),
c AS (
  SELECT cnt,
         CAST(sum(cnt) OVER (ORDER BY cnt DESC, token ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         row_number() OVER (ORDER BY cnt DESC, token) AS rnk
  FROM vc
),
t AS (SELECT unnest({list(COVERAGE_TARGETS)}) AS pct)
SELECT t.pct,
       min(struct_pack(r := c.rnk, m := c.cum)).r AS n_types_needed,
       min(struct_pack(r := c.rnk, m := c.cum)).m AS mass_covered,
       any_value(tot.total) AS total_tokens,
       any_value(tot.n_types) AS n_types
FROM c, tot, t
WHERE c.cum * 100 >= tot.total * t.pct
GROUP BY t.pct
""",
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-sizing question: how many
    of the most frequent types cover {COVERAGE_TARGETS}% of the corpus's
    token mass? For each target the smallest head size whose cumulative
    frequency reaches it (integer cross-multiplication cum*100 >=
    total*pct, so no float rank is ever computed; the argmin ties to the
    deterministic (cnt desc, token) vocabulary order).

    Scale: the cumulative scan runs over the VOCABULARY histogram, not the
    token stream — the feature_quantile_binning justification: |types| is
    orders of magnitude below |tokens| and Zipf-bounded, so the single
    ordered window over it is deliberate; the token-scale work is one
    map-side-combinable count. Each row then checks all
    {len(COVERAGE_TARGETS)} targets via a tiny explode and one argmin
    aggregate — no per-target rescan."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    tok = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token")).filter(
        F.col("token") != ""
    )
    vc = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vc.agg(F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_types"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    c = vc.select(
        "cnt",
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(w).cast("long").alias("rnk"),
    )
    t = F.explode(F.array(*[F.lit(p) for p in COVERAGE_TARGETS])).alias("pct")
    return (
        c.crossJoin(F.broadcast(tot))
        .select("cnt", "cum", "rnk", "total", "n_types", t)
        .filter(F.col("cum") * 100 >= F.col("total") * F.col("pct"))
        .groupBy("pct")
        .agg(
            F.min(F.struct(F.col("rnk").alias("r"), F.col("cum").alias("m")))["r"].alias(
                "n_types_needed"
            ),
            F.min(F.struct(F.col("rnk").alias("r"), F.col("cum").alias("m")))["m"].alias(
                "mass_covered"
            ),
            F.first("total").alias("total_tokens"),
            F.first("n_types").alias("n_types"),
        )
    )


# --- skip-gram (center, context) pair extraction ------------------------------------

SKIPGRAM_WINDOW = 2       # context window ±2
SKIPGRAM_PAIR_DENOM = 2000  # keep pairs with count >= total_pairs/2000 (floor 2)


@register(
    "skipgram_pair_counts",
    oracle=f"""
WITH w AS (
  SELECT string_split(text, ' ') AS ws, len(string_split(text, ' ')) AS n
  FROM documents
),
p AS (
  SELECT unnest(
    list_transform(range(1, n), i -> struct_pack(c := ws[i], x := ws[i+1]))
    || list_transform(range(1, n), i -> struct_pack(c := ws[i+1], x := ws[i]))
    || list_transform(range(1, n-1), i -> struct_pack(c := ws[i], x := ws[i+2]))
    || list_transform(range(1, n-1), i -> struct_pack(c := ws[i+2], x := ws[i]))
  ) AS pr
  FROM w
),
pc AS (SELECT pr.c AS center, pr.x AS context, count(*) AS cnt FROM p GROUP BY 1, 2),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM pc)
SELECT pc.center, pc.context, pc.cnt
FROM pc, tot
WHERE pc.cnt >= greatest(tot.total // {SKIPGRAM_PAIR_DENOM}, 2)
""",
)
def skipgram_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) pair counts within a ±{SKIPGRAM_WINDOW}
    token window — the co-occurrence statistics word2vec/GloVe-style
    embedding training consumes. Pairs are emitted JOIN-FREE from the token
    array itself: for each offset d in 1..{SKIPGRAM_WINDOW}, zip the array
    against its d-shifted slice (the shingles_col zip-shift idiom) and emit
    both orientations; the tail pair table is pruned with a corpus-relative
    support floor (total_pairs/{SKIPGRAM_PAIR_DENOM}, floor 2).

    Scale: per-row array work plus ONE map-side-combinable (center,
    context) count — no positional self-join, no shuffle besides the final
    aggregate (and the 1-row total broadcast). Zipf head pairs are heavy
    keys only at the partial-aggregate level, where map-side combine has
    already collapsed them per task."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    ws = F.split(F.col("text"), " ")
    n = F.size(ws)

    def shifted_pairs(d: int):
        # greatest(n - d, 0): a doc shorter than the offset yields an empty
        # pair slice — a NEGATIVE slice length is INVALID_PARAMETER_VALUE
        # (found by the r8 adversarial-fixture sweep on 1-token docs)
        take = F.greatest(n - F.lit(d), F.lit(0))
        fwd = F.slice(
            F.zip_with(
                ws, F.slice(ws, d + 1, n),
                lambda a, b: F.struct(a.alias("c"), b.alias("x")),
            ),
            1,
            take,
        )
        bwd = F.slice(
            F.zip_with(
                ws, F.slice(ws, d + 1, n),
                lambda a, b: F.struct(b.alias("c"), a.alias("x")),
            ),
            1,
            take,
        )
        return [fwd, bwd]

    arrays = []
    for d in range(1, SKIPGRAM_WINDOW + 1):
        arrays.extend(shifted_pairs(d))
    p = (
        spread(docs)
        .select(F.explode(F.concat(*arrays)).alias("pr"))
        .filter(F.col("pr").isNotNull())
    )
    pc = p.groupBy(
        F.col("pr.c").alias("center"), F.col("pr.x").alias("context")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = pc.agg(F.sum("cnt").alias("total"))
    return (
        pc.crossJoin(F.broadcast(tot))
        .filter(
            F.col("cnt")
            >= F.greatest(
                F.expr(f"total DIV {SKIPGRAM_PAIR_DENOM}"), F.lit(2).cast("long")
            )
        )
        .select("center", "context", "cnt")
    )


# --- intra-document repeated n-gram spans (de-repetition planning) ------------------

INTRADOC_MIN_REPEATS = 2


@register(
    "text_intradoc_repeats",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws, len(string_split(text, ' ')) AS n
  FROM documents
),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, n - 1),
                i -> struct_pack(s := ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2],
                                 p := CAST(i - 1 AS BIGINT)))) AS r
  FROM t WHERE n >= 3
)
SELECT doc_id, r.s AS shingle,
       count(*) AS n_repeats,
       min(r.p) AS first_pos,
       max(r.p) AS last_pos
FROM g GROUP BY doc_id, r.s
HAVING count(*) >= {INTRADOC_MIN_REPEATS}
""",
)
def text_intradoc_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repeated 3-gram spans — the de-repetition cleaning
    step (strip looped boilerplate, stuttering generation, nav-bar echoes)
    that the CROSS-document dedup family deliberately ignores: for each
    document, every 3-gram occurring >= {INTRADOC_MIN_REPEATS} times with
    its occurrence count and first/last token positions, i.e. the edit plan
    a cleaner applies. Complements text_repetition_score (a scalar quality
    feature) by materializing WHICH spans repeat and WHERE.

    Scale: 3-grams come from the same zip-shift array idiom as
    shingles_col — per-row work only — and the aggregate is keyed
    (doc_id, shingle), so it is map-side-combinable and perfectly
    partition-local after the one shuffle; no joins at all."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.split(F.col("text"), " ")
    n = F.size(ws)
    pairs = F.zip_with(ws, F.slice(ws, 2, n), lambda a, b: F.concat(a, F.lit(" "), b))
    trips = F.zip_with(pairs, F.slice(ws, 3, n), lambda a, b: F.concat(a, F.lit(" "), b))
    grams = F.when(n >= 3, F.slice(trips, 1, n - 2)).otherwise(
        F.array().cast("array<string>")
    )
    g = spread(docs).select(
        "doc_id", F.posexplode(grams).alias("pos", "shingle")
    )
    return (
        g.groupBy("doc_id", "shingle")
        .agg(
            F.count(F.lit(1)).alias("n_repeats"),
            F.min("pos").cast("long").alias("first_pos"),
            F.max("pos").cast("long").alias("last_pos"),
        )
        .filter(F.col("n_repeats") >= INTRADOC_MIN_REPEATS)
    )


# --- chunk-reassembly roundtrip (chunker contract verification) ---------------------


@register(
    "chunk_reassembly_roundtrip",
    oracle=f"""
WITH g AS (
  SELECT doc_id, text,
         unnest(generate_series(0, (length(text) - 1) // {CHUNK_STRIDE})) AS i
  FROM documents WHERE length(text) > 0
),
c AS (
  SELECT doc_id, text, i,
         substr(substr(text, CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT), {CHUNK_CHARS}),
                1, {CHUNK_STRIDE}) AS piece
  FROM g
),
r AS (
  SELECT doc_id, any_value(text) AS text, count(*) AS n_chunks,
         string_agg(piece, '' ORDER BY i) AS reassembled
  FROM c GROUP BY doc_id
)
SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
       CAST(length(text) AS BIGINT) AS orig_chars,
       (reassembled = text) AS roundtrip_ok
FROM r
""",
)
def chunk_reassembly_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunker CONTRACT check as a query: reassemble every document from its
    overlapping chunks (each chunk's non-overlap prefix of {CHUNK_STRIDE}
    chars, concatenated in chunk order) and compare byte-for-byte with the
    original. The grid guarantees the last chunk's prefix is <=
    {CHUNK_STRIDE} chars (the last stride start is <= length-1), so the
    prefix concatenation is lossless by construction — this query PROVES it
    per document, per corpus, the invariant a RAG/packing pipeline silently
    depends on after any chunker change.

    Scale: chunking is scan-parallel arithmetic; reassembly is one
    (doc_id)-keyed aggregate whose per-group state is the document itself —
    bounded by max doc size exactly like the chunker's input row. A false
    row anywhere means boundary loss; the oracle recomputes the roundtrip
    independently, so an off-by-one in EITHER engine's substring math fails
    the hash."""
    d = _docs(spark, sf_dir).filter(F.length("text") > 0)
    c = d.select(
        "doc_id",
        "text",
        F.posexplode(
            F.expr(f"sequence(0, CAST((length(text) - 1) DIV {CHUNK_STRIDE} AS INT))")
        ).alias("p", "i"),
    ).select(
        "doc_id",
        "text",
        "i",
        F.expr(
            f"substring(substring(text, i * {CHUNK_STRIDE} + 1, {CHUNK_CHARS}), 1, {CHUNK_STRIDE})"
        ).alias("piece"),
    )
    r = c.groupBy("doc_id").agg(
        F.first("text").alias("text"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("i").alias("i"), F.col("piece").alias("s")))
                ),
                lambda x: x["s"],
            ),
            "",
        ).alias("reassembled"),
    )
    return r.select(
        "doc_id",
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.length("text").cast("long").alias("orig_chars"),
        (F.col("reassembled") == F.col("text")).alias("roundtrip_ok"),
    )


# --- language-ID confusion matrix (classifier evaluation on the surface) -----------


@register(
    "langid_confusion_matrix",
    oracle=f"""
WITH pred AS ({_LANGID_ORACLE}),
tot AS (
  SELECT labeled_lang, count(*) AS labeled_total FROM pred GROUP BY labeled_lang
)
SELECT p.labeled_lang, p.predicted_lang,
       count(*) AS n,
       any_value(t.labeled_total) AS labeled_total,
       CAST(count(*) AS DOUBLE) / any_value(t.labeled_total) AS frac_of_labeled,
       p.labeled_lang = p.predicted_lang AS is_correct
FROM pred p JOIN tot t ON t.labeled_lang = p.labeled_lang
GROUP BY p.labeled_lang, p.predicted_lang
""",
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword-marker language classifier against
    the corpus's labeled `lang` — classifier EVALUATION on the engine
    surface (the retrieval_eval_metrics precedent applied to
    classification): per (labeled, predicted) cell, the count and its share
    of the labeled class (= per-class recall on the diagonal, the specific
    confusions off it). This is the table that decides whether the cheap
    n-gram heuristic is good enough to route documents, and which language
    pairs need a stronger model.

    Scale shape: the per-doc prediction is the text_lang_id scan (per-row
    expressions, no shuffle); the matrix is ONE (labeled, predicted) keyed
    aggregate plus a broadcast-size per-class total join — |langs|^2 output
    rows regardless of corpus size. The share is a single exact division."""
    pred = text_lang_id(spark, sf_dir).select("labeled_lang", "predicted_lang")
    tot = pred.groupBy("labeled_lang").agg(F.count(F.lit(1)).alias("labeled_total"))
    return (
        pred.groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(tot), "labeled_lang")
        .select(
            "labeled_lang",
            "predicted_lang",
            "n",
            "labeled_total",
            (F.col("n").cast("double") / F.col("labeled_total")).alias(
                "frac_of_labeled"
            ),
            (F.col("labeled_lang") == F.col("predicted_lang")).alias("is_correct"),
        )
    )
