"""Data-selection and filtering passes for training-corpus curation — the
rule-based and importance-based document selection layer that sits between
raw ingest and the dedup/mixture stages (SURVEY.md §7 Phase 5 north star):

- ``filter_gopher_rules``   — Gopher-style rule battery (Rae et al. 2021):
  per-document structural-quality flags (word count band, mean word length
  band, stopword presence, alphabetic-word fraction, single-token
  repetition cap) plus the conjunctive keep decision.
- ``lm_fluency_score``      — CCNet-style LM fluency filter: score each
  document under the corpus's own bigram LM (the ``text_bigram_lm`` table)
  and flag the least-fluent tail; exact BIGINT probability mass keeps the
  cross-engine hash bit-exact without a single libm call.
- ``dsir_importance_resample`` — DSIR (Xie et al. 2023): hashed-bigram
  importance weights against a target domain (here: the ``en`` slice),
  normalized by the corpus max, with the h60-salted keep decision — data
  selection as one corpus pass plus a 4096-row broadcast dim.
- ``training_order_shuffle`` — deterministic epoch shuffle: h60 sort key →
  shard assignment → per-shard position → exact global position via the
  tiny per-shard offset table. The artifact a trainer actually consumes
  (shard files read in order), computed without a single global window.
- ``token_shard_assembly`` — fixed-token data-loader shards cut by global
  token offset over the epoch order; the exact distributed two-level
  prefix sum (per-shard window cumsum + tiny offset table).

Every float in a hash-checked output is either a single division of exact
BIGINTs or a comparison of identically-computed doubles — no libm, no
order-dependent folds (the corpus.py discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions.hashing import h60, h60_sql
from ..io import load_table, spread, track_persist
from ..registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(load_table(spark, sf_dir, "documents"))


# --- Gopher rule filter ------------------------------------------------------

# Canonical published thresholds (Gopher / MassiveText, Rae et al. 2021 §A1.1;
# the stopword rule there requires >= 2 hits from a short function-word list).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in", "that", "with", "be", "have")
GOPHER_MIN_STOP_HITS = 2
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MAX_TOP_TOK_FRAC = 0.20

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + "]"


@register(
    "filter_gopher_rules",
    oracle=f"""
WITH t AS (
  SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(n_chars - (len(toks) - 1) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS mean_word_len,
         CAST(len(list_intersect(list_distinct(toks), {_STOP_SQL})) AS BIGINT) AS stop_hits,
         CAST(list_max(list_transform(list_distinct(toks),
              w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE)
           / CAST(len(toks) AS DOUBLE) AS top_tok_frac,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
           / CAST(len(toks) AS DOUBLE) AS alpha_frac
  FROM t
),
f AS (
  SELECT *,
    CAST(CASE WHEN n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS} THEN 1 ELSE 0 END AS BIGINT) AS r_words,
    CAST(CASE WHEN mean_word_len >= {GOPHER_MIN_MEAN_LEN} AND mean_word_len <= {GOPHER_MAX_MEAN_LEN} THEN 1 ELSE 0 END AS BIGINT) AS r_mean_len,
    CAST(CASE WHEN stop_hits >= {GOPHER_MIN_STOP_HITS} THEN 1 ELSE 0 END AS BIGINT) AS r_stop,
    CAST(CASE WHEN alpha_frac >= {GOPHER_MIN_ALPHA_FRAC} THEN 1 ELSE 0 END AS BIGINT) AS r_alpha,
    CAST(CASE WHEN top_tok_frac <= {GOPHER_MAX_TOP_TOK_FRAC} THEN 1 ELSE 0 END AS BIGINT) AS r_rep
  FROM m
)
SELECT doc_id, n_words, mean_word_len, stop_hits, top_tok_frac, alpha_frac,
       r_words, r_mean_len, r_stop, r_alpha, r_rep,
       CAST(r_words * r_mean_len * r_stop * r_alpha * r_rep AS BIGINT) AS keep
FROM f
""",
)
def filter_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule battery: per-document structural flags and the
    conjunctive keep decision. Unlike ``text_quality_score`` (a scalar
    heuristic), this is the RULE layer — each published threshold gets its
    own auditable flag so the filter report explains every drop.

    Every metric is per-row array arithmetic: mean word length from the
    exact char/token identity (chars = sum(len) + separators), stopword
    hits via array_intersect against the fixed function-word list, the
    repetition cap from the max single-token count (the worst-case
    O(|vocab|*n_tokens) scan is bounded per row and embarrassingly
    parallel). Zero shuffles: the plan is scan -> project. Every division
    is a single BIGINT/BIGINT -> DOUBLE op, identical in both engines."""
    toks = F.split("text", " ")
    t = _docs(spark, sf_dir).select(
        "doc_id",
        "n_chars",
        toks.alias("toks"),
        F.size(toks).cast("long").alias("n_words"),
    )
    distinct_toks = F.array_distinct("toks")
    top_tok_n = F.array_max(
        F.transform(distinct_toks, lambda w: F.size(F.filter(F.col("toks"), lambda x: x == w)))
    )
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    m = t.select(
        "doc_id",
        "n_words",
        (
            (F.col("n_chars") - (F.col("n_words") - F.lit(1))).cast("double")
            / F.col("n_words").cast("double")
        ).alias("mean_word_len"),
        F.size(F.array_intersect(distinct_toks, stop_arr)).cast("long").alias("stop_hits"),
        (top_tok_n.cast("double") / F.col("n_words").cast("double")).alias("top_tok_frac"),
        (
            F.size(F.filter(F.col("toks"), lambda x: x.rlike("[a-z]"))).cast("double")
            / F.col("n_words").cast("double")
        ).alias("alpha_frac"),
    )
    # when/otherwise(0), not bool.cast(long): a NULL metric (NULL-text doc)
    # must yield flag 0 like the oracle's CASE, not a NULL that upcasts the
    # whole pandas column to float64 and breaks the dtype-sensitive hash
    def _flag(cond, name):
        return F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("long").alias(name)

    r_words = _flag(
        F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS), "r_words"
    )
    r_mean_len = _flag(
        (F.col("mean_word_len") >= GOPHER_MIN_MEAN_LEN)
        & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_LEN),
        "r_mean_len",
    )
    r_stop = _flag(F.col("stop_hits") >= GOPHER_MIN_STOP_HITS, "r_stop")
    r_alpha = _flag(F.col("alpha_frac") >= GOPHER_MIN_ALPHA_FRAC, "r_alpha")
    r_rep = _flag(F.col("top_tok_frac") <= GOPHER_MAX_TOP_TOK_FRAC, "r_rep")
    f = m.select("*", r_words, r_mean_len, r_stop, r_alpha, r_rep)
    return f.select(
        "*",
        (
            F.col("r_words") * F.col("r_mean_len") * F.col("r_stop") * F.col("r_alpha") * F.col("r_rep")
        )
        .cast("long")
        .alias("keep"),
    )


# --- CCNet-style bigram-LM fluency filter -----------------------------------

# Integer probability scale: p_scaled = pair_n * LM_SCALE DIV ctx_n. The
# product must stay under 2^63: LM_SCALE = 1e9 supports corpus pair counts up
# to ~9.2e9 occurrences of a single bigram; for larger corpora halve the
# scale (the score keeps 9 significant digits either way).
LM_SCALE = 1_000_000_000
# Keep threshold on the mean conditional probability (the head of the CCNet
# split): documents whose tokens the corpus LM finds predictable.
LM_KEEP_MIN_FLUENCY = 0.02


@register(
    "lm_fluency_score",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS ctx,
         unnest(list_transform(range(1, len(toks)), i -> toks[i + 1])) AS nxt
  FROM t
),
pc AS (
  SELECT ctx, nxt, count(*) AS pair_n FROM bg GROUP BY ctx, nxt
),
cc AS (
  SELECT ctx, sum(pair_n) AS ctx_n FROM pc GROUP BY ctx
),
scored AS (
  SELECT bg.doc_id,
         CAST(pc.pair_n * {LM_SCALE} AS BIGINT) // CAST(cc.ctx_n AS BIGINT) AS p_scaled
  FROM bg JOIN pc ON bg.ctx = pc.ctx AND bg.nxt = pc.nxt
          JOIN cc ON bg.ctx = cc.ctx
),
d AS (
  SELECT doc_id, count(*) AS n_bigrams, sum(p_scaled) AS mass FROM scored GROUP BY doc_id
)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams, CAST(mass AS BIGINT) AS mass,
       CAST(mass AS DOUBLE) / (CAST(n_bigrams AS DOUBLE) * {LM_SCALE}.0) AS fluency,
       CAST(CASE WHEN CAST(mass AS DOUBLE) / (CAST(n_bigrams AS DOUBLE) * {LM_SCALE}.0)
                      >= {LM_KEEP_MIN_FLUENCY} THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM d
""",
)
def lm_fluency_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM fluency filter (Wenzek et al. 2020 use a KenLM
    perplexity split; the statistic here is the mean bigram conditional
    probability under the corpus's own LM — same ranking intent, computable
    without libm): every adjacent pair scores P(next|ctx) from the
    ``text_bigram_lm`` counts, a document's fluency is the mean.

    Bit-exactness: the geometric mean behind true perplexity needs log();
    instead each probability becomes the exact BIGINT
    ``pair_n * {LM_SCALE} DIV ctx_n`` (integer floor division — identical
    in both engines), per-document mass is an exact BIGINT sum, and the
    single closing division yields the double. No float fold anywhere.

    Scale: one explode -> pair-keyed count with map-side partials (the
    same vocabulary-bounded shape as ``text_bigram_lm``) -> join the
    bigram stream back to the two count dims (broadcast while the
    vocabulary fits; keyed shuffle with AQE skew-split beyond that —
    Zipf-head contexts are the textbook skew case) -> one doc-keyed
    aggregate. Never materializes more than vocabulary² count rows."""
    toks = F.split("text", " ")
    t = (
        _docs(spark, sf_dir)
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
    )
    bg = t.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.element_at("toks", i).alias("ctx"),
                    F.element_at("toks", i + 1).alias("nxt"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.ctx", "p.nxt")
    pc = bg.groupBy("ctx", "nxt").agg(F.count(F.lit(1)).alias("pair_n"))
    cc = pc.groupBy("ctx").agg(F.sum("pair_n").alias("ctx_n"))
    # No broadcast hints on pc/cc: both grow with the VOCABULARY (bigram
    # types / contexts), and the repo discipline is that AQE keeps strategy
    # authority over any side that grows with the data — it broadcasts them
    # while they fit and switches to a keyed shuffle join (with skew split
    # for Zipf-head contexts) beyond that.
    scored = (
        bg.join(pc, ["ctx", "nxt"])
        .join(cc, "ctx")
        .select(
            "doc_id",
            # Spark's `/` on longs is float division; integer floor-div DIV
            # matches DuckDB's `//` exactly for these positive operands.
            F.expr(f"CAST(pair_n * {LM_SCALE} AS BIGINT) DIV CAST(ctx_n AS BIGINT)").alias(
                "p_scaled"
            ),
        )
    )
    d = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("p_scaled").alias("mass")
    )
    fluency = F.col("mass").cast("double") / (
        F.col("n_bigrams").cast("double") * F.lit(float(LM_SCALE))
    )
    return d.select(
        "doc_id",
        "n_bigrams",
        F.col("mass").cast("long").alias("mass"),
        fluency.alias("fluency"),
        (fluency >= LM_KEEP_MIN_FLUENCY).cast("long").alias("keep"),
    )


# --- DSIR hashed-bigram importance resampling --------------------------------

DSIR_BUCKETS = 4096       # hashed feature space (the DSIR paper uses 10^4)
DSIR_TARGET_LANG = "en"   # target domain: the English slice of the corpus
DSIR_SALT = "dsir"        # decorrelates the keep coin from other h60 samplers
DSIR_PPM = 1_000_000


@register(
    "dsir_importance_resample",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
pairs AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS pair
  FROM t
),
b AS (
  SELECT doc_id, lang, {h60_sql("pair")} % {DSIR_BUCKETS} AS bucket FROM pairs
),
stats AS (
  SELECT bucket, count(*) AS raw_n,
         sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS tgt_n
  FROM b GROUP BY bucket
),
d AS (
  SELECT b.doc_id, count(*) AS n_bigrams,
         sum(s.tgt_n) AS tgt_mass, sum(s.raw_n) AS raw_mass
  FROM b JOIN stats s USING (bucket) GROUP BY b.doc_id
),
w AS (
  SELECT *, CAST(tgt_mass AS DOUBLE) / CAST(raw_mass AS DOUBLE) AS weight FROM d
),
mx AS (SELECT max(weight) AS wmax FROM w)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(tgt_mass AS BIGINT) AS tgt_mass, CAST(raw_mass AS BIGINT) AS raw_mass,
       weight,
       CAST(CASE WHEN CAST({h60_sql(f"'{DSIR_SALT}' || CAST(doc_id AS VARCHAR)")} % {DSIR_PPM} AS DOUBLE) * wmax
                      < {DSIR_PPM}.0 * weight THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM w, mx
""",
)
def dsir_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al., NeurIPS 2023): importance-weight
    every raw document toward a target domain using hashed-bigram feature
    counts, then resample with probability proportional to the weight.
    Target here is the corpus's ``{DSIR_TARGET_LANG}`` slice — "select raw
    data that looks like the target" as one corpus pass.

    The paper's weight is a product of per-feature probability ratios
    (needs log-space); the cross-engine-exact surrogate keeps the same
    ordering intent: per document, ``tgt_mass / raw_mass`` where each mass
    is the exact BIGINT sum over the document's bigram instances of the
    corpus-wide (target, all) bucket counts. One division per doc; the
    keep coin is the h60-salted uniform against the max-normalized weight,
    compared by cross-multiplication of identically-computed doubles.

    Scale: bucket stats are a {DSIR_BUCKETS}-row aggregate (map-side
    combinable, broadcast back — the dim never grows with the corpus);
    per-doc masses are one doc-keyed aggregate. The whole selection is two
    passes over the bigram stream and O({DSIR_BUCKETS}) driver-free state,
    exactly the property that makes DSIR viable at 100 TB."""
    toks = F.split("text", " ")
    t = (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
    )
    b = t.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.concat(
                    F.element_at("toks", i), F.lit(" "), F.element_at("toks", i + 1)
                ),
            )
        ).alias("pair"),
    ).select("doc_id", "lang", (h60(F.col("pair")) % DSIR_BUCKETS).alias("bucket"))
    stats = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_n"),
        F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)).alias("tgt_n"),
    )
    d = (
        b.join(F.broadcast(stats), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("tgt_n").alias("tgt_mass"),
            F.sum("raw_n").alias("raw_mass"),
        )
    )
    w = d.select(
        "*", (F.col("tgt_mass").cast("double") / F.col("raw_mass").cast("double")).alias("weight")
    )
    mx = w.agg(F.max("weight").alias("wmax"))
    coin = (
        h60(F.concat(F.lit(DSIR_SALT), F.col("doc_id").cast("string"))) % DSIR_PPM
    ).cast("double")
    return w.crossJoin(F.broadcast(mx)).select(
        "doc_id",
        "n_bigrams",
        F.col("tgt_mass").cast("long").alias("tgt_mass"),
        F.col("raw_mass").cast("long").alias("raw_mass"),
        "weight",
        (coin * F.col("wmax") < F.lit(float(DSIR_PPM)) * F.col("weight"))
        .cast("long")
        .alias("kept"),
    )


# --- deterministic training-order shuffle -------------------------------------

SHUFFLE_SALT = "epoch0"  # one salt per epoch — changing it reshuffles everything
SHUFFLE_SHARDS = 32      # trainer-visible shard count (shard files read in order)


@register(
    "training_order_shuffle",
    oracle=f"""
WITH k AS (
  SELECT doc_id,
         {h60_sql(f"'{SHUFFLE_SALT}|' || CAST(doc_id AS VARCHAR)")} AS sort_key
  FROM documents
),
s AS (
  SELECT doc_id, sort_key, sort_key % {SHUFFLE_SHARDS} AS shard,
         row_number() OVER (PARTITION BY sort_key % {SHUFFLE_SHARDS}
                            ORDER BY sort_key, doc_id) AS pos_in_shard
  FROM k
),
off AS (
  SELECT shard,
         sum(cnt) OVER (ORDER BY shard ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS off
  FROM (SELECT shard, count(*) AS cnt FROM s GROUP BY shard)
)
SELECT s.doc_id, CAST(s.sort_key AS BIGINT) AS sort_key,
       CAST(s.shard AS BIGINT) AS shard,
       CAST(s.pos_in_shard AS BIGINT) AS pos_in_shard,
       CAST(COALESCE(off.off, 0) + s.pos_in_shard AS BIGINT) AS global_pos
FROM s JOIN off USING (shard)
""",
)
def training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: the training-order artifact. Every
    document gets an h60 sort key (salted by epoch — a new salt is a fresh
    shuffle, reproducible across runs/retries/engines), a shard, a position
    within its shard, and the exact global position.

    Scale: the naive global ``row_number() OVER (ORDER BY key)`` collapses
    to ONE task at 100 TB; this plan never builds a global window. Position
    comes from per-SHARD windows (each shard is an independent partition of
    the key space — {SHUFFLE_SHARDS} here, thousands in production), and
    global_pos is reconstructed exactly from the {SHUFFLE_SHARDS}-row
    cumulative shard-offset table joined back by broadcast. h60 keys are
    uniform, so shards are balanced by construction — no skew handling
    needed. A trainer consumes shard files in (shard, pos_in_shard) order
    and sees precisely the global_pos order."""
    docs = _docs(spark, sf_dir)
    k = docs.select(
        "doc_id",
        h60(F.concat(F.lit(SHUFFLE_SALT + "|"), F.col("doc_id").cast("string"))).alias(
            "sort_key"
        ),
    )
    s = k.select(
        "doc_id",
        "sort_key",
        (F.col("sort_key") % SHUFFLE_SHARDS).alias("shard"),
    ).select(
        "*",
        F.row_number()
        .over(Window.partitionBy("shard").orderBy("sort_key", "doc_id"))
        .cast("long")
        .alias("pos_in_shard"),
    )
    counts = s.groupBy("shard").agg(F.count(F.lit(1)).alias("cnt"))
    off = counts.select(
        "shard",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("off"),
    )
    return s.join(F.broadcast(off), "shard").select(
        "doc_id",
        "sort_key",
        F.col("shard").cast("long").alias("shard"),
        "pos_in_shard",
        (F.col("off") + F.col("pos_in_shard")).cast("long").alias("global_pos"),
    )


# --- token-budget shard assembly over the epoch order -------------------------

SHARD_TOKENS = 2048  # data-loader shard size in tokens (fixed token budget)


@register(
    "token_shard_assembly",
    oracle=f"""
WITH k AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         {h60_sql(f"'{SHUFFLE_SALT}|' || CAST(doc_id AS VARCHAR)")} AS sort_key
  FROM documents
),
s AS (
  SELECT doc_id, n_tokens, sort_key, sort_key % {SHUFFLE_SHARDS} AS shard,
         COALESCE(sum(n_tokens) OVER (PARTITION BY sort_key % {SHUFFLE_SHARDS}
                                      ORDER BY sort_key, doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS tok_before_in_shard
  FROM k
),
off AS (
  SELECT shard,
         COALESCE(sum(tok) OVER (ORDER BY shard
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS tok_off
  FROM (SELECT shard, sum(n_tokens) AS tok FROM s GROUP BY shard)
)
SELECT s.doc_id, s.n_tokens,
       CAST(s.shard AS BIGINT) AS shard,
       CAST(off.tok_off + s.tok_before_in_shard AS BIGINT) AS tok_before,
       CAST((off.tok_off + s.tok_before_in_shard) // {SHARD_TOKENS} AS BIGINT) AS data_shard
FROM s JOIN off USING (shard)
""",
)
def token_shard_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard assembly: cut the epoch-shuffled corpus (the
    ``training_order_shuffle`` order) into contiguous data-loader shards of
    {SHARD_TOKENS} tokens by GLOBAL token offset — each document lands in
    ``data_shard = floor(tokens_before_it / {SHARD_TOKENS})``. This is the
    fixed-token sharding a trainer's data loader consumes (shards straddle
    document boundaries by at most one document; ``sequence_packing`` is
    the intra-sequence variant of the same problem).

    The global token prefix sum never builds a global window: within each
    shuffle shard a per-SHARD window cumsum runs in parallel, and the
    {SHUFFLE_SHARDS}-row per-shard token-total table (cumulated into
    offsets, broadcast back) lifts it to the exact global offset — the
    textbook two-level distributed prefix sum. All BIGINT arithmetic;
    the shard cut is one integer floor division."""
    toks = F.split("text", " ")
    k = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        h60(F.concat(F.lit(SHUFFLE_SALT + "|"), F.col("doc_id").cast("string"))).alias(
            "sort_key"
        ),
    ).select("*", (F.col("sort_key") % SHUFFLE_SHARDS).alias("shard"))
    in_shard = Window.partitionBy("shard").orderBy("sort_key", "doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    s = k.select(
        "doc_id",
        "n_tokens",
        "sort_key",
        "shard",
        F.coalesce(F.sum("n_tokens").over(in_shard), F.lit(0)).alias("tok_before_in_shard"),
    )
    totals = s.groupBy("shard").agg(F.sum("n_tokens").alias("tok"))
    off = totals.select(
        "shard",
        F.coalesce(
            F.sum("tok").over(
                Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("tok_off"),
    )
    tok_before = F.col("tok_off") + F.col("tok_before_in_shard")
    return s.join(F.broadcast(off), "shard").select(
        "doc_id",
        "n_tokens",
        F.col("shard").cast("long").alias("shard"),
        tok_before.cast("long").alias("tok_before"),
        F.expr(f"CAST(tok_off + tok_before_in_shard AS BIGINT) DIV {SHARD_TOKENS}").alias(
            "data_shard"
        ),
    )


# --- k-anonymity / l-diversity privacy audit -------------------------------------

K_ANON_K = 5  # classes smaller than this re-identify their members
K_ANON_LEN_BUCKET = 100  # n_chars generalized to 100-char buckets
# sensitive attribute for l-diversity: the language — a class where every
# member shares one lang value leaks it even when the class is k-large
L_DIVERSITY_L = 2


@register(
    "k_anonymity_report",
    oracle=f"""
WITH qi AS (
  SELECT source, CAST(n_chars // {K_ANON_LEN_BUCKET} AS BIGINT) AS len_bucket,
         lang, doc_id
  FROM documents
)
SELECT source, len_bucket,
       count(*) AS class_size,
       count(DISTINCT lang) AS n_langs,
       count(*) < {K_ANON_K} AS below_k,
       count(DISTINCT lang) < {L_DIVERSITY_L} AS below_l,
       min(doc_id) AS sample_doc_id
FROM qi
GROUP BY source, len_bucket
""",
)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the document metadata — the
    privacy screen a pipeline runs before publishing per-document metadata:
    quasi-identifiers (source, 100-char length bucket) partition the corpus
    into equivalence classes; a class with fewer than {K_ANON_K} members
    re-identifies its documents (below_k), and a k-large class whose
    sensitive attribute (lang) takes fewer than {L_DIVERSITY_L} distinct
    values still discloses it (below_l — Machanavajjhala et al.'s
    l-diversity refinement). The fix for a flagged class is coarser
    generalization (wider buckets) or suppression; the report is the input
    to that decision.

    Scale shape: ONE aggregate over the metadata columns with map-side
    combine (count-distinct over a low-cardinality sensitive attribute —
    Spark's HLL-free exact distinct stays bounded because lang has a few
    dozen values); no joins, no windows, no floats. Class count is bounded
    by |sources| x |length buckets|, metadata-sized at any corpus scale."""
    return (
        _docs(spark, sf_dir)
        .select(
            "source",
            F.expr(f"CAST(n_chars DIV {K_ANON_LEN_BUCKET} AS BIGINT)").alias(
                "len_bucket"
            ),
            "lang",
            "doc_id",
        )
        .groupBy("source", "len_bucket")
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("sample_doc_id"),
        )
        .select(
            "source",
            "len_bucket",
            "class_size",
            "n_langs",
            (F.col("class_size") < K_ANON_K).alias("below_k"),
            (F.col("n_langs") < L_DIVERSITY_L).alias("below_l"),
            "sample_doc_id",
        )
    )


# --- epoch-shuffle independence audit -------------------------------------------

EPOCH_SALT_A = "epoch0"  # == SHUFFLE_SALT: the order training_order_shuffle emits
EPOCH_SALT_B = "epoch1"  # next epoch's salt


def _epoch_rank_sql(salt: str, alias: str) -> str:
    """Global rank of each doc under one epoch salt — sharded exactly like
    training_order_shuffle (per-shard window + offset table), restated for
    the oracle as the equivalent single row_number (DuckDB has no 1-task
    trap to avoid)."""
    return f"""
{alias} AS (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY {h60_sql(f"'{salt}|' || CAST(doc_id AS VARCHAR)")}, doc_id
         ) AS r
  FROM documents
)"""


@register(
    "epoch_shuffle_independence",
    oracle=f"""
WITH {_epoch_rank_sql(EPOCH_SALT_A, "ra")},
{_epoch_rank_sql(EPOCH_SALT_B, "rb")},
j AS (
  SELECT ra.doc_id, ra.r AS r1, rb.r AS r2 FROM ra JOIN rb USING (doc_id)
),
adj AS (
  SELECT count(*) AS preserved
  FROM j a JOIN j b ON b.r1 = a.r1 + 1
  WHERE abs(b.r2 - a.r2) = 1
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_sq_rank_diff,
       1.0 - (6.0 * CAST(sum((r1 - r2) * (r1 - r2)) AS DOUBLE))
           / (CAST(count(*) AS DOUBLE) * (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE) - 1.0))
         AS spearman_rho,
       (SELECT CAST(preserved AS BIGINT) FROM adj) AS adjacent_pairs_preserved
FROM j
""",
)
def epoch_shuffle_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducibility AUDIT of the epoch shuffle: are two epochs' training
    orders actually independent permutations? Compares epoch0's global
    order (the exact order training_order_shuffle emits) against epoch1's:
    Spearman's rho over the two rank assignments (integer sum of squared
    rank differences — rho ~ 0 is the pass condition; rho near 1 would mean
    the salt does not actually reshuffle) and the count of adjacent pairs
    preserved between epochs (catches block-level correlation rho misses —
    expected ~2 by chance at any n). A curriculum or dedup change that
    accidentally couples epoch orders shows up here before it shows up as a
    training-dynamics mystery.

    Scale shape: ranks are computed the training_order_shuffle way —
    per-shard windows over the uniform h60 key space plus a broadcast
    {SHUFFLE_SHARDS}-row offset table, never a global window (the oracle
    restates the same rank as one row_number; DuckDB has no 1-task trap).
    The adjacency check joins on the unique rank r1+1 — one keyed shuffle.
    The rho division is a single float expression over BIGINT-exact sums
    (exact in a double up to n ~ 2M; past that the documented swap is the
    same formula in DECIMAL)."""

    # Range shards (key DIV width), NOT hash shards (key % n): concatenating
    # per-shard ranks in shard order reproduces the GLOBAL key order only
    # when shards are key-contiguous; a modulo shard interleaves keys and
    # the concatenation would be a different permutation than the oracle's
    # single row_number. h60 keys are uniform, so range shards stay
    # balanced without any skew handling.
    def epoch_rank_range(salt: str, out: str) -> DataFrame:
        width = (1 << 60) // SHUFFLE_SHARDS
        k = _docs(spark, sf_dir).select(
            "doc_id",
            h60(F.concat(F.lit(salt + "|"), F.col("doc_id").cast("string"))).alias(
                "key"
            ),
        )
        s = k.select(
            "doc_id", "key", F.expr(f"CAST(key DIV {width} AS BIGINT)").alias("shard")
        ).select(
            "*",
            F.row_number()
            .over(Window.partitionBy("shard").orderBy("key", "doc_id"))
            .cast("long")
            .alias("pos"),
        )
        counts = s.groupBy("shard").agg(F.count(F.lit(1)).alias("cnt"))
        off = counts.select(
            "shard",
            F.coalesce(
                F.sum("cnt").over(
                    Window.orderBy("shard").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("off"),
        )
        return s.join(F.broadcast(off), "shard").select(
            "doc_id", (F.col("off") + F.col("pos")).cast("long").alias(out)
        )

    r1 = epoch_rank_range(EPOCH_SALT_A, "r1")
    r2 = epoch_rank_range(EPOCH_SALT_B, "r2")
    # cached: j feeds the rho aggregate AND both sides of the adjacency
    # self-join — uncached it executed its two shard-window rank plans
    # three times over (the registry's deepest remaining plan, 34 physical
    # exchanges, after the r10 audit started counting honestly)
    j = track_persist(r1.join(r2, "doc_id"))
    a = j.select(F.col("r1").alias("ar1"), F.col("r2").alias("ar2"))
    b = j.select(F.col("r1").alias("br1"), F.col("r2").alias("br2"))
    adj = (
        a.join(b, F.col("br1") == F.col("ar1") + 1)
        .filter(F.abs(F.col("br2") - F.col("ar2")) == 1)
        .agg(F.count(F.lit(1)).alias("adjacent_pairs_preserved"))
    )
    d2 = (F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2"))
    stats = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d2).alias("sum_sq_rank_diff"),
    )
    nd = F.col("n").cast("double")
    return stats.crossJoin(F.broadcast(adj)).select(
        "n",
        "sum_sq_rank_diff",
        (
            F.lit(1.0)
            - (F.lit(6.0) * F.col("sum_sq_rank_diff").cast("double"))
            / (nd * (nd * nd - F.lit(1.0)))
        ).alias("spearman_rho"),
        "adjacent_pairs_preserved",
    )
