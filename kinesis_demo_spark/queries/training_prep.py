"""Training-set preparation operators — the steps between "deduplicated
corpus" and "batches on the trainer": deterministic stratified sampling,
fixed-budget sequence packing, and int8 embedding quantization (SURVEY.md §7
Phase 5 north star, beyond the reference surface).

Determinism policy: sampling uses the cross-engine h60 content hash (never
``rand()``), packing is a pure function of (shard, doc order, token counts),
and quantization uses ``floor(x + 0.5)`` instead of ``round`` so both engines
share one rounding rule by construction — every operator here is value-hash
checkable.

Scale:
- sampling: per-row hash + compare, zero shuffles, any corpus size.
- packing: docs hash-shard into ``PACK_SHARDS`` independent groups; each
  group packs greedily in one Arrow batch stream. At 100 TB you raise
  PACK_SHARDS so each shard's docs fit an executor — the standard
  distributed-packing layout (bins never span shards, so shards never
  coordinate).
- quantization: per-row array fold + transform, zero shuffles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions.hashing import h60, h60_sql
from ..io import load_table, spread
from ..registry import register

# --- deterministic stratified sampling ---------------------------------------------

# per-stratum keep rates in percent (keys are the fixture's lang values);
# unlisted strata fall back to DEFAULT_RATE_PCT
SAMPLE_RATES_PCT: dict[str, int] = {"en": 50, "de": 25}
DEFAULT_RATE_PCT = 10


def _rate_case_sql() -> str:
    cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_RATES_PCT.items())
    return f"CASE lang {cases} ELSE {DEFAULT_RATE_PCT} END"


@register(
    "sample_stratified_documents",
    oracle=f"""
SELECT doc_id, lang, source
FROM documents
WHERE {h60_sql("CAST(doc_id AS VARCHAR)")} % 100 < {_rate_case_sql()}
""",
)
def sample_stratified_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-language rates — the corpus-mixing
    step of a training-data pipeline (e.g. keep 50% of English, 25% of
    German, 10% of the tail). The keep decision is ``h60(doc_id) % 100 <
    rate``: a pure function of the row, so the sample is reproducible across
    runs/engines/retries (``rand()`` sampling is none of those), it needs no
    shuffle, and rates can be audited after the fact. Filter + per-row hash
    only — embarrassingly parallel."""
    rate = F.lit(DEFAULT_RATE_PCT)
    for k, v in reversed(SAMPLE_RATES_PCT.items()):
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    keep = (h60(F.col("doc_id").cast("string")) % 100) < rate
    return (
        spread(load_table(spark, sf_dir, "documents"))
        .filter(keep)
        .select("doc_id", "lang", "source")
    )


# --- fixed-budget sequence packing ----------------------------------------------------

PACK_BUDGET_TOKENS = 512
PACK_SHARDS = 4

_PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("shard", T.LongType(), False),
        T.StructField("bin", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
    ]
)


def _pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy first-fit-in-order packing of one shard: docs in doc_id order
    accumulate into the current bin until adding one would exceed the
    budget, which opens the next bin. A single doc over budget still gets
    its own bin (it must go somewhere; the trainer truncates)."""
    pdf = pdf.sort_values("doc_id")
    bins, bin_id, bin_toks = [], 0, 0
    for toks in pdf["n_tokens"]:
        if bin_toks and bin_toks + toks > PACK_BUDGET_TOKENS:
            bin_id, bin_toks = bin_id + 1, 0
        bin_toks += toks
        bins.append(bin_id)
    pdf["bin"] = pd.Series(bins, index=pdf.index, dtype="int64")
    return pdf[["doc_id", "shard", "bin", "n_tokens"]]


@register(
    "sequence_packing",
    oracle=f"""
WITH RECURSIVE d AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         row_number() OVER (PARTITION BY doc_id % {PACK_SHARDS} ORDER BY doc_id) AS rn
  FROM documents WHERE text IS NOT NULL
),
packed(shard, rn, doc_id, n_tokens, bin, bin_toks) AS (
  SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
         CASE WHEN p.bin_toks + d.n_tokens > {PACK_BUDGET_TOKENS}
              THEN p.bin + 1 ELSE p.bin END,
         CASE WHEN p.bin_toks + d.n_tokens > {PACK_BUDGET_TOKENS}
              THEN d.n_tokens ELSE p.bin_toks + d.n_tokens END
  FROM packed p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1
)
SELECT doc_id, shard, bin, n_tokens FROM packed
""",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: assign documents to
    fixed-token-budget bins ({PACK_BUDGET_TOKENS} tokens), greedily in
    doc_id order within each of {PACK_SHARDS} hash shards. Packing is
    inherently sequential, so it runs as ``applyInPandas`` per shard — the
    distributed layout real packers use: shards pack independently and in
    parallel, bins never span shards. The greedy recurrence is replicated
    exactly by the oracle's recursive CTE, so even this stateful operator is
    value-hash checked."""
    # text IS NOT NULL: a NULL-text doc has no tokens to pack; leaving it
    # in poisons the packer state (NULL n_tokens) on both engines
    docs = spread(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    ).select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    return docs.groupBy("shard").applyInPandas(_pack_shard, schema=_PACK_SCHEMA)


# --- int8 embedding quantization ----------------------------------------------------------

QUANT_LEVELS = 127  # symmetric int8: q in [-127, 127]


@register(
    "embedding_quantize_int8",
    oracle=f"""
WITH scaled AS (
  SELECT vec_id,
         embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / {QUANT_LEVELS} AS scale
  FROM embeddings
)
SELECT vec_id, CAST(i AS INT) AS dim, scale,
       CAST(
         greatest(-{QUANT_LEVELS}, least({QUANT_LEVELS},
           floor(CAST(embedding[i] AS DOUBLE) / scale + 0.5)))
       AS BIGINT) AS q
FROM scaled, unnest(range(1, len(embedding) + 1)) AS t(i)
""",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/serving
    compression step for embedding tables (4x smaller, SIMD-friendly):
    scale = max|x| / {QUANT_LEVELS}, q = clamp(floor(x/scale + 0.5)).
    ``floor(x + 0.5)`` instead of round() because the engines' round()
    half-way rules differ; floor keeps them identical by construction. Pure
    per-row fold + transform + posexplode (one output row per dimension for
    the value-hash gate) — zero shuffles, linear in corpus size."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    scale = (
        F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
        / QUANT_LEVELS
    ).alias("scale")
    scaled = emb.select("vec_id", "embedding", scale)
    q = F.greatest(
        F.lit(-QUANT_LEVELS),
        F.least(
            F.lit(QUANT_LEVELS),
            F.floor(F.col("x").cast("double") / F.col("scale") + 0.5),
        ),
    ).cast("long")
    return (
        scaled.select("vec_id", "scale", F.posexplode("embedding").alias("pos", "x"))
        .select(
            "vec_id",
            (F.col("pos") + 1).cast("int").alias("dim"),
            "scale",
            q.alias("q"),
        )
    )


# --- exact k-per-group deterministic sample ------------------------------------------

RESERVOIR_K = 20


@register(
    "sample_k_per_group",
    oracle=f"""
SELECT doc_id, lang, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {h60_sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS rnk
  FROM documents
) WHERE rnk <= {RESERVOIR_K}
""",
)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-{RESERVOIR_K}-per-language sample (eval-set construction wants
    COUNT guarantees, which rate-based sampling can't give): rank each
    stratum's docs by their content hash and keep the {RESERVOIR_K} smallest
    — statistically a uniform draw (h60 is uniform), yet fully deterministic
    and engine-independent, i.e. distributed reservoir sampling without the
    RNG. One shuffle on the stratum key; at scale the rank prunes map-side
    into a per-partition top-k before the exchange."""
    w = Window.partitionBy("lang").orderBy(h60(F.col("doc_id").cast("string")), "doc_id")
    return (
        spread(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "lang", F.row_number().over(w).cast("long").alias("rnk"))
        .filter(F.col("rnk") <= RESERVOIR_K)
    )


# --- the composed end-to-end training manifest ---------------------------------------

from ..functions.vectors import dot_fold_sql  # noqa: E402
from .dedup import (  # noqa: E402
    COSINE_DUP_THRESHOLD,
    EMB_LSH_BANDS_SQL,
    JACCARD_THRESHOLD,
    QUALITY_MIN_TOKENS,
    _SHINGLE_CTES,
    dedup_embedding_cosine_lsh,
    dedup_ngram_jaccard,
)


@register(
    "pipeline_training_manifest",
    oracle=f"""
WITH RECURSIVE
{_SHINGLE_CTES},
quality AS (
  SELECT doc_id, text, lang FROM documents
  WHERE len(string_split(text, ' ')) >= {QUALITY_MIN_TOKENS}
),
exact_survivors AS (
  SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)
),
ngram_losers AS (
  SELECT DISTINCT doc_b AS doc_id FROM pairs
  WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= {JACCARD_THRESHOLD}
),
vb AS (
  SELECT vec_id, embedding,
         sqrt({dot_fold_sql('embedding', 'embedding')}) AS nrm
  FROM embeddings
),
emb_bands AS ({EMB_LSH_BANDS_SQL}),
emb_losers AS (
  SELECT DISTINCT b.vec_id AS doc_id
  FROM emb_bands a JOIN emb_bands b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE {dot_fold_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= {COSINE_DUP_THRESHOLD}
),
survivors AS (
  SELECT s.doc_id FROM exact_survivors s
  WHERE NOT EXISTS (SELECT 1 FROM ngram_losers l WHERE l.doc_id = s.doc_id)
    AND NOT EXISTS (SELECT 1 FROM emb_losers e WHERE e.doc_id = s.doc_id)
),
sampled AS (
  SELECT d.doc_id, CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
  FROM documents d JOIN survivors USING (doc_id)
  WHERE {h60_sql("CAST(d.doc_id AS VARCHAR)")} % 100 < {_rate_case_sql().replace("lang", "d.lang")}
),
d2 AS MATERIALIZED (
  -- MATERIALIZED is load-bearing (the _bpe_round_ctes lesson): the
  -- recursive packed CTE references d2 once per iteration, and without
  -- the hint DuckDB re-inlines d2 — and the ENTIRE dedup pipeline above
  -- it — every round (measured 8.9 s -> 0.3 s at sf0.01, ~990 s ->
  -- seconds at sf0.1). Result set is identical.
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard, n_tokens,
         row_number() OVER (PARTITION BY doc_id % {PACK_SHARDS} ORDER BY doc_id) AS rn
  FROM sampled
),
packed(shard, rn, doc_id, n_tokens, bin, bin_toks) AS (
  SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
  FROM d2 WHERE rn = 1
  UNION ALL
  SELECT d2.shard, d2.rn, d2.doc_id, d2.n_tokens,
         CASE WHEN p.bin_toks + d2.n_tokens > {PACK_BUDGET_TOKENS}
              THEN p.bin + 1 ELSE p.bin END,
         CASE WHEN p.bin_toks + d2.n_tokens > {PACK_BUDGET_TOKENS}
              THEN d2.n_tokens ELSE p.bin_toks + d2.n_tokens END
  FROM packed p JOIN d2 ON d2.shard = p.shard AND d2.rn = p.rn + 1
)
SELECT doc_id, shard, bin, n_tokens FROM packed
""",
)
def pipeline_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE training-data pipeline as one Catalyst DAG — the engine's
    integration flagship: quality gate -> exact dedup -> text near-dup
    removal (inverted-index Jaccard) -> embedding near-dup removal
    (sign-bucket LSH + exact cosine) -> stratified hash sampling -> greedy
    per-shard sequence packing. Returns the trainer-ready manifest
    (doc_id, shard, bin, n_tokens). Every stage is a DataFrame transform, so
    nothing materializes between stages except the documented signature
    caches; the anti joins stay keyed (planner free to pick strategy), the
    sample is a pushed filter, and only the final packing crosses into
    Python — one Arrow batch per shard."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    quality = docs.filter(F.size(F.split("text", " ")) >= QUALITY_MIN_TOKENS)
    exact_survivors = quality.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    ngram_losers = dedup_ngram_jaccard(spark, sf_dir).select(F.col("doc_b").alias("doc_id")).distinct()
    emb_losers = (
        dedup_embedding_cosine_lsh(spark, sf_dir).select(F.col("vec_b").alias("doc_id")).distinct()
    )
    survivors = (
        exact_survivors.select("doc_id")
        .join(ngram_losers, "doc_id", "left_anti")
        .join(emb_losers, "doc_id", "left_anti")
    )
    rate = F.lit(DEFAULT_RATE_PCT)
    for k, v in reversed(SAMPLE_RATES_PCT.items()):
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    sampled = (
        survivors.join(docs.select("doc_id", "lang", "text"), "doc_id")
        .filter((h60(F.col("doc_id").cast("string")) % 100) < rate)
        .select(
            "doc_id",
            (F.col("doc_id") % PACK_SHARDS).alias("shard"),
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
    )
    return sampled.groupBy("shard").applyInPandas(_pack_shard, schema=_PACK_SCHEMA)


# --- Deterministic train/val/test split --------------------------------------------

SPLIT_SALT = "split1|"
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10  # val = [80, 90), test = [90, 100)


@register(
    "split_train_val_test",
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, source,
         {h60_sql(f"'{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
  FROM documents
),
labeled AS (
  SELECT doc_id, source,
         CASE WHEN bucket < {SPLIT_TRAIN_PCT} THEN 'train'
              WHEN bucket < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM assigned
)
SELECT source, split, count(*) AS n_docs,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM labeled
GROUP BY source, split
""",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {SPLIT_TRAIN_PCT}/{SPLIT_VAL_PCT}/{100 - SPLIT_TRAIN_PCT - SPLIT_VAL_PCT}
    train/val/test assignment: split = salted content-hash bucket of the
    document id — the property that matters is STABILITY (a document's
    split never changes across runs, re-shards, retries, or corpus
    growth-by-append), which rand()-based splitters violate and
    hash-bucketing guarantees; the salt isolates this split from every
    other h60 sampler in the pipeline (distinct salt = independent coin).
    Reported at (source, split) grain so stratification skew is visible.

    Scale: one per-row hash + one small aggregate; the assignment itself
    composes as a pushed filter (split = 'train') into any downstream
    reader, exactly like the stratified sampler."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = h60(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))) % 100
    labeled = docs.select(
        "doc_id",
        "source",
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )
    return labeled.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


# --- packing-efficiency comparison: greedy in-order vs best-fit-decreasing ----------


def _pack_shard_bfd(pdf: pd.DataFrame) -> pd.DataFrame:
    """Best-fit-decreasing packing of one shard: docs sorted by
    (n_tokens desc, doc_id), each placed into the fullest open bin it
    still fits; none fits -> open a new bin. Deterministic: ties in
    residual capacity resolve to the lowest bin id. Oversized docs get
    their own bin, like the greedy packer."""
    pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
    bins: list[int] = []  # remaining capacity per bin
    assign = []
    for toks in pdf["n_tokens"]:
        best, best_left = -1, None
        for b, left in enumerate(bins):
            if toks <= left and (best_left is None or left < best_left):
                best, best_left = b, left
        if best < 0:
            bins.append(max(0, PACK_BUDGET_TOKENS - toks))
            assign.append(len(bins) - 1)
        else:
            bins[best] -= toks
            assign.append(best)
    pdf["bin"] = pd.Series(assign, index=pdf.index, dtype="int64")
    return pdf[["doc_id", "shard", "bin", "n_tokens"]]


@register(
    "packing_efficiency_report",
    # Both packers ARE SQL-expressible after all (VERDICT r9 #3, upgraded
    # from rows-only): the greedy half reuses sequence_packing's recursive
    # CTE; the BFD half carries the open-bin residual list as recursive
    # LIST state — best-fit = list_min over residual*1e6+index encodings
    # (smallest residual, ties to the lowest bin id, exactly the Python
    # loop's strict-< keep-first rule), new bin = append. All-integer state
    # -> bit-exact.
    oracle=f"""
WITH RECURSIVE d AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         row_number() OVER (PARTITION BY doc_id % {PACK_SHARDS}
                            ORDER BY doc_id) AS rn,
         row_number() OVER (PARTITION BY doc_id % {PACK_SHARDS}
                            ORDER BY len(string_split(text, ' ')) DESC, doc_id) AS rnd
  FROM documents WHERE text IS NOT NULL
),
packed(shard, rn, doc_id, n_tokens, bin, bin_toks) AS (
  SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
         CASE WHEN p.bin_toks + d.n_tokens > {PACK_BUDGET_TOKENS}
              THEN p.bin + 1 ELSE p.bin END,
         CASE WHEN p.bin_toks + d.n_tokens > {PACK_BUDGET_TOKENS}
              THEN d.n_tokens ELSE p.bin_toks + d.n_tokens END
  FROM packed p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1
),
bfd(shard, rnd, doc_id, n_tokens, bin, residuals) AS (
  SELECT shard, rnd, doc_id, n_tokens, CAST(0 AS BIGINT),
         [greatest(CAST(0 AS BIGINT), CAST({PACK_BUDGET_TOKENS} AS BIGINT) - n_tokens)]
  FROM d WHERE rnd = 1
  UNION ALL
  SELECT shard, rnd, doc_id, n_tokens,
         CASE WHEN best IS NULL THEN nbins ELSE best % 1000000 - 1 END,
         CASE WHEN best IS NULL
              THEN list_append(residuals,
                   greatest(CAST(0 AS BIGINT),
                            CAST({PACK_BUDGET_TOKENS} AS BIGINT) - n_tokens))
              ELSE list_transform(residuals,
                   (x, i) -> CASE WHEN i = best % 1000000 THEN x - n_tokens ELSE x END)
         END
  FROM (
    SELECT d.shard, d.rnd, d.doc_id, d.n_tokens, p.residuals,
           CAST(len(p.residuals) AS BIGINT) AS nbins,
           list_min(list_filter(
             list_transform(p.residuals, (x, i) -> x * 1000000 + i),
             e -> e // 1000000 >= d.n_tokens)) AS best
    FROM bfd p JOIN d ON d.shard = p.shard AND d.rnd = p.rnd + 1
  )
)
SELECT shard, 'greedy_inorder' AS algorithm,
       CAST(count(DISTINCT bin) AS BIGINT) AS bins_used,
       CAST(sum(n_tokens) AS BIGINT) AS token_sum,
       CAST(sum(n_tokens) AS DOUBLE)
         / CAST(count(DISTINCT bin) * {PACK_BUDGET_TOKENS} AS DOUBLE) AS utilization
FROM packed GROUP BY shard
UNION ALL
SELECT shard, 'best_fit_decreasing' AS algorithm,
       CAST(count(DISTINCT bin) AS BIGINT) AS bins_used,
       CAST(sum(n_tokens) AS BIGINT) AS token_sum,
       CAST(sum(n_tokens) AS DOUBLE)
         / CAST(count(DISTINCT bin) * {PACK_BUDGET_TOKENS} AS DOUBLE) AS utilization
FROM bfd GROUP BY shard
""",
)
def packing_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-algorithm comparison per shard: bins used and token
    utilization for the shipped greedy in-order packer vs best-fit-
    decreasing — the measurement that tells a training pipeline whether
    the cheaper streaming-friendly greedy is leaving padding tokens on
    the table (BFD is the classical near-optimal offline baseline,
    guaranteed <= 11/9 OPT + 1 bins). Utilization = token_sum /
    (bins * budget), one exact-integer ratio per (shard, algorithm).
    Value-hash checked since r10: the oracle replays BOTH packers — the
    greedy recurrence as in sequence_packing, and BFD as a recursive CTE
    whose state is the open-bin residual LIST (argmin-fit by integer
    encoding, ties to the lowest bin id) — so even the stateful
    comparison row is bit-exact across engines.

    Scale: both packers run as the same per-shard applyInPandas the
    shipped operator uses; the report is a per-shard aggregate of the two
    assignments — algorithm choice changes Python-side work only, never
    the distribution shape."""
    # text IS NOT NULL: a NULL-text doc has no tokens to pack; leaving it
    # in poisons the packer state (NULL n_tokens) on both engines
    docs = spread(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    ).select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    greedy = docs.groupBy("shard").applyInPandas(_pack_shard, schema=_PACK_SCHEMA)
    bfd = docs.groupBy("shard").applyInPandas(_pack_shard_bfd, schema=_PACK_SCHEMA)

    def report(df: DataFrame, algo: str) -> DataFrame:
        return df.groupBy("shard").agg(
            F.lit(algo).alias("algorithm"),
            F.count_distinct("bin").alias("bins_used"),
            F.sum("n_tokens").alias("token_sum"),
            (
                F.sum("n_tokens").cast("double")
                / (F.count_distinct("bin") * PACK_BUDGET_TOKENS).cast("double")
            ).alias("utilization"),
        )

    return report(greedy, "greedy_inorder").unionByName(report(bfd, "best_fit_decreasing"))


# --- priority sampling (weighted without replacement, DLT) -----------------------

PRI_SALT = "pri"
PRI_K = 50
# 2^60 as an exact double (power of two): u in [1, 2^60] maps h60 to a
# deterministic "uniform"; priority q = w / (u / 2^60) = w * 2^60 / u.
PRI_SCALE = float(1 << 60)


@register(
    "sample_priority_weighted",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS w_cents
  FROM events GROUP BY user_id
),
pri AS (
  SELECT user_id, w_cents,
         CAST(w_cents AS DOUBLE) * {PRI_SCALE!r}
           / CAST({h60_sql(f"'{PRI_SALT}' || CAST(user_id AS VARCHAR)")} + 1 AS DOUBLE) AS q
  FROM per_user
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY q DESC, user_id) AS rnk FROM pri
),
tau AS (
  SELECT COALESCE(max(CASE WHEN rnk = {PRI_K + 1} THEN q END), 0.0) AS tau FROM ranked
)
SELECT r.user_id, r.w_cents, r.q,
       CASE WHEN CAST(r.w_cents AS DOUBLE) > t.tau
            THEN CAST(r.w_cents AS DOUBLE) ELSE t.tau END AS est_weight
FROM ranked r, tau t
WHERE r.rnk <= {PRI_K}
""",
)
def sample_priority_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup): a weighted
    without-replacement sample of {PRI_K} users where each kept item
    carries the estimator weight max(w, tau) — subset sums over the sample
    estimate population subset sums near-optimally. The 'uniform' is the
    deterministic h60 coin (u = h+1 in [1, 2^60]), so the sample is
    reproducible across runs/engines/retries like every other sampler
    here; priority q = w * 2^60 / u is one multiply + one divide of
    identically-derived doubles (2^60 is an exact power-of-two double).

    Scale: the weight table is the user-keyed aggregate; top-(K+1) by
    priority is orderBy().limit = TakeOrderedAndProject (per-partition
    heaps, never a global window), and tau — the (K+1)-th priority — is a
    1-row broadcast. The 100 TB shape for 'give me a weighted sample NOW'
    without scanning twice."""
    per_user = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.sum(F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")).alias("w_cents")
    )
    q = (
        F.col("w_cents").cast("double")
        * F.lit(PRI_SCALE)
        / (h60(F.concat(F.lit(PRI_SALT), F.col("user_id").cast("string"))) + F.lit(1)).cast(
            "double"
        )
    )
    pri = per_user.select("user_id", "w_cents", q.alias("q"))
    top = pri.orderBy(F.col("q").desc(), "user_id").limit(PRI_K + 1)
    # tau = the smallest of the top-(K+1) priorities iff a (K+1)-th exists
    tau = top.agg(
        F.when(F.count(F.lit(1)) >= PRI_K + 1, F.min("q")).otherwise(F.lit(0.0)).alias("tau")
    )
    kept = pri.orderBy(F.col("q").desc(), "user_id").limit(PRI_K)
    return kept.crossJoin(F.broadcast(tau)).select(
        "user_id",
        "w_cents",
        "q",
        F.when(F.col("w_cents").cast("double") > F.col("tau"), F.col("w_cents").cast("double"))
        .otherwise(F.col("tau"))
        .alias("est_weight"),
    )


# --- GPT-style sequence formation (concat-and-chunk) ------------------------------

SEQ_LEN = 128  # training sequence length in tokens
# EOS: one separator token appended per document, so a doc contributes
# n_tokens + 1 positions to the concatenated stream.


@register(
    "concat_chunk_sequences",
    oracle=f"""
WITH k AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS stream_len,
         {h60_sql("'epoch0|' || CAST(doc_id AS VARCHAR)")} AS sort_key
  FROM documents
),
s AS (
  SELECT doc_id, stream_len, sort_key, sort_key % 32 AS shard,
         COALESCE(sum(stream_len) OVER (PARTITION BY sort_key % 32
                                        ORDER BY sort_key, doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS before_in_shard
  FROM k
),
off AS (
  SELECT shard,
         COALESCE(sum(tok) OVER (ORDER BY shard
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS tok_off
  FROM (SELECT shard, sum(stream_len) AS tok FROM s GROUP BY shard)
),
spans AS (
  SELECT s.doc_id,
         CAST(off.tok_off + s.before_in_shard AS BIGINT) AS start_tok,
         CAST(off.tok_off + s.before_in_shard + s.stream_len AS BIGINT) AS end_tok
  FROM s JOIN off USING (shard)
),
hits AS (
  SELECT doc_id, start_tok, end_tok,
         unnest(range(start_tok // {SEQ_LEN}, (end_tok - 1) // {SEQ_LEN} + 1)) AS seq_id
  FROM spans
)
SELECT CAST(seq_id AS BIGINT) AS seq_id,
       CAST(sum(CASE WHEN end_tok < (seq_id + 1) * {SEQ_LEN} THEN end_tok
                     ELSE (seq_id + 1) * {SEQ_LEN} END
                - CASE WHEN start_tok > seq_id * {SEQ_LEN} THEN start_tok
                       ELSE seq_id * {SEQ_LEN} END) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_docs_spanned,
       arg_min(doc_id, start_tok) AS first_doc,
       arg_max(doc_id, start_tok) AS last_doc
FROM hits GROUP BY seq_id
""",
)
def concat_chunk_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style pretraining sequence formation: documents stream in the
    deterministic epoch order (the ``training_order_shuffle`` order), each
    followed by one EOS token, and the concatenated token stream is cut
    into fixed {SEQ_LEN}-token training sequences. Emitted per sequence:
    token count (={SEQ_LEN} except the tail), how many documents it spans,
    and its first/last document — the map a data loader uses to
    materialize attention-masking / document-boundary info.

    The exact global token offsets come from the same two-level
    distributed prefix sum as ``token_shard_assembly`` (per-shard window
    cumsum + tiny offset table — no global window, no per-token explode:
    each doc explodes only into the sequences its span INTERSECTS, so the
    blowup is |docs| + |seqs|, not |tokens|). first/last docs are argmin /
    argmax by start offset (unique by construction)."""
    toks = F.split("text", " ")
    k = (
        spread(load_table(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            (F.size(toks) + F.lit(1)).cast("long").alias("stream_len"),
            h60(F.concat(F.lit("epoch0|"), F.col("doc_id").cast("string"))).alias("sort_key"),
        )
        .select("*", (F.col("sort_key") % 32).alias("shard"))
    )
    in_shard = Window.partitionBy("shard").orderBy("sort_key", "doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    s = k.select(
        "doc_id",
        "stream_len",
        "shard",
        F.coalesce(F.sum("stream_len").over(in_shard), F.lit(0)).alias("before_in_shard"),
    )
    off = (
        s.groupBy("shard")
        .agg(F.sum("stream_len").alias("tok"))
        .select(
            "shard",
            F.coalesce(
                F.sum("tok").over(
                    Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("tok_off"),
        )
    )
    spans = s.join(F.broadcast(off), "shard").select(
        "doc_id",
        (F.col("tok_off") + F.col("before_in_shard")).cast("long").alias("start_tok"),
        (F.col("tok_off") + F.col("before_in_shard") + F.col("stream_len"))
        .cast("long")
        .alias("end_tok"),
    )
    hits = spans.select(
        "doc_id",
        "start_tok",
        "end_tok",
        F.explode(
            F.sequence(
                F.expr(f"start_tok DIV {SEQ_LEN}"), F.expr(f"(end_tok - 1) DIV {SEQ_LEN}")
            )
        ).alias("seq_id"),
    )
    overlap = F.least(
        F.col("end_tok"), (F.col("seq_id") + 1) * SEQ_LEN
    ) - F.greatest(F.col("start_tok"), F.col("seq_id") * SEQ_LEN)
    return hits.groupBy("seq_id").agg(
        F.sum(overlap).cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_docs_spanned"),
        F.min_by("doc_id", "start_tok").alias("first_doc"),
        F.max_by("doc_id", "start_tok").alias("last_doc"),
    )


# --- T5-style span-corruption planning ---------------------------------------------

SPAN_LEN = 3        # corruption span length (tokens)
SPAN_START_MOD = 20 # ~5% of positions start a span => ~15% of tokens masked


def _span_start_sql(pos_expr: str) -> str:
    key = (
        "CAST(doc_id AS VARCHAR) || '|' || CAST(" + pos_expr + " AS VARCHAR)"
    )
    return f"({pos_expr}) >= 0 AND {h60_sql(key)} % {SPAN_START_MOD} = 0"


@register(
    "span_corruption_plan",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n,
         unnest(range(0, len(string_split(text, ' ')))) AS pos
  FROM documents
),
flags AS (
  SELECT doc_id, n, pos,
         ({_span_start_sql('pos')}) AS m0,
         ({_span_start_sql('pos - 1')}) AS m1,
         ({_span_start_sql('pos - 2')}) AS m2
  FROM toks
),
marked AS (
  SELECT doc_id, n, pos,
         (m0 OR m1 OR m2) AS masked,
         -- run start: masked here, not masked at pos-1 (pos-1 masked iff a
         -- span starts at pos-1, pos-2, or pos-3)
         ((m0 OR m1 OR m2) AND NOT (m1 OR m2 OR ({_span_start_sql('pos - 3')}))) AS run_start
  FROM flags
)
SELECT doc_id,
       any_value(n) AS n_tokens,
       count(*) FILTER (masked) AS n_masked,
       count(*) FILTER (run_start) AS n_spans,
       CAST(any_value(n) - count(*) FILTER (masked) + count(*) FILTER (run_start) AS BIGINT)
         AS input_len,
       CAST(count(*) FILTER (masked) + count(*) FILTER (run_start) AS BIGINT) AS target_len,
       min(CASE WHEN run_start THEN pos END) AS first_span_start,
       CAST(count(*) FILTER (masked) AS DOUBLE) / any_value(n) AS masked_frac
FROM marked GROUP BY doc_id
""",
)
def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption planning (Raffel et al. 2020): ~15% of each
    document's tokens are masked in spans of {SPAN_LEN}, spans replaced by
    one sentinel each — this computes, per document, the exact mask layout
    a denoising-objective data loader materializes: token/mask/span counts,
    encoder input length (kept tokens + one sentinel per span), decoder
    target length (masked tokens + sentinels), and the first span position.

    Span starts are HASH-SCHEDULED, not sampled: position p starts a span
    iff h60(doc_id|p) % {SPAN_START_MOD} == 0, so the corruption plan is
    reproducible across epochs, engines, and reshards (the split-
    determinism recipe shared with split_train_val_test). The key plan
    property: a token's masked state is a PURE LOCAL function of (doc, pos)
    — masked iff a span starts at p, p-1, or p-2; a run starts where it is
    masked but p-1 is not — so there is NO window, NO self-join, and no
    per-doc sort anywhere: one projection of 4 hash evaluations per token
    and one map-side-combinable aggregate. At 100 TB this is the ideal
    shape — embarrassingly parallel over token shards, single shuffle on
    doc_id."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = spread(docs).select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n"),
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
    )

    def start_at(off: int):
        p = F.col("pos") - off
        key = F.concat(
            F.col("doc_id").cast("string"), F.lit("|"), p.cast("string")
        )
        return (p >= 0) & (h60(key) % SPAN_START_MOD == 0)

    m0, m1, m2, m3 = start_at(0), start_at(1), start_at(2), start_at(3)
    masked = m0 | m1 | m2
    run_start = masked & ~(m1 | m2 | m3)
    marked = toks.select(
        "doc_id", "n", "pos", masked.alias("masked"), run_start.alias("run_start")
    )
    agg = marked.groupBy("doc_id").agg(
        F.first("n").alias("n_tokens"),
        F.count_if("masked").alias("n_masked"),
        F.count_if("run_start").alias("n_spans"),
        F.min(F.when(F.col("run_start"), F.col("pos"))).alias("first_span_start"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_masked",
        "n_spans",
        (F.col("n_tokens") - F.col("n_masked") + F.col("n_spans"))
        .cast("long")
        .alias("input_len"),
        (F.col("n_masked") + F.col("n_spans")).cast("long").alias("target_len"),
        "first_span_start",
        (F.col("n_masked").cast("double") / F.col("n_tokens")).alias("masked_frac"),
    )


# --- prefix-cache batch grouping (inference-serving data prep) ----------------------

PREFIX_BUCKET_TOKENS = 2  # coarse bucket: first 2 tokens route to a group


@register(
    "prefix_cache_grouping",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS n
  FROM documents WHERE text <> ''
),
b AS (
  SELECT doc_id, ws, n,
         array_to_string(ws[1:{PREFIX_BUCKET_TOKENS}], ' ') AS bucket
  FROM t WHERE n >= {PREFIX_BUCKET_TOKENS}
),
g AS (
  SELECT bucket, count(*) AS n_docs,
         min(ws) AS lo, max(ws) AS hi, min(n) AS min_tokens
  FROM b GROUP BY bucket HAVING count(*) >= 2
),
l AS (
  -- list_position returns 0 (not NULL) when no mismatch exists, so the
  -- lo-is-a-prefix-of-hi case must be branched explicitly (same hazard as
  -- Spark's array_position — both engines shared the bug before the
  -- pure-Python differential caught it)
  SELECT bucket, n_docs, min_tokens,
         CASE WHEN list_position(list_transform(range(1, least(len(lo), len(hi)) + 1),
                                                i -> lo[i] = hi[i]), false) = 0
              THEN least(len(lo), len(hi))
              ELSE list_position(list_transform(range(1, least(len(lo), len(hi)) + 1),
                                                i -> lo[i] = hi[i]), false) - 1
         END AS lcp_tokens
  FROM g
)
SELECT bucket, n_docs, CAST(lcp_tokens AS BIGINT) AS lcp_tokens,
       CAST((n_docs - 1) * lcp_tokens AS BIGINT) AS tokens_saved
FROM l
""",
)
def prefix_cache_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-cache batch planning — the vLLM/SGLang-era serving prep: group
    prompts that SHARE a token prefix so the KV cache computes the prefix
    once per group. Docs route to a coarse bucket (first
    {PREFIX_BUCKET_TOKENS} tokens); per bucket the report gives the exact
    longest common token prefix of ALL members and the KV tokens saved
    ((n_docs - 1) * lcp).

    The LCP of a whole group is computed WITHOUT pairwise comparisons: the
    common prefix of a set equals the common prefix of its lexicographic
    MIN and MAX members (any divergence inside the set separates min from
    max at or before that token), so the aggregate carries two token
    arrays per group and one zip-compare finds the first mismatch.

    Scale: one (bucket)-keyed aggregate with map-side combine carrying
    min/max arrays — no self-join, no window; Zipf-heavy buckets cost only
    their two representative arrays at the reducer."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text") != "")
    ws = F.split(F.col("text"), " ")
    b = docs.select(
        "doc_id",
        ws.alias("ws"),
        F.size(ws).alias("n"),
        F.array_join(F.slice(ws, 1, PREFIX_BUCKET_TOKENS), " ").alias("bucket"),
    ).filter(F.col("n") >= PREFIX_BUCKET_TOKENS)
    g = (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("ws").alias("lo"),
            F.max("ws").alias("hi"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    eqs = F.zip_with(
        F.slice(F.col("lo"), 1, F.least(F.size("lo"), F.size("hi"))),
        F.slice(F.col("hi"), 1, F.least(F.size("lo"), F.size("hi"))),
        lambda a, b_: a == b_,
    )
    # array_position returns 0 — NOT null, unlike DuckDB's list_position —
    # when no mismatch exists (lo is a prefix of hi, e.g. duplicate docs),
    # so the not-found case must be branched explicitly or the LCP comes
    # out -1 on exactly the groups that share the most (caught by
    # tests/test_r7_wave3.py's pure-Python differential).
    first_neq = F.array_position(eqs, False)
    lcp = F.when(
        first_neq == 0, F.least(F.size("lo"), F.size("hi")).cast("long")
    ).otherwise(first_neq - 1)
    return g.select(
        "bucket",
        "n_docs",
        lcp.cast("long").alias("lcp_tokens"),
        ((F.col("n_docs") - 1) * lcp).cast("long").alias("tokens_saved"),
    )
