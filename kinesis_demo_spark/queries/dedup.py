"""Deduplication suite over the ``documents`` / ``embeddings`` fixtures — the
LLM-training-pipeline operators the north star adds beyond reference parity
(SURVEY.md §7 Phase 5): exact content dedup, inverted-index n-gram Jaccard,
MinHash+LSH, SimHash banding, and embedding-cosine near-dup.

Every strategy is fully deterministic and mirrored in DuckDB SQL via the
cross-engine md5-based hash (functions/hashing.py), so each gets a real
value-hash oracle — including the sketch-based ones, because the oracle
replicates the identical sketch arithmetic.

Scale design (the point of each shape at 100 TB):
- exact: one hash-shuffle on a 16-byte digest, map-side partial agg.
- n-gram Jaccard: inverted-index self-join — candidate generation touches
  only docs sharing a shingle (never the O(n^2) cross join). Hot shingles are
  the skew risk; AQE skew-split handles moderate skew, and a
  document-frequency cap on shingles (drop df > K) is the standard
  mitigation to bound the blow-up — not needed at fixture vocab, documented
  here as the production knob.
- MinHash+LSH: per-doc signature is a groupBy-min (constant state per doc);
  candidates join on (band, band_hash) buckets, so work scales with bucket
  collisions, not pairs.
- SimHash: 32-bit signature, 4 bands x 8 bits; hamming <= 3 implies at least
  one identical band (pigeonhole), so the band join is EXACT, not heuristic.
- embedding-cosine: documented brute-force shape at fixture scale; the
  LSH-bucketed variant in similarity.py is the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..functions.hashing import (
    BAND_W,
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    N_PERM,
    h60,
    h60_sql,
)
from ..io import load_table
from ..registry import register

JACCARD_THRESHOLD = 0.2
SIMHASH_BITS = 32
SIMHASH_BANDS = 4
SIMHASH_MAX_HAMMING = 3  # <= bands - 1 so the band join stays exact
COSINE_DUP_THRESHOLD = 0.40


# --- shared shingle derivation (word 3-grams, distinct per doc) ---------------


def shingles_col() -> Column:
    """Distinct word-3-shingles of ``text``; empty array for < 3 words."""
    words = F.split(F.col("text"), " ")
    mk = F.transform(
        F.sequence(F.lit(1), F.size(words) - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(words, i), F.element_at(words, i + 1), F.element_at(words, i + 2)
        ),
    )
    return F.when(F.size(words) >= 3, F.array_distinct(mk)).otherwise(
        F.array().cast("array<string>")
    )


# DuckDB mirror of shingles_col (range(1, n-1) is empty when n < 3).
SHINGLES_SQL = """
list_distinct(list_transform(range(1, len(string_split(text,' '))-1),
  i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2]))
"""

# Shared oracle CTEs: per-doc shingle list, exploded index, and pair
# intersection counts (inverted-index candidate generation).
_SHINGLE_CTES = f"""
sh AS (
  SELECT doc_id, {SHINGLES_SQL} AS shingles
  FROM documents
),
ex AS (SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         count(*) AS inter, any_value(a.n) AS na, any_value(b.n) AS nb
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select("doc_id", shingles_col().alias("shingles"))


def _jaccard_verified(cands: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Join candidate (doc_a, doc_b) pairs back to shingle sets and keep pairs
    with exact Jaccard >= threshold."""
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a", "doc_b", (inter.cast("double") / union).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- exact dedup ---------------------------------------------------------------


@register(
    "dedup_exact_text",
    oracle="""
SELECT md5(text) AS content_md5, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents
GROUP BY md5(text)
""",
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content digest, keep the smallest doc_id.
    One shuffle on the digest; the text column itself never shuffles."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5("text").alias("content_md5"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# --- n-gram Jaccard (inverted-index exact near-dup) ------------------------------


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH {_SHINGLE_CTES}
SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
FROM pairs
WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= {JACCARD_THRESHOLD}
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard near-dup via inverted index: explode distinct shingles,
    self-join on the shingle to count intersections (only co-shingled doc
    pairs are ever materialized), Jaccard from |A|,|B|,|A∩B|."""
    sh = _shingled(spark, sf_dir)
    ex = sh.select("doc_id", F.size("shingles").alias("n"), F.explode("shingles").alias("s"))
    a = ex.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), "s")
    b = ex.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "s")
    pairs = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"), F.first("na").alias("na"), F.first("nb").alias("nb"))
    )
    jaccard = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    return pairs.select("doc_a", "doc_b", jaccard.alias("jaccard")).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )


# --- MinHash + LSH ------------------------------------------------------------------


def _minhash_sig(sh: DataFrame) -> DataFrame:
    """(doc_id, j, minh): N_PERM-wide MinHash signature as rows.

    The permuted hash of every (shingle, j) is computed JVM-side from one
    md5 per shingle; groupBy-min is a map-side-combinable aggregation, so
    signature state per doc is N_PERM longs regardless of doc size."""
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    h30 = (h60(F.col("s")) % MINHASH_P).alias("h30")
    perms = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                ((F.lit(MINHASH_A[j]) * F.col("h30") + F.lit(MINHASH_B[j])) % MINHASH_P).alias("ph"),
            )
            for j in range(N_PERM)
        ]
    )
    return (
        ex.select("doc_id", h30)
        .select("doc_id", F.explode(perms).alias("p"))
        .groupBy("doc_id", F.col("p.j").alias("j"))
        .agg(F.min("p.ph").alias("minh"))
    )


_MINHASH_ORACLE = f"""
WITH {_SHINGLE_CTES},
exh AS (
  SELECT doc_id, {h60_sql('s')} % {MINHASH_P} AS h30
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
),
perms AS (SELECT unnest(range({N_PERM})) AS j),
sig AS (
  SELECT doc_id, j,
         min((({list(MINHASH_A)})[CAST(j AS INT)+1] * h30 + ({list(MINHASH_B)})[CAST(j AS INT)+1]) % {MINHASH_P}) AS minh
  FROM exh CROSS JOIN perms
  GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, j // {LSH_ROWS} AS band_idx,
         sum(minh * ({list(BAND_W)})[CAST(j % {LSH_ROWS} AS INT)+1]) AS band_hash
  FROM sig GROUP BY 1, 2
),
cands AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
)
SELECT c.doc_a, c.doc_b, CAST(p.inter AS DOUBLE) / (p.na + p.nb - p.inter) AS jaccard
FROM cands c JOIN pairs p ON p.doc_a = c.doc_a AND p.doc_b = c.doc_b
WHERE CAST(p.inter AS DOUBLE) / (p.na + p.nb - p.inter) >= {JACCARD_THRESHOLD}
"""


@register("dedup_minhash_lsh", oracle=_MINHASH_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash({N_PERM} perms) -> LSH ({LSH_BANDS} bands x {LSH_ROWS} rows) ->
    bucket join -> exact-Jaccard verification. Candidate generation never
    compares non-colliding docs; the bucket join is the only shuffle that
    grows with similarity density. The oracle replicates the identical
    signature arithmetic, so this sketch op is value-hash checked, not
    rows-only."""
    sh = _shingled(spark, sf_dir)
    sig = _minhash_sig(sh)
    w = F.element_at(F.array(*[F.lit(x) for x in BAND_W]), (F.col("j") % LSH_ROWS).cast("int") + 1)
    bands = (
        sig.groupBy("doc_id", (F.col("j") / LSH_ROWS).cast("int").alias("band_idx"))
        .agg(F.sum(F.col("minh") * w).alias("band_hash"))
    )
    x = bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_hash")
    y = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_hash")
    cands = (
        x.join(y, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _jaccard_verified(cands, sh, JACCARD_THRESHOLD)


# --- SimHash ---------------------------------------------------------------------------


_SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS


def _simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): {SIMHASH_BITS}-bit tf-weighted SimHash over word
    hashes. Explode tokens -> explode bit positions -> signed-sum per bit ->
    recombine; every step is a map-side-combinable aggregation."""
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    h = (h60(F.col("w")) % (1 << SIMHASH_BITS)).alias("hw")
    bit_rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(bit).alias("bit"),
                    (2 * ((F.col("hw") / (1 << bit)).cast("long") % 2) - 1).alias("contrib"),
                )
                for bit in range(SIMHASH_BITS)
            ]
        )
    )
    per_bit = (
        tok.select("doc_id", h)
        .select("doc_id", bit_rows.alias("b"))
        .groupBy("doc_id", "b.bit")
        .agg(F.sum("b.contrib").alias("s"))
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


_SIMHASH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
th AS (SELECT doc_id, {h60_sql('w')} % {1 << SIMHASH_BITS} AS hw FROM tok),
bits AS (SELECT unnest(range({SIMHASH_BITS})) AS bit),
per_bit AS (
  SELECT doc_id, bit, sum(2 * ((hw // (1::BIGINT << CAST(bit AS INT))) % 2) - 1) AS s
  FROM th CROSS JOIN bits GROUP BY 1, 2
),
sim AS (
  SELECT doc_id, sum(CASE WHEN s > 0 THEN 1::BIGINT << CAST(bit AS INT) ELSE 0 END) AS simhash
  FROM per_bit GROUP BY 1
),
bands AS (
  SELECT doc_id, simhash, b.band,
         (simhash // (1::BIGINT << CAST(b.band * {_SIMHASH_BAND_BITS} AS INT))) % {1 << _SIMHASH_BAND_BITS} AS band_bits
  FROM sim CROSS JOIN (SELECT unnest(range({SIMHASH_BANDS})) AS band) b
)
SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       bit_count(xor(x.simhash, y.simhash)) AS hamming
FROM bands x JOIN bands y
  ON x.band = y.band AND x.band_bits = y.band_bits AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {SIMHASH_MAX_HAMMING}
"""


@register("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: {SIMHASH_BITS}-bit signatures, banded into
    {SIMHASH_BANDS} x {_SIMHASH_BAND_BITS}-bit keys. hamming <= {SIMHASH_MAX_HAMMING}
    < bands guarantees at least one identical band, so the band join finds
    EVERY qualifying pair — LSH used as an exact algorithm, never a
    cross join."""
    sim = _simhash(_docs(spark, sf_dir))
    band_rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(band).alias("band"),
                    (
                        (F.col("simhash") / (1 << (band * _SIMHASH_BAND_BITS))).cast("long")
                        % (1 << _SIMHASH_BAND_BITS)
                    ).alias("band_bits"),
                )
                for band in range(SIMHASH_BANDS)
            ]
        )
    )
    bands = sim.select("doc_id", "simhash", band_rows.alias("b")).select(
        "doc_id", "simhash", "b.band", "b.band_bits"
    )
    x = bands.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"), "band", "band_bits")
    y = bands.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"), "band", "band_bits")
    hamming = F.bit_count(F.expr("sim_a ^ sim_b"))
    return (
        x.join(y, ["band", "band_bits"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
    )


# --- embedding-cosine near-dup ------------------------------------------------------------


from ..functions.vectors import dot_fold, dot_fold_sql  # noqa: E402  (shared with similarity.py)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
WITH v AS (
  SELECT vec_id, embedding,
         sqrt({dot_fold_sql('embedding', 'embedding')}) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {dot_fold_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE {dot_fold_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= {COSINE_DUP_THRESHOLD}
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: all pairs with cosine >= {COSINE_DUP_THRESHOLD}.
    Brute-force pairwise at fixture scale (the verified-exact baseline); the
    production path for 100 TB is the LSH-bucketed candidate generation in
    similarity.py (ann_cosine_topk_lsh) followed by this exact scorer on
    candidates only. Dot products fold left-to-right in double on both
    engines, so scores are bit-exact — no rounding needed."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(dot_fold(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), F.col("nrm").alias("na"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), F.col("nrm").alias("nb"))
    cos = dot_fold(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
    )
