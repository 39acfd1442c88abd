"""ML feature-preparation operators — the featurization layer a training
pipeline runs between curation (filtering.py / dedup.py) and the model:

- ``feature_hash_vectorize`` — the signed hashing trick (Weinberger et al.
  2009): bag-of-tokens folded into a fixed-width sparse vector with a
  sign-split hash, the standard collision-tolerant featurizer when the
  vocabulary is unbounded. One corpus pass, no vocabulary state at all.
- ``feature_quantile_binning`` — exact equal-frequency (quartile) binning of
  a numeric feature per group: distinct-value histogram -> cumulative counts
  -> discrete quantile edges (``quantile_disc`` semantics: edges are actual
  data values, never interpolated floats) -> bin assignment + per-bin
  profile. The discretization step behind GBDT-style feature bucketing and
  monotone feature transforms.

Cross-engine exactness: bucket/sign hashes go through the shared md5-based
``h60`` (identical BIGINT on both engines); quantile edges are *data values*
selected by integer rank comparisons (no interpolation); every sum is COUNT
or DECIMAL. No libm, no order-dependent float folds anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions.hashing import h60, h60_sql
from ..io import load_table, spread
from ..registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(load_table(spark, sf_dir, "documents"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(load_table(spark, sf_dir, "events"))


# --- signed hashing trick ----------------------------------------------------

FEATURE_HASH_DIM = 64  # 2^6 buckets; bits [0,6) of h60 pick the bucket

# The sign bit must be independent of the bucket bits or every token in a
# bucket gets the same sign and collisions stop cancelling (the whole point
# of the signed variant). Bit 6 (the next bit up) is untouched by the
# bucket modulus.
_SIGN_DIV = FEATURE_HASH_DIM  # sign = parity of (h60 div 64)


@register(
    "feature_hash_vectorize",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
h AS (
  SELECT doc_id, {h60_sql('token')} AS hh FROM tok WHERE token <> ''
)
SELECT doc_id,
       CAST(hh % {FEATURE_HASH_DIM} AS BIGINT) AS bucket,
       CAST(sum(CASE WHEN (hh // {_SIGN_DIV}) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT)
         AS weight,
       count(*) AS n_tokens
FROM h
GROUP BY doc_id, hh % {FEATURE_HASH_DIM}
HAVING sum(CASE WHEN (hh // {_SIGN_DIV}) % 2 = 0 THEN 1 ELSE -1 END) <> 0
""",
)
def feature_hash_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed hashing trick: every token hashes to a bucket in [0, 64) via
    the shared 60-bit md5 hash; its contribution is +1/-1 by the parity of
    the next hash bit up. Output is the sparse vector as (doc_id, bucket,
    weight) rows — zero-weight buckets (exact sign cancellation) are
    dropped, which is what makes the representation sparse.

    100 TB shape: hash + explode + groupBy(doc_id, bucket) with map-side
    combine; partial aggregation collapses each document's tokens to at most
    64 rows before the shuffle, so shuffle volume is bounded by docs x dim,
    not token count. The hash is JVM md5 inside whole-stage codegen — no
    Python, no vocabulary broadcast, no state."""
    tok = _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    h = tok.filter(F.col("token") != "").select("doc_id", h60(F.col("token")).alias("hh"))
    # integer div, never `/`: hh/64 as a double exceeds 2^53 and the rounded
    # quotient could flip the parity bit (the registry-wide DIV discipline)
    sign = F.when(F.expr(f"hh div {_SIGN_DIV}") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    return (
        h.select("doc_id", (F.col("hh") % FEATURE_HASH_DIM).alias("bucket"), sign.alias("s"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("s").alias("weight"), F.count(F.lit(1)).alias("n_tokens"))
        .filter(F.col("weight") != 0)
    )


# --- exact equal-frequency binning -------------------------------------------

QUANTILE_BIN_QS = (1, 2, 3)  # quartile edges: 25 / 50 / 75 %


@register(
    "feature_quantile_binning",
    oracle="""
WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
vals AS (
  SELECT event_type, value, count(*) AS cnt
  FROM ev GROUP BY event_type, value
),
cum AS (
  SELECT event_type, value, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY value) AS cum_cnt,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM vals
),
edges AS (
  SELECT event_type,
         min(CASE WHEN cum_cnt * 4 >= n * 1 THEN value END) AS e1,
         min(CASE WHEN cum_cnt * 4 >= n * 2 THEN value END) AS e2,
         min(CASE WHEN cum_cnt * 4 >= n * 3 THEN value END) AS e3
  FROM cum GROUP BY event_type
),
binned AS (
  SELECT e.event_type, e.value,
         CASE WHEN e.value <= d.e1 THEN 0
              WHEN e.value <= d.e2 THEN 1
              WHEN e.value <= d.e3 THEN 2
              ELSE 3 END AS bin,
         d.e1, d.e2, d.e3
  FROM ev e JOIN edges d ON e.event_type = d.event_type
)
SELECT event_type, bin,
       count(*) AS n_rows,
       min(value) AS lo,
       max(value) AS hi,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       min(e1) AS edge_q25, min(e2) AS edge_q50, min(e3) AS edge_q75
FROM binned
GROUP BY event_type, bin
""",
)
def feature_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group equal-frequency binning of ``events.value`` into
    quartiles. Edge k is the smallest data value whose cumulative count
    reaches ceil(k*n/4) — ``quantile_disc`` semantics, stated as the
    integer cross-multiplication ``cum*4 >= n*k`` so neither engine ever
    computes a float rank. Bins are closed on the right at each edge;
    output is the per-(group, bin) profile with the edges echoed.

    Scale shape: the cumulative count runs over the *distinct-value
    histogram* (groupBy(type, value) first), not raw rows — at 100 TB the
    window input is |distinct values| per group, orders of magnitude
    smaller than the event stream, and the raw-row pass is a plain
    broadcast-join of 3 edges per group. Skewed groups stay safe because
    the heavy lifting (histogram) has map-side combine. If even the
    distinct histogram is too wide, the documented swap is
    ``approx_percentile`` (KLL sketch) for the edge step with everything
    downstream unchanged."""
    # NULL values carry no bin: a NULL would rank nowhere in the edge walk
    # but fall into the ELSE bin at assignment (Spark) or sort after every
    # edge (DuckDB) — excluded identically in both engines (r8 adversarial
    # sweep: one phantom 14th bin row)
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    vals = ev.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.partitionBy("event_type").orderBy("value")
    cum = vals.select(
        "event_type",
        "value",
        F.sum("cnt").over(w_cum).alias("cum_cnt"),
        F.sum("cnt").over(Window.partitionBy("event_type")).alias("n"),
    )
    edge_cols = [
        F.min(
            F.when(F.col("cum_cnt") * 4 >= F.col("n") * k, F.col("value"))
        ).alias(f"e{k}")
        for k in QUANTILE_BIN_QS
    ]
    edges = cum.groupBy("event_type").agg(*edge_cols)
    binned = ev.join(F.broadcast(edges), "event_type").select(
        "event_type",
        "value",
        F.when(F.col("value") <= F.col("e1"), F.lit(0))
        .when(F.col("value") <= F.col("e2"), F.lit(1))
        .when(F.col("value") <= F.col("e3"), F.lit(2))
        .otherwise(F.lit(3))
        .alias("bin"),
        "e1",
        "e2",
        "e3",
    )
    return binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        F.min("e1").alias("edge_q25"),
        F.min("e2").alias("edge_q50"),
        F.min("e3").alias("edge_q75"),
    )


# --- exact z-score standardization profile ------------------------------------------

Z_BUCKET_SCALE = 2  # bucket = floor(z * 2): half-sigma-wide bins


@register(
    "feature_standardize",
    oracle=f"""
WITH stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
         CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sq
  FROM events GROUP BY event_type
),
m AS (
  SELECT event_type, n,
         s / n AS mean,
         sqrt(sq / n - (s / n) * (s / n)) AS std
  FROM stats
),
z AS (
  SELECT e.event_type,
         (e.value - m.mean) / m.std AS z,
         m.mean, m.std, m.n
  FROM events e JOIN m ON m.event_type = e.event_type
  WHERE m.std > 0
)
SELECT event_type,
       CAST(floor(z * {Z_BUCKET_SCALE}) AS BIGINT) AS z_bucket,
       count(*) AS n_rows,
       min(z) AS z_lo,
       max(z) AS z_hi,
       min(mean) AS mean,
       min(std) AS std
FROM z
GROUP BY event_type, CAST(floor(z * {Z_BUCKET_SCALE}) AS BIGINT)
""",
)
def feature_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group z-score standardization, profiled as a half-sigma
    histogram — the feature-scaling step (and its sanity check: a healthy
    feature concentrates mass in |z| < 3; heavy far-tail buckets mean the
    raw feature needs clipping or a log transform before training).
    mean = sum/n and std = sqrt(E[x^2] - mean^2) from DECIMAL-exact sums,
    so the only float steps are two divisions, one subtraction, one IEEE
    sqrt, and the per-row (x - mean)/std — every one written with identical
    parenthesization in both engines, no commutative float fold anywhere.

    Scale shape: one map-side-combined moment aggregate (|groups| rows), a
    broadcast join back to the stream, and one (group, bucket) aggregate —
    two scans, zero windows. Degenerate zero-variance groups are excluded
    identically in both engines (std > 0) rather than emitting
    engine-specific inf/NULL division artifacts."""
    ev = _events(spark, sf_dir)
    dec = F.col("value").cast("decimal(18,2)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("sq"),
    )
    m = stats.select(
        "event_type",
        "n",
        (F.col("s") / F.col("n")).alias("mean"),
        F.sqrt(
            F.col("sq") / F.col("n")
            - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n"))
        ).alias("std"),
    )
    z = (
        ev.join(F.broadcast(m), "event_type")
        .filter(F.col("std") > 0)
        .select(
            "event_type",
            ((F.col("value") - F.col("mean")) / F.col("std")).alias("z"),
            "mean",
            "std",
        )
    )
    return (
        z.groupBy(
            "event_type",
            F.floor(F.col("z") * Z_BUCKET_SCALE).cast("long").alias("z_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("z").alias("z_lo"),
            F.max("z").alias("z_hi"),
            F.min("mean").alias("mean"),
            F.min("std").alias("std"),
        )
    )
