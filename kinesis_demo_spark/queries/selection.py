"""Distributed order-statistic SELECTION — exact quantiles at 100 TB without
a global sort.

``exact_quantiles_selection`` computes the exact p25/p50/p75 of
``events.value`` by the classic two-pass histogram-narrowing k-selection
(the distributed analogue of quickselect): a bounded equi-width histogram
localizes each target rank to one bucket, then a second pass resolves the
exact value inside only the candidate buckets. The driver holds bucket
COUNTS (bounded metadata, <= SELECTION_BUCKETS rows) — never data — the same
collect class as the registry's iterative argmax scalars.

This is the exact counterpart to ``approx_percentiles_value`` (KLL sketch,
rows-only): where an SLA needs the true percentile (billing cutoffs,
regulatory thresholds), the sketch's rank error is not acceptable and a
global sort of 100 TB is not either. Selection reads the column twice with
map-side-combinable aggregates and shuffles only histogram rows.

Cross-engine exactness: ranks are pure integers (ceil via integer
cross-multiplication), the selected values are actual data values (never
interpolated), and the float bucket arithmetic is internal to the Spark
plan — the oracle derives the same ranks directly from row_number, so the
hash gate checks the selection algebra end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..io import load_table
from ..registry import register

SELECTION_BUCKETS = 1024
SELECTION_QS = (25, 50, 75)  # ceil(n*q/100) ranks — quantile_disc semantics


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "exact_quantiles_selection",
    oracle=f"""
WITH ranked AS (
  SELECT value, row_number() OVER (ORDER BY value) AS rn,
         count(*) OVER () AS n
  FROM events WHERE value IS NOT NULL
)
SELECT CAST(q AS BIGINT) AS q,
       CAST((n * q + 99) // 100 AS BIGINT) AS rnk,
       value,
       CAST(n AS BIGINT) AS n_rows
FROM ranked, (VALUES (25), (50), (75)) t(q)
WHERE rn = (n * q + 99) // 100
""",
)
def exact_quantiles_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p75 of events.value via two-pass distributed selection.

    Rank semantics: rank_q = ceil(n*q/100) (the smallest value with at least
    q% of rows at or below it — quantile_disc). Pass 1 buckets every value
    into {SELECTION_BUCKETS} equi-width bins over [min, max] and collects
    the bucket histogram; the driver walks the cumulative counts to find,
    for each target rank, its bucket and the residual rank within it. Pass 2
    scans only rows in candidate buckets (a broadcast of <= 3 ranges),
    builds the per-bucket distinct-value histogram, and picks the smallest
    value whose cumulative count reaches the residual rank.

    100 TB shape: two full-column scans, both reducing through map-side
    combinable aggregates (bucket counts; (bucket, value) counts filtered
    to ~n/{SELECTION_BUCKETS} rows); no global sort, no global window, no
    row ever reaches the driver. Adversarially clumped data (one bucket
    still too wide) recurses the same narrowing inside the bucket — one
    level suffices here and the recursion depth is log_B(range/precision)
    in general. Ties across bucket boundaries are impossible (equal values
    land in the same bucket); the all-equal edge (min == max) degenerates
    to bucket 0 and pass 2 answers every rank from it."""
    # NULLs are excluded in BOTH engines (the oracle filters them too):
    # counting them in n while the bucket walk never sees them would push a
    # target rank past the non-null count and silently drop that quantile's
    # row; an all-NULL/empty table would TypeError on the min/max compare.
    ev = _events(spark, sf_dir).select("value").filter(F.col("value").isNotNull())
    n, mn, mx = ev.agg(
        F.count(F.lit(1)), F.min("value"), F.max("value")
    ).first()
    if not n:
        return spark.createDataFrame(
            [], "q long, rnk long, value double, n_rows long"
        )
    ranks = [(q, (n * q + 99) // 100) for q in SELECTION_QS]

    b = SELECTION_BUCKETS
    # Degenerate-width guard (hypothesis-found): when the value range is
    # subnormal, (mx-mn)/b UNDERFLOWS to 0.0 and the bucket division emits
    # inf/NaN. Collapse to the single-bucket path — pass 2 then resolves the
    # rank over the whole (tiny-range) column, which is still exact; only
    # the pruning is lost, and only for a range narrower than ~1e-320.
    width = (mx - mn) / b if mx > mn else 0.0
    if width > 0.0:
        bucket_expr = F.least(
            F.floor((F.col("value") - F.lit(mn)) / F.lit(width)).cast("long"),
            F.lit(b - 1),
        )
    else:
        bucket_expr = F.lit(0).cast("long")
    hist = (
        ev.select(bucket_expr.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    counts = {r.bucket: r.cnt for r in hist}
    targets = []  # (q, rank, bucket, residual_rank)
    for q, k in ranks:
        cum = 0
        for bi in range(b):
            c = counts.get(bi, 0)
            if cum + c >= k:
                targets.append((q, k, bi, k - cum))
                break
            cum += c

    probe = spark.createDataFrame(
        targets, "q long, rnk long, bucket long, residual long"
    )
    w = Window.partitionBy("q").orderBy("value")
    binned = ev.select("value", bucket_expr.alias("bucket"))
    return (
        binned.join(F.broadcast(probe), "bucket")
        .groupBy("q", "rnk", "residual", "value")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("cum", F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .filter(F.col("cum") >= F.col("residual"))
        .groupBy("q", "rnk")
        .agg(F.min("value").alias("value"))
        .select("q", "rnk", "value", F.lit(n).cast("long").alias("n_rows"))
    )
