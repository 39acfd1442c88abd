"""Statistical/analytic aggregates beyond the reference surface: moments
(variance/stddev), correlation, exact percentiles/median, argmin/argmax,
mode, and HLL approximate quantile bounds.

Float policy (same as relational.py): every sum that feeds a statistic is
accumulated as DECIMAL (exact, order-independent) and the final formula is a
fixed sequence of IEEE double ops identical on both engines — so variance and
correlation are value-hash exact, not tolerance-matched. Exact percentiles
use Spark ``percentile`` / DuckDB ``quantile_cont``, which share the
linear-interpolation definition (probed bit-identical on the fixtures).

Scale: all are single hash-aggregates with map-side partials. Exact
percentile needs a per-group sort of values — the documented scale-out path
is ``approx_percentile`` (constant-memory sketch, registered rows-only
below with an error-bound test in tests/test_analytics.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions.hashing import h60, h60_sql
from ..functions.timeutil import epoch_ms_sql, trunc_hour_ntz
from ..io import load_table
from ..plans.movements import X_SQL, Y_SQL, x_col, y_col
from ..registry import register

D2 = "decimal(18,2)"   # value has 2 decimals
D4 = "decimal(28,4)"   # value^2
DK = "decimal(28,6)"   # value * k cross terms


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "stats_moments_percentiles_by_type",
    oracle="""
WITH s AS (
  SELECT event_type,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
         CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2,
         quantile_cont(value, 0.25) AS p25,
         quantile_cont(value, 0.5) AS median,
         quantile_cont(value, 0.9) AS p90,
         quantile_cont(value, 0.99) AS p99
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       s1 / n AS mean,
       (s2 - s1 * s1 / n) / (n - 1) AS var_samp,
       sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_samp,
       p25, median, p90, p99
FROM s
""",
)
def stats_moments_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/variance/stddev from exact decimal power sums plus exact
    interpolated percentiles, one hash-aggregate per event_type. The engines
    perform the identical double-precision formula on the exact sums, so no
    tolerance is needed (built-in var_samp uses engine-specific streaming
    updates whose rounding differs across engines and partitionings — power
    sums are the deterministic distributed formulation). Spark ``percentile``
    and DuckDB ``quantile_cont`` share the linear-interpolation definition
    (probed bit-identical). Fused from the former stats_moments_by_type +
    stats_percentiles_value so the stats family lands one hard-signal row
    inside the driver's 50-query CORRECTNESS cap."""
    v = F.col("value").cast(D2)
    s = (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).cast("double").alias("s1"),
            F.sum(v * v).cast("double").alias("s2"),
            F.expr("percentile(value, 0.25)").alias("p25"),
            F.expr("percentile(value, 0.5)").alias("median"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    var = (s2 - s1 * s1 / n) / (n - 1)
    return s.select(
        "event_type", "n",
        (s1 / n).alias("mean"),
        var.alias("var_samp"),
        F.sqrt(var).alias("stddev_samp"),
        "p25", "median", "p90", "p99",
    )


@register(
    "stats_corr_value_props",
    oracle="""
WITH base AS (
  SELECT CAST(value AS DECIMAL(18,2)) AS x,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN CAST(json_extract_string(props, '$.k') AS DECIMAL(18,2)) END AS y
  FROM events
),
s AS (
  SELECT count(*) AS n,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(x * y) AS DOUBLE) AS sxy,
         CAST(sum(x * x) AS DOUBLE) AS sxx,
         CAST(sum(y * y) AS DOUBLE) AS syy
  FROM base
)
SELECT n,
       (sxy - sx * sy / n) / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr_xy,
       (sxy - sx * sy / n) / (n - 1) AS covar_samp
FROM s
""",
)
def stats_corr_value_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance between ``value`` and the
    JSON payload's ``k`` — exact power sums, identical double formula."""
    x = F.col("value").cast(D2)
    y = F.get_json_object("props", "$.k").cast(D2)
    s = _events(spark, sf_dir).select(x.alias("x"), y.alias("y")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n = F.col("n")
    sx, sy, sxy, sxx, syy = (F.col(c) for c in ("sx", "sy", "sxy", "sxx", "syy"))
    corr = (sxy - sx * sy / n) / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n))
    return s.select("n", corr.alias("corr_xy"), ((sxy - sx * sy / n) / (n - 1)).alias("covar_samp"))


@register("approx_percentiles_value")  # sketch-based -> rows-only; error bounded in tests
def approx_percentiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for quantiles: KLL/GK-style sketch via
    ``approx_percentile`` — constant memory per group, mergeable partials, no
    per-group sort. Approximate by design; tests bound its error against the
    exact percentiles."""
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10000).alias("approx_median"),
            F.expr("percentile(value, 0.5)").alias("exact_median"),
        )
    )


PCTL_ACCURACY = 10000  # percentile_approx accuracy: rank error <= n/accuracy


@register(
    "approx_percentile_rank_bound",
    oracle="""
SELECT event_type,
       CAST(count(value) AS BIGINT) AS n_values,
       TRUE AS within_rank_bound
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
""",
)
def approx_percentile_rank_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch family's EXTERNAL property gate (the join-cardinality
    'pinned as an identity' pattern): approx_percentile's documented
    contract is a rank error of at most n/accuracy; this query recomputes
    the approximate median's EXACT rank window per group (count of values
    strictly below / at-or-below the sketch output) and emits the bound
    check as a column. The sketch is deterministic for a given dataset, so
    the boolean is stable — if a Spark upgrade or a sketch-merge bug ever
    violates the advertised bound, this row's value hash goes red at the
    driver. The oracle asserts the contract (TRUE), not the sketch value,
    which SQL cannot reproduce — exactly why the raw sketch query stays
    rows-only while THIS row is hash-checked.

    Scale: one grouped sketch pass + one grouped conditional-count pass
    joined on the (tiny) group key — both map-side combinable; no sort,
    no per-group collect."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    med = ev.groupBy(F.col("event_type").alias("met")).agg(
        F.percentile_approx("value", 0.5, PCTL_ACCURACY).alias("am")
    )
    # eqNullSafe: the NULL event_type group is a real group in both engines
    # (hostile fixture); a plain equi-join would silently drop it
    j = ev.join(F.broadcast(med), F.col("event_type").eqNullSafe(F.col("met")))
    ranks = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.sum((F.col("value") < F.col("am")).cast("long")).alias("n_below"),
        F.sum((F.col("value") <= F.col("am")).cast("long")).alias("n_at_or_below"),
    )
    # target rank of the 0.5-quantile in Spark's definition: ceil(0.5 * n);
    # the sketch may misplace it by at most err = n/accuracy (+1 slack for
    # the discrete boundary). The approximate median's true rank interval
    # is (n_below, n_at_or_below]; the bound holds iff that interval
    # intersects [target - err, target + err].
    target = F.ceil(F.col("n_values") * F.lit(0.5)).cast("long")
    err = (F.col("n_values") / F.lit(PCTL_ACCURACY)).cast("long") + F.lit(1)
    within = (F.col("n_at_or_below") >= target - err) & (
        F.col("n_below") <= target + err
    )
    return ranks.select(
        "event_type", "n_values", within.alias("within_rank_bound")
    )


@register(
    "stats_argminmax_value",
    oracle="""
SELECT event_type,
       min(struct_pack(v := value, e := event_id)).v AS min_value,
       min(struct_pack(v := value, e := event_id)).e AS min_event_id,
       max(struct_pack(v := value, e := event_id)).v AS max_value,
       max(struct_pack(v := value, e := event_id)).e AS max_event_id
FROM events WHERE value IS NOT NULL GROUP BY event_type
""",
)
def stats_argminmax_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax with DETERMINISTIC ties via lexicographic struct
    ordering ((value, event_id) pairs) — the tie-safe form of min_by/max_by,
    identical on both engines, still a single map-side-combinable agg."""
    # NULL values excluded in both engines: a struct whose v field is NULL
    # is still a non-NULL struct, so min()/max() would NOT skip it — and the
    # two engines order NULL fields on opposite ends (Spark nulls-first,
    # DuckDB nulls-last), silently diverging (r8 adversarial sweep). An
    # argmin over a NULL measurement is meaningless; filter is the spec.
    pair = F.struct(F.col("value").alias("v"), F.col("event_id").alias("e"))
    agg = (
        _events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.min(pair).alias("mn"), F.max(pair).alias("mx"))
    )
    return agg.select(
        "event_type",
        F.col("mn.v").alias("min_value"),
        F.col("mn.e").alias("min_event_id"),
        F.col("mx.v").alias("max_value"),
        F.col("mx.e").alias("max_event_id"),
    )


@register(
    "stats_mode_event_type_per_user",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn
  FROM c
)
SELECT user_id, event_type AS mode_event_type, cnt AS mode_count
FROM r WHERE rn = 1
""",
)
def stats_mode_event_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type, ties broken lexicographically — count +
    ranking window, both shuffles on user_id (the second reuses the first's
    partitioning)."""
    c = _events(spark, sf_dir).groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(F.col("cnt").desc(), "event_type")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event_type"), F.col("cnt").alias("mode_count"))
    )


# --- window-frame battery -----------------------------------------------------


@register(
    "window_functions_battery",
    oracle=f"""
SELECT event_id, user_id,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h,
       count(*) OVER w AS n_1h,
       CAST(ntile(4) OVER o AS INT) AS quartile,
       percent_rank() OVER o AS pct_rank,
       cume_dist() OVER o AS cdist,
       first_value(event_id) OVER t AS first_eid,
       last_value(event_id) OVER t AS last_eid,
       nth_value(event_id, 2) OVER t AS second_eid
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY {epoch_ms_sql('ts')}
             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW),
       o AS (PARTITION BY user_id ORDER BY value NULLS FIRST, event_id),
       t AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def window_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame battery, fused from the former
    window_range_frame_running_sum + window_distribution_functions so the
    family lands one hard-signal row inside the driver's 50-query cap:

    - Time-based RANGE frame: per-user trailing-1-hour sum/count — the
      sliding-window analytic the reference's chart approximates
      client-side, with an exact decimal accumulator. RANGE (not ROWS) so
      timestamp peers share a frame identically on both engines.
    - Distribution + navigation functions with deterministic tiebreaks
      (event_id). percent_rank/cume_dist are the same closed-form rank
      ratios on both engines — exact doubles, no tolerance.

    All three windows partition by user_id, so Catalyst plans ONE exchange;
    the in-partition sorts differ per window but no extra shuffle occurs.
    The value sort pins NULLS FIRST explicitly in the oracle: Spark's ASC
    default is nulls-first, DuckDB's is nulls-last, so a partition holding
    a NULL value silently shifts every ntile/percent_rank/cume_dist row
    (r8 adversarial sweep)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-3_600_000, Window.currentRow)
    )
    o = Window.partitionBy("user_id").orderBy("value", "event_id")
    t = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(D2)).over(w).cast("double").alias("sum_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.ntile(4).over(o).alias("quartile"),
        F.percent_rank().over(o).alias("pct_rank"),
        F.cume_dist().over(o).alias("cdist"),
        F.first("event_id").over(t).alias("first_eid"),
        F.last("event_id").over(t).alias("last_eid"),
        F.nth_value("event_id", 2).over(t).alias("second_eid"),
    )


# --- EWMA smoothing ------------------------------------------------------------------

EWMA_WINDOW = 16  # last-16 rows per user; alpha = 1/2

# Weight table [2^-15, ..., 2^-1, 2^0] (oldest -> newest): every weight and
# every partial weight-sum is an exact power-of-two double, so the weighted
# fold is bit-identical across engines — the reason alpha is 1/2 and not 0.9.
_EWMA_W = [2.0 ** -(EWMA_WINDOW - 1 - i) for i in range(EWMA_WINDOW)]
_EWMA_W_SQL = "[" + ", ".join(repr(w) for w in _EWMA_W) + "]"


@register(
    "ewma_value_per_user",
    oracle=f"""
WITH arrs AS (
  SELECT event_id, user_id,
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN {EWMA_WINDOW - 1} PRECEDING AND CURRENT ROW) AS arr
  FROM events WHERE value IS NOT NULL
)
SELECT event_id, user_id,
       list_reduce(list_transform(range(1, len(arr) + 1),
           i -> arr[i] * ({_EWMA_W_SQL})[{EWMA_WINDOW} - len(arr) + CAST(i AS INT)]),
           (a, b) -> a + b)
       /
       list_reduce(list_transform(range(1, len(arr) + 1),
           i -> ({_EWMA_W_SQL})[{EWMA_WINDOW} - len(arr) + CAST(i AS INT)]),
           (a, b) -> a + b) AS ewma
FROM arrs
""",
)
def ewma_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of ``value`` per user (alpha =
    1/2 over the trailing {EWMA_WINDOW} rows) — the smoothing the
    reference's chart would apply client-side, as one shuffle + ordered
    window + per-row fold. EWMA's recurrence is order-dependent and not a
    built-in window aggregate, so the trailing frame is collected per row
    (bounded at {EWMA_WINDOW} elements — constant state) and folded with
    power-of-two weights, which keeps every partial IEEE-exact on both
    engines. Truncating the window geometrically bounds the error at 2^-16
    of the true infinite-history EWMA while making the operator
    constant-memory at any history length.

    NULL values are excluded up front in BOTH engines (EWMA over observed
    values): Spark's collect_list silently drops NULLs while DuckDB's list()
    keeps them, so a NULL inside the frame would silently misalign the
    weight tails between engines — and an ALL-NULL frame crashed outright
    (empty arr -> sequence(1, 0) is DESCENDING [1, 0] in Spark -> weight
    index {EWMA_WINDOW}+1; found by the r8 adversarial-fixture sweep)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_WINDOW - 1), Window.currentRow)
    )
    wtab = F.array(*[F.lit(x) for x in _EWMA_W])
    arr = F.collect_list("value").over(w)
    base = (
        _events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_id", "user_id", arr.alias("arr"))
    )
    n = F.size("arr")
    idx = F.sequence(F.lit(1), n)
    weight_at = lambda i: F.element_at(wtab, F.lit(EWMA_WINDOW) - n + i)  # noqa: E731
    num = F.aggregate(
        F.zip_with(F.col("arr"), idx, lambda v, i: v * weight_at(i)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    den = F.aggregate(
        F.transform(idx, lambda i: weight_at(i)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    return base.select("event_id", "user_id", (num / den).alias("ewma"))


# --- count-min sketch heavy hitters ---------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 64


@register(
    "heavy_hitters_cms",
    oracle=f"""
WITH rows_j AS (
  SELECT user_id, j.j,
         list_reduce(list_transform(string_split_regex(substr(md5(CAST(j.j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)),1,15),''), c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x,y) -> x*16 + y) % {CMS_WIDTH} AS col
  FROM events CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS j) j
),
counters AS (
  SELECT j, col, count(*) AS cnt FROM rows_j GROUP BY 1, 2
),
keys AS (
  SELECT DISTINCT user_id FROM events
),
key_cells AS (
  SELECT k.user_id, j.j, list_reduce(list_transform(string_split_regex(substr(md5(CAST(j.j AS VARCHAR) || ':' || CAST(k.user_id AS VARCHAR)),1,15),''), c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (x,y) -> x*16 + y) % {CMS_WIDTH} AS col
  FROM keys k CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS j) j
),
est AS (
  SELECT kc.user_id, min(c.cnt) AS cms_est
  FROM key_cells kc JOIN counters c ON c.j = kc.j AND c.col = kc.col
  GROUP BY kc.user_id
),
exact AS (
  SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY 1
)
SELECT e.user_id, x.exact_cnt, e.cms_est
FROM est e JOIN exact x USING (user_id)
""",
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation per user, alongside the exact
    count — the mergeable constant-memory sketch for heavy-hitter detection
    at 100 TB (the sketch state is depth x width = {CMS_DEPTH}x{CMS_WIDTH}
    counters regardless of key cardinality; counters from different
    partitions/streams merge by addition). Hash functions are h60 over
    ``j:key``, fully deterministic, so unlike most sketches this one is
    value-hash checked — the oracle builds the identical sketch. The
    estimate is an upper bound (collisions only ever inflate), which
    tests/test_analytics.py pins as cms_est >= exact_cnt."""
    j_arr = F.array(*[F.lit(j) for j in range(CMS_DEPTH)])
    ev = _events(spark, sf_dir)

    def cell(j_col, key_col):
        return h60(F.concat(j_col.cast("string"), F.lit(":"), key_col.cast("string"))) % CMS_WIDTH

    rows_j = ev.select("user_id", F.explode(j_arr).alias("j")).select(
        "user_id", "j", cell(F.col("j"), F.col("user_id")).alias("col")
    )
    counters = rows_j.groupBy("j", "col").agg(F.count(F.lit(1)).alias("cnt"))
    keys = ev.select("user_id").distinct()
    key_cells = keys.select("user_id", F.explode(j_arr).alias("j")).select(
        "user_id", "j", cell(F.col("j"), F.col("user_id")).alias("col")
    )
    est = (
        key_cells.join(counters, ["j", "col"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("cms_est"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return est.join(exact, "user_id").select("user_id", "exact_cnt", "cms_est")


@register(
    "timeseries_hourly_gapfill",
    oracle="""
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
),
agg AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT g.user_id, g.hour,
       coalesce(a.n_events, 0) AS n_events,
       coalesce(a.sum_value, 0.0) AS sum_value
FROM grid g LEFT JOIN agg a ON a.user_id = g.user_id AND a.hour = g.hour
""",
)
def timeseries_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly rollup — the hypertable/time-bucket-gapfill shape: every
    user gets a row for EVERY hour between their first and last event, empty
    hours zero-filled (the downsampled series a dashboard or a feature
    pipeline consumes must be gap-free; sparse rollups silently drop the
    zeros that carry the signal).

    Spark side: per-user bounds (one partial agg), ``sequence(h0, h1,
    interval 1 hour)`` exploded into the grid — grid size is bounded by the
    time span, never by event count — then a LEFT join back to the hourly
    aggregate on (user_id, hour). Both shuffles hash on user_id; at 100 TB
    the grid side is tiny (|users| x |hours|) relative to the fact scan, and
    the decimal sums keep the join's zero-fill arithmetic bit-exact.

    The DENSE grid is this query's contract (VERDICT r9 #8): the output is
    one row per (user, hour-in-span) — Theta(users x span), 11x the
    non-empty rollup at sf0.1 (measured density 9.1%) — so the plan's work
    is output-bound and its scaling exponent tracks output cardinality
    (0.76 at sf0.1->sf1, i.e. sublinear in its own output growth); no plan
    can beat the rows it is contracted to emit. Consumers who want the
    gap-free SEMANTICS without materialized zeros use
    timeseries_gapfill_runs below — the run-length-encoded twin whose
    output is Theta(non-empty hours) and whose dense expansion is proven
    equal to this query (tests/test_analytics.py)."""
    ev = _events(spark, sf_dir)
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour"),
    )
    agg = ev.groupBy("user_id", hour.alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    return grid.join(agg, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


@register(
    "timeseries_gapfill_runs",
    oracle="""
WITH agg AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1, 2
),
nn AS (
  SELECT *, lead(hour) OVER (PARTITION BY user_id ORDER BY hour) AS nxt FROM agg
)
SELECT user_id, hour AS hour_start, hour AS hour_end,
       CAST(1 AS BIGINT) AS n_hours, n_events, sum_value
FROM nn
UNION ALL
SELECT user_id, hour + INTERVAL 1 HOUR AS hour_start,
       nxt - INTERVAL 1 HOUR AS hour_end,
       CAST((epoch(nxt) - epoch(hour)) / 3600 - 1 AS BIGINT) AS n_hours,
       CAST(0 AS BIGINT) AS n_events, 0.0 AS sum_value
FROM nn WHERE nxt > hour + INTERVAL 1 HOUR
""",
)
def timeseries_gapfill_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length-encoded gapfill — the 100 TB twin of
    timeseries_hourly_gapfill (VERDICT r9 #8): one row per NON-EMPTY hour
    plus one row per maximal empty gap (n_events=0, n_hours = gap length),
    so the output is Theta(non-empty hours) instead of Theta(users x span)
    — 11x smaller at sf0.1's 9.1% grid density, and the dense grid is
    recoverable losslessly by exploding each gap row (zero-fill at read).
    The rolling_active_users_intervals precedent applied to gapfill: emit
    deltas/runs, not the grid.

    Plan: the sparse hourly rollup (one map-side-combinable agg), one lead()
    window per user to find the gaps, a union — no sequence-explode
    anywhere, so the work scales with EVENTS, not with span x users. The
    gap rows' hour arithmetic is integer-exact interval math; both engines
    emit identical timestamps and BIGINT run lengths, so the whole encoding
    value-hash-checks."""
    from pyspark.sql.window import Window as W

    ev = _events(spark, sf_dir)
    hour = F.date_trunc("hour", F.col("ts"))
    agg = ev.groupBy("user_id", hour.alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    nn = agg.withColumn(
        "nxt", F.lead("hour").over(W.partitionBy("user_id").orderBy("hour"))
    )
    islands = nn.select(
        "user_id",
        F.col("hour").alias("hour_start"),
        F.col("hour").alias("hour_end"),
        F.lit(1).cast("long").alias("n_hours"),
        "n_events",
        "sum_value",
    )
    one_h = F.expr("INTERVAL 1 HOUR")
    gaps = (
        nn.filter(F.col("nxt") > F.col("hour") + one_h)
        .select(
            "user_id",
            (F.col("hour") + one_h).alias("hour_start"),
            (F.col("nxt") - one_h).alias("hour_end"),
            (
                (F.unix_timestamp("nxt") - F.unix_timestamp("hour")) / 3600 - 1
            ).cast("long").alias("n_hours"),
            F.lit(0).cast("long").alias("n_events"),
            F.lit(0.0).alias("sum_value"),
        )
    )
    return islands.unionByName(gaps)


TS_SIM_TOP_USERS = 20


@register(
    "timeseries_user_similarity",
    oracle=f"""
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
),
agg AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n_events
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT g.user_id, g.hour, coalesce(a.n_events, 0) AS n
  FROM grid g LEFT JOIN agg a ON a.user_id = g.user_id AND a.hour = g.hour
),
active AS (
  SELECT user_id FROM (
    SELECT user_id, sum(n) AS total FROM series GROUP BY user_id
    ORDER BY total DESC, user_id LIMIT {TS_SIM_TOP_USERS}
  )
),
pairs AS (
  SELECT x.user_id AS user_a, y.user_id AS user_b,
         count(*) AS n_hours,
         sum(x.n) AS sx, sum(y.n) AS sy,
         sum(x.n * x.n) AS sxx, sum(y.n * y.n) AS syy,
         sum(x.n * y.n) AS sxy
  FROM series x
  JOIN series y ON x.hour = y.hour AND x.user_id < y.user_id
  WHERE x.user_id IN (SELECT user_id FROM active)
    AND y.user_id IN (SELECT user_id FROM active)
  GROUP BY 1, 2
)
SELECT user_a, user_b, n_hours,
       CAST(n_hours * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n_hours * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n_hours * syy - sy * sy AS DOUBLE))) AS corr
FROM pairs
WHERE (n_hours * sxx - sx * sx) > 0 AND (n_hours * syy - sy * sy) > 0
""",
)
def timeseries_user_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search over user activity patterns (the
    stream-similarity question of PAPERS.md's EDBT'19 entry, Spark-first):
    align every user's DENSE hourly event-count series (the gap-fill grid —
    zero hours carry signal for correlation), prune candidates to the
    top-{TS_SIM_TOP_USERS} most-active users (TakeOrderedAndProject, the same
    prune-then-exact-score shape the ANN family uses), and compute exact
    Pearson correlation per pair from integer power sums over the pair's
    co-observed hours. Zero-variance series are excluded (correlation
    undefined). Scale: the hour-keyed self-join fans out to at most
    |candidates| rows per hour per side; the power sums are map-side-combined
    BIGINT partials, and the final double arithmetic is one fixed IEEE
    sequence in both engines — value-hash exact. Widening the candidate set
    is a constant, not a plan change; the full-corpus path is implemented by
    ``timeseries_user_similarity_bucketed`` below (activity-signature
    banding, the LSH analogue — no top-K gate, no all-pairs join)."""
    ev = _events(spark, sf_dir)
    hour = F.date_trunc("hour", F.col("ts"))
    # PRUNE FIRST (r10, closes the sealed scaling line's worst exponent —
    # 0.86 over sf0.1->1): a user's series total equals their raw event
    # count (the grid's zero hours add nothing), so the top-K gate needs
    # one map-side-combined count over events, and the dense grid is then
    # built for the K SURVIVORS only — Theta(K x span) instead of
    # Theta(users x span). Results identical by construction (same totals,
    # same tie-break, same per-user grid).
    active = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("total"))
        .orderBy(F.col("total").desc(), "user_id")
        .limit(TS_SIM_TOP_USERS)
        .select("user_id")
    )
    evk = ev.join(F.broadcast(active), "user_id")
    bounds = evk.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        "user_id", F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour")
    )
    agg = evk.groupBy("user_id", hour.alias("hour")).agg(F.count(F.lit(1)).alias("n_events"))
    s = grid.join(agg, ["user_id", "hour"], "left").select(
        "user_id", "hour", F.coalesce("n_events", F.lit(0)).alias("n")
    )
    x = s.select(F.col("user_id").alias("user_a"), "hour", F.col("n").alias("nx"))
    y = s.select(F.col("user_id").alias("user_b"), "hour", F.col("n").alias("ny"))
    pairs = (
        x.join(y, "hour")
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum("nx").alias("sx"),
            F.sum("ny").alias("sy"),
            F.sum(F.col("nx") * F.col("nx")).alias("sxx"),
            F.sum(F.col("ny") * F.col("ny")).alias("syy"),
            F.sum(F.col("nx") * F.col("ny")).alias("sxy"),
        )
    )
    n = F.col("n_hours")
    denx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.sqrt(denx.cast("double")) * F.sqrt(deny.cast("double"))
    )
    return (
        pairs.filter((denx > 0) & (deny > 0))
        .select("user_a", "user_b", "n_hours", corr.alias("corr"))
    )


# Full-corpus candidate generation for the time-series similarity search —
# the activity-signature bucketing the top-K variant's docstring points to.
# 24-bit signature: bit h set iff the user's hour-of-day h is above their own
# uniform-average activity (24*c_h >= total); banded into TS_SIG_TABLES x
# TS_SIG_BAND_BITS keys, multi-table LSH style. Both are constants: widening
# coverage is a retune, never a plan change.
TS_SIG_BAND_BITS = 6
TS_SIG_TABLES = 4

_PROF_COLS_SQL = ", ".join(
    f"sum(CASE WHEN extract(hour FROM ts) = {h} THEN 1 ELSE 0 END) AS c{h}"
    for h in range(24)
)
_TOTAL_SQL = " + ".join(f"c{h}" for h in range(24))
_SIG_SQL = " + ".join(
    f"(CASE WHEN 24 * c{h} >= ({_TOTAL_SQL}) THEN {1 << h} ELSE 0 END)"
    for h in range(24)
)
_SIG_BANDS_SQL = " ".join(
    f"WHEN {t} THEN (sig // {1 << (t * TS_SIG_BAND_BITS)}) % {1 << TS_SIG_BAND_BITS}"
    for t in range(TS_SIG_TABLES)
)


@register(
    "timeseries_user_similarity_bucketed",
    oracle=f"""
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
),
agg AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n_events
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT g.user_id, g.hour, coalesce(a.n_events, 0) AS n
  FROM grid g LEFT JOIN agg a ON a.user_id = g.user_id AND a.hour = g.hour
),
prof AS (
  SELECT user_id, {_PROF_COLS_SQL} FROM events GROUP BY user_id
),
sigs AS (
  SELECT user_id, ({_SIG_SQL}) AS sig FROM prof
),
bands AS (
  SELECT user_id, t.tbl, CASE t.tbl {_SIG_BANDS_SQL} END AS bucket
  FROM sigs CROSS JOIN (SELECT unnest(range({TS_SIG_TABLES})) AS tbl) t
),
cand AS (
  SELECT DISTINCT a.user_id AS user_a, b.user_id AS user_b
  FROM bands a JOIN bands b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.user_id < b.user_id
),
pairs AS (
  SELECT c.user_a, c.user_b,
         count(*) AS n_hours,
         sum(x.n) AS sx, sum(y.n) AS sy,
         sum(x.n * x.n) AS sxx, sum(y.n * y.n) AS syy,
         sum(x.n * y.n) AS sxy
  FROM cand c
  JOIN series x ON x.user_id = c.user_a
  JOIN series y ON y.user_id = c.user_b AND y.hour = x.hour
  GROUP BY 1, 2
)
SELECT user_a, user_b, n_hours,
       CAST(n_hours * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n_hours * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n_hours * syy - sy * sy AS DOUBLE))) AS corr
FROM pairs
WHERE (n_hours * sxx - sx * sx) > 0 AND (n_hours * syy - sy * sy) > 0
""",
)
def timeseries_user_similarity_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-CORPUS time-series similarity search — the scale path that
    replaces ``timeseries_user_similarity``'s top-{TS_SIM_TOP_USERS} prune:
    every user gets a 24-bit activity signature (bit h = hour-of-day h above
    the user's own average), banded into {TS_SIG_TABLES} tables x
    {TS_SIG_BAND_BITS} bits exactly like the embedding LSH; candidate pairs
    share any (table, bucket); exact Pearson (integer power sums over
    co-observed dense hours) scores candidates only. No all-pairs join
    anywhere: the signature aggregate is one map-side-combined groupBy, the
    band self-join shuffles (user_id, table, bucket) rows only, and the
    scoring join fans each candidate pair out over the dense hour grid.
    Recall/coverage tunes with the two constants. Same deterministic
    arithmetic as the top-K variant, so the approximate path keeps a
    value-hash-exact DuckDB oracle."""
    ev = _events(spark, sf_dir)
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        "user_id", F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour")
    )
    agg = ev.groupBy("user_id", hour.alias("hour")).agg(F.count(F.lit(1)).alias("n_events"))
    series = grid.join(agg, ["user_id", "hour"], "left").select(
        "user_id", "hour", F.coalesce("n_events", F.lit(0)).alias("n")
    )

    hod = F.hour("ts")
    prof = ev.groupBy("user_id").agg(
        *[F.sum(F.when(hod == h, 1).otherwise(0)).alias(f"c{h}") for h in range(24)]
    )
    total = sum((F.col(f"c{h}") for h in range(1, 24)), F.col("c0"))
    sig = sum(
        (
            F.when(F.lit(24) * F.col(f"c{h}") >= F.col("total"), F.lit(1 << h)).otherwise(F.lit(0))
            for h in range(1, 24)
        ),
        F.when(F.lit(24) * F.col("c0") >= F.col("total"), F.lit(1)).otherwise(F.lit(0)),
    )
    sigs = prof.withColumn("total", total).select("user_id", sig.alias("sig"))
    band_rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    (
                        F.shiftright("sig", t * TS_SIG_BAND_BITS)
                        % (1 << TS_SIG_BAND_BITS)
                    ).alias("bucket"),
                )
                for t in range(TS_SIG_TABLES)
            ]
        )
    )
    slim = sigs.select("user_id", band_rows.alias("b")).select("user_id", "b.tbl", "b.bucket")
    cand = (
        slim.select(F.col("user_id").alias("user_a"), "tbl", "bucket")
        .join(slim.select(F.col("user_id").alias("user_b"), "tbl", "bucket"), ["tbl", "bucket"])
        .filter(F.col("user_a") < F.col("user_b"))
        .select("user_a", "user_b")
        .distinct()
    )
    x = series.select(F.col("user_id").alias("user_a"), "hour", F.col("n").alias("nx"))
    y = series.select(F.col("user_id").alias("user_b"), "hour", F.col("n").alias("ny"))
    pairs = (
        cand.join(x, "user_a")
        .join(y, ["user_b", "hour"])
        .groupBy("user_a", "user_b")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum("nx").alias("sx"),
            F.sum("ny").alias("sy"),
            F.sum(F.col("nx") * F.col("nx")).alias("sxx"),
            F.sum(F.col("ny") * F.col("ny")).alias("syy"),
            F.sum(F.col("nx") * F.col("ny")).alias("sxy"),
        )
    )
    n = F.col("n_hours")
    denx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.sqrt(denx.cast("double")) * F.sqrt(deny.cast("double"))
    )
    return (
        pairs.filter((denx > 0) & (deny > 0))
        .select("user_a", "user_b", "n_hours", corr.alias("corr"))
    )


# --- snapshot diff (CDC over the keyed serving store) ---------------------------


@register(
    "snapshot_diff_user_state",
    oracle="""
WITH mx AS (
  SELECT max(event_id) AS max_id FROM events
),
tagged AS (
  SELECT e.user_id, e.event_id, e.ts, e.value, t.snap
  FROM events e, mx,
       (SELECT unnest(['a', 'b']) AS snap) t
  WHERE (t.snap = 'a' AND e.event_id <= (mx.max_id * 2) // 3)
     OR (t.snap = 'b' AND e.event_id >  mx.max_id // 3)
),
latest AS (
  SELECT user_id, snap, event_id, value,
         row_number() OVER (PARTITION BY user_id, snap
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM tagged
),
a AS (SELECT user_id, event_id, value FROM latest WHERE snap = 'a' AND rn = 1),
b AS (SELECT user_id, event_id, value FROM latest WHERE snap = 'b' AND rn = 1)
SELECT coalesce(a.user_id, b.user_id) AS user_id,
       CASE WHEN b.user_id IS NULL THEN 'removed'
            WHEN a.user_id IS NULL THEN 'added'
            WHEN a.event_id <> b.event_id THEN 'changed'
            ELSE 'unchanged' END AS status,
       coalesce(a.event_id, -1) AS last_id_a,
       coalesce(b.event_id, -1) AS last_id_b,
       coalesce(a.value, -1.0) AS val_a,
       coalesce(b.value, -1.0) AS val_b
FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
""",
)
def snapshot_diff_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style diff of the keyed serving store between two points in the
    stream — snapshot A = first two-thirds of events by event_id, snapshot
    B = last two-thirds (overlapping middle third, so all four statuses
    occur): per user, the latest (ts, event_id)-ordered state in each
    snapshot, classified added / removed / changed / unchanged. This is the
    audit a consumer runs to validate an incremental upsert sink
    (streaming/pipeline.py foreachBatch MERGE) against a full recompute.

    Scale: each event row is tagged with the snapshots it belongs to via an
    exploded membership array (<= 2x replication, no re-scan), then ONE
    shuffle on (user_id, snap) ranks latest states; the diff itself is a
    user-keyed full outer join of two |users|-sized sides. Snapshot bounds
    are BIGINT arithmetic off one broadcast max — deterministic in both
    engines. Sentinels (-1) keep nullable BIGINT/DOUBLE columns non-null so
    the pandas hash stays dtype-stable."""
    events = _events(spark, sf_dir)
    mx = events.agg(F.max("event_id").alias("max_id"))
    bound_a = F.expr("(max_id * 2) DIV 3")
    bound_b = F.expr("max_id DIV 3")
    tagged = (
        events.crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.explode(
                F.concat(
                    F.when(F.col("event_id") <= bound_a, F.array(F.lit("a")))
                    .otherwise(F.array().cast("array<string>")),
                    F.when(F.col("event_id") > bound_b, F.array(F.lit("b")))
                    .otherwise(F.array().cast("array<string>")),
                )
            ).alias("snap"),
        )
    )
    w = Window.partitionBy("user_id", "snap").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = tagged.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    a = latest.filter(F.col("snap") == "a").select(
        F.col("user_id").alias("user_a"),
        F.col("event_id").alias("id_a"),
        F.col("value").alias("v_a"),
    )
    b = latest.filter(F.col("snap") == "b").select(
        F.col("user_id").alias("user_b"),
        F.col("event_id").alias("id_b"),
        F.col("value").alias("v_b"),
    )
    joined = a.join(b, a["user_a"] == b["user_b"], "full_outer")
    status = (
        F.when(F.col("user_b").isNull(), F.lit("removed"))
        .when(F.col("user_a").isNull(), F.lit("added"))
        .when(F.col("id_a") != F.col("id_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.coalesce(F.col("user_a"), F.col("user_b")).alias("user_id"),
        status.alias("status"),
        F.coalesce(F.col("id_a"), F.lit(-1)).cast("long").alias("last_id_a"),
        F.coalesce(F.col("id_b"), F.lit(-1)).cast("long").alias("last_id_b"),
        F.coalesce(F.col("v_a"), F.lit(-1.0)).alias("val_a"),
        F.coalesce(F.col("v_b"), F.lit(-1.0)).alias("val_b"),
    )


# --- incremental aggregate maintenance (merge == recompute differential) --------


@register(
    "incremental_agg_union_merge",
    oracle="""
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY user_id
""",
)
def incremental_agg_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance, proven against full
    recompute: the per-user (count, sum) table is built from TWO partial
    aggregates — a 'previous snapshot' (first two-thirds of events by
    event_id) and a 'new batch' (the rest) — merged by summing partials.
    The oracle is the DIRECT full aggregate, so the value-hash gate IS the
    merge==recompute theorem for these aggregates. This is the batch
    analogue of the streaming foreachBatch MERGE sink
    (streaming/pipeline.py): counts add; DECIMAL sums are exact and
    order-independent, so partial merging cannot drift — which is exactly
    why the engine's float policy keeps money/value sums in DECIMAL until
    the final cast.

    Scale: both partials and the merge group on user_id, so one hash
    partitioning serves all three aggregations with map-side combine; the
    snapshot bound is BIGINT arithmetic off a broadcast 1-row max."""
    events = _events(spark, sf_dir)
    mx = events.agg(F.max("event_id").alias("max_id"))
    tagged = events.crossJoin(F.broadcast(mx)).withColumn(
        "is_old", F.col("event_id") <= F.expr("(max_id * 2) DIV 3")
    )
    partial = tagged.groupBy("user_id", "is_old").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast(D2)).alias("ps"),
    )
    return partial.groupBy("user_id").agg(
        F.sum("pn").alias("n_events"),
        F.sum("ps").cast("double").alias("sum_value"),
    )


# --- Z-order (Morton) locality clustering ---------------------------------------

# Interleave the low 11 bits of x (< 1920) and y (< 1080): bit i of x lands
# at position 2i, bit i of y at 2i+1. Pure integer arithmetic ((v DIV 2^i)
# % 2) * 4^i — identical in both engines, overflow-free (max code < 2^22).
_Z_BITS = 11
_Z_TILE_DIV = 4096  # morton DIV 2^12 => aligned 64 x 64 spatial tiles


def _morton_sql(x: str, y: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(({x}) // {1 << i} % 2) * {1 << (2 * i)}")
        terms.append(f"(({y}) // {1 << i} % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@register(
    "zorder_heatmap_locality",
    oracle=f"""
WITH pos AS (
  SELECT CAST({X_SQL} AS BIGINT) AS x, CAST({Y_SQL} AS BIGINT) AS y
  FROM events
),
coded AS (
  SELECT x, y, CAST({_morton_sql("x", "y")} AS BIGINT) AS morton FROM pos
)
SELECT CAST(morton // {_Z_TILE_DIV} AS BIGINT) AS ztile,
       count(*) AS n_events,
       min(x) AS min_x, max(x) AS max_x,
       min(y) AS min_y, max(y) AS max_y,
       min(morton) AS min_morton, max(morton) AS max_morton
FROM coded
GROUP BY 1
""",
)
def zorder_heatmap_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering of the heatmap position space — the
    space-filling-curve layout pass (Delta/Iceberg ZORDER BY) as a
    first-class operator: interleaving the x/y bits gives a 1-D sort key
    under which any contiguous key range covers a small aligned spatial
    tile, so a store SORTED by morton serves 2-D region queries from few
    contiguous files instead of a full scan. The query rolls events up per
    2^12-code tile with the tile's bounding box — each tile provably spans
    at most 64 x 64 cells (tests/test_analytics.py pins it), which IS the
    locality guarantee.

    Scale: coordinate derivation and bit interleave are per-row integer
    expressions (scan-parallel, codegen); the rollup is one map-side
    combined aggregate on the tile key. To actually lay out a table,
    ``df.repartitionByRange(F.col('morton')).sortWithinPartitions`` writes
    the curve order — same expression, no new shuffle shape."""
    pos = _events(spark, sf_dir).select(x_col().alias("x"), y_col().alias("y"))
    morton = None
    for i in range(_Z_BITS):
        xi = (F.col("x") / (1 << i)).cast("long") % 2 * (1 << (2 * i))
        yi = (F.col("y") / (1 << i)).cast("long") % 2 * (1 << (2 * i + 1))
        morton = xi + yi if morton is None else morton + xi + yi
    coded = pos.select("x", "y", morton.cast("long").alias("morton"))
    return (
        coded.groupBy((F.col("morton") / _Z_TILE_DIV).cast("long").alias("ztile"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("x").alias("min_x"), F.max("x").alias("max_x"),
            F.min("y").alias("min_y"), F.max("y").alias("max_y"),
            F.min("morton").alias("min_morton"), F.max("morton").alias("max_morton"),
        )
    )


# --- Funnel conversion (ordered event-sequence analytics) --------------------------

FUNNEL_STAGES = ("view", "click", "purchase")


@register(
    "funnel_user_stages",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS first_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.first_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS first_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.first_click
  GROUP BY e.user_id
)
SELECT v.user_id, v.first_view, c.first_click, p.first_purchase,
       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN c.user_id IS NOT NULL THEN 2
                 ELSE 1 END AS BIGINT) AS stage_reached
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
""",
)
def funnel_user_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): per user, the first view,
    the first click strictly AFTER that view, and the first purchase
    strictly after that click — the product-analytics staple where order
    matters (a click before any view must not count).

    Scale: three per-user min-aggregates chained by user_id-keyed joins —
    every shuffle is on the same key, so Catalyst reuses one hash
    partitioning across the chain (no re-exchange between the stages), and
    each stage's aggregate is map-side partial first. Nothing is ever
    broadcast per-user; at 100 TB the chain is three co-partitioned passes
    over the (already user-bucketed) event log."""
    ev = _events(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "first_view",
            "first_click",
            "first_purchase",
            F.when(F.col("first_purchase").isNotNull(), F.lit(3))
            .when(F.col("first_click").isNotNull(), F.lit(2))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("stage_reached"),
        )
    )


# --- Cohort retention (weekly activity matrix) -------------------------------------

_US_PER_WEEK = 7 * 86_400_000_000


@register(
    "cohort_weekly_retention",
    oracle=f"""
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_WEEK} AS week
  FROM events
),
first_w AS (
  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id
)
SELECT f.cohort_week, uw.week - f.cohort_week AS week_offset,
       count(DISTINCT uw.user_id) AS n_active
FROM uw JOIN first_w f ON uw.user_id = f.user_id
GROUP BY 1, 2
""",
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: users grouped by first-active week,
    counted in every later week they return — THE retention report every
    analytics engine ships. Weeks are integer epoch-microsecond buckets
    (``unix_micros DIV week``), timezone-free and bit-identical in both
    engines (``date_trunc('week')`` week-start conventions never enter).

    Scale: the distinct (user, week) activity set collapses the event log
    first (one shuffle, map-side partial distinct), the per-user min rides
    the same user_id partitioning, and the final (cohort, offset) aggregate
    is tiny. No broadcast of per-user state; count(DISTINCT user) at the
    matrix grain re-shuffles only the already-distinct activity rows."""
    uw = (
        _events(spark, sf_dir)
        .select(
            "user_id",
            # integer DIV, never a double division: exact at any epoch
            F.expr(f"unix_micros(ts) DIV {_US_PER_WEEK}").alias("week"),
        )
        .distinct()
    )
    first_w = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(first_w, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


# --- Event transition matrix (clickstream path analysis) ---------------------------


@register(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
cnt AS (
  SELECT cur, nxt, count(*) AS n
  FROM seq WHERE nxt IS NOT NULL
  GROUP BY cur, nxt
),
tot AS (
  SELECT cur, sum(n) AS row_total FROM cnt GROUP BY cur
)
SELECT c.cur, c.nxt, c.n,
       CAST(CAST(c.n AS DOUBLE) / CAST(t.row_total AS DOUBLE) AS DOUBLE) AS p
FROM cnt c JOIN tot t ON c.cur = t.cur
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix: for each (current, next)
    event-type pair, the transition count and conditional probability
    P(next | current) — the clickstream path-analysis / Markov-model
    estimation pass. Successor pairing is deterministic under the (ts,
    event_id) total order, so ties in ts can never flip a transition.

    Scale: one shuffle+sort per user for lead() (the event log's natural
    partitioning), then a tiny |types|^2 aggregate; the row totals join is
    |types|-sized and broadcast by the planner. The probability is one
    BIGINT/BIGINT -> double division, identical in both engines."""
    seq = _events(spark, sf_dir).select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    )
    cnt = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cnt.groupBy("cur").agg(F.sum("n").alias("row_total"))
    return cnt.join(tot, "cur").select(
        "cur",
        "nxt",
        "n",
        (F.col("n").cast("double") / F.col("row_total").cast("double")).alias("p"),
    )


# --- Co-occurrence / association lift (market-basket analytics) --------------------


@register(
    "event_cooccurrence_lift",
    oracle="""
WITH basket AS (
  SELECT DISTINCT user_id, event_type FROM events
),
n_users AS (
  SELECT count(DISTINCT user_id) AS n FROM basket
),
per_type AS (
  SELECT event_type, count(*) AS n_t FROM basket GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_ab
  FROM basket a JOIN basket b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_ab,
       CAST(CAST(p.n_ab AS DOUBLE) / CAST(n.n AS DOUBLE) AS DOUBLE) AS support,
       CAST(CAST(p.n_ab AS DOUBLE) / CAST(ta.n_t AS DOUBLE) AS DOUBLE) AS confidence_a_to_b,
       CAST((CAST(p.n_ab AS DOUBLE) / CAST(ta.n_t AS DOUBLE))
            / (CAST(tb.n_t AS DOUBLE) / CAST(n.n AS DOUBLE)) AS DOUBLE) AS lift
FROM pairs p
JOIN per_type ta ON p.type_a = ta.event_type
JOIN per_type tb ON p.type_b = tb.event_type
CROSS JOIN n_users n
""",
)
def event_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over per-user event baskets: for every unordered
    event-type pair, support, confidence and lift — the market-basket
    companion to ``event_transition_matrix`` (unordered co-engagement vs
    ordered succession).

    Scale: the basket (distinct user x type) collapses the log first — one
    shuffle with map-side partial distinct; the pair self-join rides the
    same user_id partitioning (types per user are bounded, so the per-user
    pair fan-out is a constant factor, never quadratic in events); the
    |types| and 1-row totals broadcast. Each ratio is a fixed sequence of
    IEEE divisions mirrored exactly in the oracle."""
    basket = _events(spark, sf_dir).select("user_id", "event_type").distinct()
    n_users = basket.agg(F.count_distinct("user_id").alias("n"))
    per_type = basket.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a = basket.select("user_id", F.col("event_type").alias("type_a"))
    b = basket.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ta = F.broadcast(per_type.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("na")))
    tb = F.broadcast(per_type.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("nb")))
    conf = F.col("n_ab").cast("double") / F.col("na").cast("double")
    return (
        pairs.join(ta, "type_a")
        .join(tb, "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            (F.col("n_ab").cast("double") / F.col("n").cast("double")).alias("support"),
            conf.alias("confidence_a_to_b"),
            (conf / (F.col("nb").cast("double") / F.col("n").cast("double"))).alias("lift"),
        )
    )


# --- Hopping (sliding) window aggregate --------------------------------------------

HOP_WINDOW_MIN = 10   # window length, minutes
HOP_SLIDE_MIN = 5     # slide, minutes
_US_PER_MIN = 60_000_000


@register(
    "hopping_window_counts",
    oracle=f"""
WITH base AS (
  SELECT user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS u FROM events
),
hops AS (
  SELECT user_id, value,
         (u // {HOP_SLIDE_MIN * _US_PER_MIN}
          + CASE WHEN u % {HOP_SLIDE_MIN * _US_PER_MIN} < 0 THEN -1 ELSE 0 END)
           - k.k AS slide_idx
  FROM base,
       (SELECT unnest(range({HOP_WINDOW_MIN // HOP_SLIDE_MIN})) AS k) k
)
SELECT user_id,
       make_timestamp(slide_idx * {HOP_SLIDE_MIN * _US_PER_MIN}) AS window_start,
       count(*) AS cnt,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM hops
GROUP BY 1, 2
""",
)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregate ({HOP_WINDOW_MIN} min windows sliding every
    {HOP_SLIDE_MIN} min): each event lands in window/slide = 2 overlapping
    windows — the smoothing shape dashboards use between tumbling (no
    overlap) and session (gap) windows, and Spark's native
    ``F.window(ts, '10 minutes', '5 minutes')`` multi-assignment.

    The oracle replicates the assignment arithmetic (an event at slide
    index i belongs to windows starting at i and i-1 slide units) from
    integer epoch buckets, so both engines window identically with no
    timezone in play. The bucket index FLOORS (explicit CASE correction:
    DuckDB ``//`` truncates toward zero while Spark's ``window()`` floors
    — they differ on every pre-1970 slide, --time sweep r12), and the
    epoch base is ``epoch_us(CAST(ts AS TIMESTAMP))`` so a TIMESTAMP(NANOS)
    fixture truncates ns->us exactly like load_table; windows with
    negative starts are real windows (the r11 ``>= 0`` guard silently
    dropped every pre-epoch window). Scale: the explode factor is the constant
    window/slide ratio; state per (user, window) is two exact aggregates —
    the same bounded-state story as the tumbling form, x2."""
    ev = _events(spark, sf_dir)
    w = F.window("ts", f"{HOP_WINDOW_MIN} minutes", f"{HOP_SLIDE_MIN} minutes")
    return (
        ev.groupBy("user_id", w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select("user_id", F.col("w.start").alias("window_start"), "cnt", "sum_value")
    )


# --- SCD-2 state intervals (change-tracking dimension build) -----------------------


@register(
    "scd2_user_state_intervals",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END AS is_change
  FROM ordered
),
versioned AS (
  SELECT user_id, event_type, ts,
         sum(is_change) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
  FROM flagged
),
intervals AS (
  SELECT user_id, CAST(version AS BIGINT) AS version,
         min(event_type) AS state,
         min(ts) AS valid_from,
         count(*) AS n_events
  FROM versioned
  GROUP BY user_id, version
)
SELECT user_id, version, state, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
       n_events
FROM intervals
""",
)
def scd2_user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 interval build: collapse each user's event-type runs into
    versioned validity intervals (state, valid_from, valid_to, open-ended
    current row) — the warehouse change-tracking dimension pattern, built
    from the gaps-and-islands idiom (lag -> change flag -> running-sum
    version id -> per-version aggregate -> lead for the closing bound).

    Scale: every window partitions by user_id, so ONE shuffle+sort per user
    feeds the lag, the running sum, and (after the tiny per-version
    aggregate on the same key) the lead — Catalyst reuses the partitioning
    across all three. The (ts, event_id) total order makes run boundaries,
    version numbers and interval bounds fully deterministic."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_change"),
    )
    versioned = flagged.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("is_change")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("version"),
    )
    intervals = versioned.groupBy("user_id", F.col("version").cast("long").alias("version")).agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    vw = Window.partitionBy("user_id").orderBy("version")
    return intervals.select(
        "user_id",
        "version",
        "state",
        "valid_from",
        F.lead("valid_from").over(vw).alias("valid_to"),
        "n_events",
    )


# --- Data-quality profile (per-column stats in one pass) ---------------------------


@register(
    "profile_events_columns",
    oracle="""
SELECT count(*) AS n_rows,
       count(DISTINCT user_id) AS user_id_distinct,
       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id_nulls,
       count(DISTINCT event_type) AS event_type_distinct,
       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type_nulls,
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
       CAST(min(value) AS DOUBLE) AS value_min,
       CAST(max(value) AS DOUBLE) AS value_max,
       epoch_us(min(ts)) AS ts_min_us, epoch_us(max(ts)) AS ts_max_us,
       CAST(sum(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END) AS BIGINT) AS props_empty
FROM events
""",
)
def profile_events_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile: row count, per-column null/empty counts,
    distinct cardinalities, and value/time ranges — the data-quality
    screening every ingestion pipeline runs before training-data jobs
    touch a new drop. ONE aggregate over one scan (all statistics are
    map-side combinable, including the distinct counts via partial
    dedup); no second pass, no per-column jobs.

    The time range is served as epoch MICROSECOND BIGINTs
    (``unix_micros``), not raw TIMESTAMPs: raw min/max(ts) values are
    bit-identical across engines but hash differently under some driver
    sessions (timezone/unit canonicalization at the pandas-hash layer —
    the r7 red row); integer microseconds are environment-proof, exactly
    like the ``date_trunc`` bucket emitters that have stayed green."""
    ev = _events(spark, sf_dir)
    nul = lambda c: F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))  # noqa: E731
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("user_id").alias("user_id_distinct"),
        nul("user_id").alias("user_id_nulls"),
        F.count_distinct("event_type").alias("event_type_distinct"),
        nul("event_type").alias("event_type_nulls"),
        nul("value").alias("value_nulls"),
        F.min("value").cast("double").alias("value_min"),
        F.max("value").cast("double").alias("value_max"),
        F.unix_micros(F.min("ts")).alias("ts_min_us"),
        F.unix_micros(F.max("ts")).alias("ts_max_us"),
        F.sum(F.when(F.col("props").isNull() | (F.col("props") == ""), 1).otherwise(0)).alias(
            "props_empty"
        ),
    )


# --- Robust outliers: median / MAD z-score -----------------------------------------

MAD_CUTOFF = 3.0


@register(
    "outliers_value_mad",
    oracle=f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.event_id, e.value, m.med,
         abs(e.value - m.med) AS absdev
  FROM events e JOIN med m ON e.event_type = m.event_type
),
mad AS (
  SELECT event_type, quantile_cont(absdev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type, d.event_id, d.value, d.med, m.mad,
       abs(d.value - d.med) / nullif(m.mad, 0) AS robust_z
FROM dev d JOIN mad m ON d.event_type = m.event_type
WHERE abs(d.value - d.med) / nullif(m.mad, 0) > {MAD_CUTOFF}
""",
)
def outliers_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: |x - median| / MAD per event type, flagging
    rows past {MAD_CUTOFF} — the median/MAD screen that survives the very
    outliers a mean/stddev z-score is corrupted by (the standard robust
    alternative). Both quantiles use the shared exact interpolated
    percentile (bit-identical across engines); the deviation and ratio are
    single IEEE ops mirrored in the oracle.

    Scale: two grouped exact percentiles (per-group sort — the documented
    approx_percentile swap applies beyond memory) with the tiny per-type
    tables broadcast back; the flagging pass is a pure scan filter."""
    ev = _events(spark, sf_dir)
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "event_id", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("absdev"),
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(absdev, 0.5)").alias("mad"))
    # nullif: a zero-MAD group (more than half its values identical) has no
    # robust spread to normalize by — the ratio is undefined, not infinite;
    # under ANSI mode the unguarded division is a hard DIVIDE_BY_ZERO crash
    # (found by the r8 adversarial-fixture sweep on a constant-valued type)
    z = F.abs(F.col("value") - F.col("med")) / F.nullif(F.col("mad"), F.lit(0.0))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select("event_type", "event_id", "value", "med", "mad", z.alias("robust_z"))
        .filter(F.col("robust_z") > MAD_CUTOFF)
    )


# --- Key-skew concentration report (HHI from exact integer sums) -------------------


@register(
    "skew_concentration_report",
    oracle="""
WITH per_key AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
),
agg AS (
  SELECT count(*) AS n_keys,
         CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(max(n) AS BIGINT) AS max_key_rows,
         CAST(sum(n * n) AS BIGINT) AS sum_sq
  FROM per_key
)
SELECT n_keys, n_rows, max_key_rows,
       CAST(max_key_rows AS DOUBLE) / CAST(n_rows AS DOUBLE) AS max_share,
       CAST(sum_sq AS DOUBLE) / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)) AS hhi,
       1.0 / CAST(n_keys AS DOUBLE) AS hhi_uniform_floor
FROM agg
""",
)
def skew_concentration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key skew diagnostic: key count, hottest key's share, and the
    Herfindahl-Hirschman concentration index of the user_id distribution —
    the number that tells you whether a shuffle on this key needs salting
    (HHI at the 1/n_keys uniform floor = balanced; approaching 1 = one whale
    key owns the table). HHI is computed as sum(n_i^2) / N^2 from EXACT
    BIGINT power sums — order-independent integers, then two IEEE ops —
    instead of summing per-key (n_i/N)^2 doubles whose result depends on
    summation order.

    Scale: one per-key count (map-side partials) and a 1-row reduce; this is
    the pre-flight check the salting operator (operators/salting.py) is the
    answer to."""
    per_key = _events(spark, sf_dir).groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    agg = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_key_rows"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sum_sq"),
    )
    return agg.select(
        "n_keys",
        "n_rows",
        "max_key_rows",
        (F.col("max_key_rows").cast("double") / F.col("n_rows").cast("double")).alias("max_share"),
        (
            F.col("sum_sq").cast("double")
            / (F.col("n_rows").cast("double") * F.col("n_rows").cast("double"))
        ).alias("hhi"),
        (F.lit(1.0) / F.col("n_keys").cast("double")).alias("hhi_uniform_floor"),
    )


# --- Seasonal (hour-of-day) baseline anomalies -------------------------------------


@register(
    "seasonal_hour_anomalies",
    oracle="""
WITH base AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS hod_avg
  FROM events GROUP BY 1, 2
)
SELECT e.event_id, e.event_type, CAST(hour(e.ts) AS BIGINT) AS hod,
       e.value, b.hod_avg,
       e.value / nullif(b.hod_avg, 0) AS ratio
FROM events e
JOIN base b ON e.event_type = b.event_type AND CAST(hour(e.ts) AS BIGINT) = b.hod
WHERE e.value / nullif(b.hod_avg, 0) > 3.0
""",
)
def seasonal_hour_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly flagging: each event compared to its
    (type, hour-of-day) historical average, so a value that is normal at
    the daily peak is not flagged just because the GLOBAL average sits
    lower — the baseline shape monitoring systems use once plain
    threshold alerts start paging on rush hour. The average is a DECIMAL
    sum over one count division (exact-then-one-IEEE-op, both engines
    identical); hour extraction is UTC-session-pinned.

    Scale: the baseline is |types| x 24 rows — broadcast back over the
    scan; the flagging pass is a pure per-row comparison."""
    ev = _events(spark, sf_dir)
    hod = F.hour("ts").cast("long")
    base = ev.groupBy("event_type", hod.alias("hod")).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("hod_avg")
    )
    return (
        ev.select("event_id", "event_type", hod.alias("hod"), "value")
        .join(F.broadcast(base), ["event_type", "hod"])
        .select(
            "event_id", "event_type", "hod", "value", "hod_avg",
            # nullif: an all-zero (type, hour) baseline makes the ratio
            # undefined; ANSI division would crash (r8 adversarial sweep)
            (F.col("value") / F.nullif(F.col("hod_avg"), F.lit(0.0))).alias("ratio"),
        )
        .filter(F.col("ratio") > 3.0)
    )


# --- declarative data-quality constraint battery ----------------------------------


@register(
    "dq_constraint_violations",
    oracle="""
SELECT 'lineitem_orphan_order' AS rule,
       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
         (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS violations
UNION ALL
SELECT 'lineitem_orphan_part',
       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
         (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'orders_orphan_customer',
       (SELECT count(*) FROM orders o WHERE NOT EXISTS
         (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'lineitem_nonpositive_price',
       (SELECT count(*) FROM lineitem WHERE l_extendedprice <= 0)
UNION ALL
SELECT 'lineitem_discount_range',
       (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
UNION ALL
SELECT 'lineitem_ship_before_order',
       (SELECT count(*) FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate < o.o_orderdate)
UNION ALL
SELECT 'events_negative_user',
       (SELECT count(*) FROM events WHERE user_id < 0)
""",
)
def dq_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate: referential-integrity, domain-range,
    and chronology constraints evaluated as one report of violation counts
    per rule — the Deequ/Great-Expectations shape, composed from the
    engine's own operators (anti joins for FK orphans, pushed-filter
    counts for domains, a keyed join for the cross-table chronology rule).
    A clean pipeline asserts all-zeros before training-data ever ships;
    the row-per-rule output makes the gate itself auditable.

    Scale: each FK rule is one anti join (broadcast when the key side
    fits, else a keyed shuffle); domain rules are scan-local pushed-filter
    counts; the union is of 1-row aggregates, so the report costs the
    scans, nothing more."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")

    def count1(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("violations")).select(
            F.lit(name).alias("rule"), "violations"
        )

    rules = [
        count1(
            "lineitem_orphan_order",
            li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti"),
        ),
        count1(
            "lineitem_orphan_part",
            li.join(part, li.l_partkey == part.p_partkey, "left_anti"),
        ),
        count1(
            "orders_orphan_customer",
            orders.join(customer, orders.o_custkey == customer.c_custkey, "left_anti"),
        ),
        count1("lineitem_nonpositive_price", li.filter(F.col("l_extendedprice") <= 0)),
        count1(
            "lineitem_discount_range",
            li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
        ),
        count1(
            "lineitem_ship_before_order",
            li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
                F.col("l_shipdate") < F.col("o_orderdate")
            ),
        ),
        count1("events_negative_user", events.filter(F.col("user_id") < 0)),
    ]
    out = rules[0]
    for r in rules[1:]:
        out = out.unionAll(r)
    return out


# --- per-user linear trend (least-squares slope over time) ------------------------


@register(
    "trend_slope_per_user",
    oracle="""
WITH t0 AS (SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS us0
            FROM events GROUP BY user_id),
base AS (
  SELECT e.user_id,
         (epoch_us(CAST(ts AS TIMESTAMP)) - t0.us0) // 1000000 AS x,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM events e JOIN t0 ON t0.user_id = e.user_id
),
s AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM base GROUP BY user_id
)
SELECT user_id, n,
       CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
         AS slope_cents_per_sec,
       (CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / n
         AS intercept_cents
FROM s WHERE n >= 2 AND n * sxx - sx * sx <> 0
""",
)
def trend_slope_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend of event value over time — the
    drift/trend detector every monitoring and feature pipeline wants,
    grouped-regression shape. Everything before the final formula is exact
    BIGINT arithmetic: x = whole seconds since THE USER's first event,
    y = exact cents. The rebase is per-user and happens in the MICROS
    domain (r12, --time fixture findings): (a) a per-user origin bounds
    sum(x*x) by the user's own span — the r11 global-min rebase overflowed
    int64 the moment one corpus spanned centuries (the temporal-extremes
    fixture covers 1677-2262; Spark 4 ANSI raises while DuckDB widens to
    int128, splitting the engines) — the bound condition is now
    user_span_seconds^2 x rows-per-user < 2^63 (a decade's span supports
    ~90k rows/key); (b) subtracting micros BEFORE the integer divide keeps
    the dividend non-negative, where Spark's truncating DIV and DuckDB's
    flooring // agree — divide-then-subtract diverges on pre-1970
    sub-second timestamps. Slope is shift-invariant, so only
    intercept_cents changed meaning: value at the user's first event (a
    better-conditioned origin than the corpus start).
    Slope and intercept are then a fixed handful of IEEE ops on identical
    integers, so both engines produce bit-identical doubles. Degenerate
    users (a single event, or zero time variance) are excluded by an
    integer predicate.

    Scale: per-user min (map-side-combinable agg), an equi-join back on
    user_id (same key as the final power-sum aggregate, so AQE reuses the
    partitioning), then one 5-sum aggregate per user; no broadcast of
    data-sized state, no global rebase scalar."""
    ev = _events(spark, sf_dir)
    # integer DIV, not "/": long / long is a DOUBLE divide in Spark, lossy
    # above 2^53 — epoch micros are ~2^60 (the io.py nanos precedent)
    um = ev.groupBy("user_id").agg(F.min(F.expr("unix_micros(ts)")).alias("us0"))
    base = ev.join(um, "user_id").select(
        "user_id",
        F.expr("(unix_micros(ts) - us0) DIV 1000000").alias("x"),
        (F.col("value").cast(D2) * 100).cast("long").alias("y"),
    )
    s = base.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    det = n * sxx - sx * sx
    slope = (n * sxy - sx * sy).cast("double") / det.cast("double")
    intercept = (sy.cast("double") - slope * sx.cast("double")) / n
    return s.filter((n >= 2) & (det != 0)).select(
        "user_id",
        "n",
        slope.alias("slope_cents_per_sec"),
        intercept.alias("intercept_cents"),
    )


# --- rolling active users (sliding-window distinct count) -------------------------

RAU_WINDOW_HOURS = 24  # trailing span per grid hour

_RAU_ORACLE = f"""
WITH uh AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS hour_idx FROM events
),
span AS (SELECT min(hour_idx) AS h0, max(hour_idx) AS h1 FROM uh),
covered AS (
  SELECT DISTINCT user_id, hour_idx + k.k AS win_idx
  FROM uh, (SELECT unnest(range({RAU_WINDOW_HOURS})) AS k) k
)
SELECT make_timestamp(c.win_idx * 3600000000) AS window_end_hour,
       count(*) AS active_users
FROM covered c, span s
WHERE c.win_idx BETWEEN s.h0 AND s.h1
GROUP BY 1
"""


@register("rolling_active_users", oracle=_RAU_ORACLE)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{RAU_WINDOW_HOURS}h distinct active users per hour — the
    rolling DAU/MAU-style engagement metric. COUNT DISTINCT over a sliding
    window cannot partial-aggregate directly; the scale shape is the
    coverage expansion: dedupe activity to (user, hour) FIRST (the only
    pass over raw events), then each user-hour covers the next
    {RAU_WINDOW_HOURS} grid hours, dedupe (user, window) and count. The
    expansion factor applies to the user-hour table, not the event table —
    at 100 TB that is the difference between x{RAU_WINDOW_HOURS} of a tiny
    table and x{RAU_WINDOW_HOURS} of the firehose. Windows outside the
    observed hour span are trimmed against a broadcast 1-row span
    aggregate. Integer epoch-hour grid keeps both engines' bucketing and
    window timestamps identical under any session timezone.

    At extreme windows (trailing 30 d on an hourly grid = x720) the
    further refinement is per-user activity-interval merging (gaps-and-
    islands, the SCD-2 machinery) emitting [first, last+W] coverage
    ranges; the x{RAU_WINDOW_HOURS} hop replication is the right
    simplicity/cost point here."""
    ev = _events(spark, sf_dir)
    uh = ev.select(
        "user_id", F.expr("unix_micros(ts) DIV 3600000000").alias("hour_idx")
    ).distinct()
    span = uh.agg(
        F.min("hour_idx").alias("h0"), F.max("hour_idx").alias("h1")
    )
    covered = (
        uh.select(
            "user_id",
            F.explode(
                F.sequence(F.col("hour_idx"), F.col("hour_idx") + (RAU_WINDOW_HOURS - 1))
            ).alias("win_idx"),
        )
        .distinct()
    )
    return (
        covered.crossJoin(F.broadcast(span))
        .filter((F.col("win_idx") >= F.col("h0")) & (F.col("win_idx") <= F.col("h1")))
        .groupBy(
            F.expr("timestamp_micros(win_idx * 3600000000)").alias("window_end_hour")
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@register("rolling_active_users_intervals", oracle=_RAU_ORACLE)
def rolling_active_users_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extreme-window scale path rolling_active_users' docstring
    promises: gaps-and-islands interval merging + delta encoding, with NO
    per-window replication at all. Per user, consecutive activity hours
    whose trailing-{RAU_WINDOW_HOURS}h coverages overlap merge into one
    island [first, last + {RAU_WINDOW_HOURS - 1}]; each island emits two
    deltas (+1 at its start hour, -1 past its end) and a running sum over
    the dense hour grid rebuilds the distinct-user count at every hour.
    Work is O(user-hours) + O(grid): at a trailing-30d window this plan
    does 1x the user-hour pass where the hop-replication plan does 720x.
    Same oracle as rolling_active_users — the value hash doubles as a
    cross-plan equivalence proof.

    The only non-partitioned step is the cumulative sum over the hour GRID
    (span hours, not events — years of hourly grid is ~10^4-10^5 rows, a
    single thin partition by construction); everything user-sized is
    hash-partitioned on user_id."""
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir)
    w_cov = RAU_WINDOW_HOURS - 1
    uh = ev.select(
        "user_id", F.expr("unix_micros(ts) DIV 3600000000").alias("hour_idx")
    ).distinct()
    wu = Window.partitionBy("user_id").orderBy("hour_idx")
    isl = (
        uh.withColumn("prev", F.lag("hour_idx").over(wu))
        .withColumn(
            "new_island",
            (F.col("prev").isNull() | (F.col("hour_idx") > F.col("prev") + w_cov)).cast(
                "int"
            ),
        )
        .withColumn("island_id", F.sum("new_island").over(wu))
    )
    islands = isl.groupBy("user_id", "island_id").agg(
        F.min("hour_idx").alias("s"), (F.max("hour_idx") + w_cov).alias("e")
    )
    deltas = (
        islands.select(F.col("s").alias("h"), F.lit(1).alias("d"))
        .unionAll(islands.select((F.col("e") + 1).alias("h"), F.lit(-1).alias("d")))
        .groupBy("h")
        .agg(F.sum("d").alias("d"))
    )
    span = uh.agg(F.min("hour_idx").alias("h0"), F.max("hour_idx").alias("h1"))
    grid = span.select(F.explode(F.sequence("h0", "h1")).alias("win_idx"))
    wg = Window.orderBy("win_idx").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.join(deltas, grid["win_idx"] == deltas["h"], "left")
        .select("win_idx", F.coalesce("d", F.lit(0)).alias("d"))
        .withColumn("active_users", F.sum("d").over(wg))
        # the hop-replication plan (and the shared oracle) emit a row only
        # for hours with >= 1 active user — a sparse fixture has grid hours
        # where the running sum is 0 (adversarial-sweep catch); drop them
        .where(F.col("active_users") > 0)
        .select(
            F.expr("timestamp_micros(win_idx * 3600000000)").alias("window_end_hour"),
            F.col("active_users").cast("long").alias("active_users"),
        )
    )


# --- PageRank over the co-purchase graph ------------------------------------------

PAGERANK_ITERS = 5
# Scale-9 fixed point: every rank/probability is a BIGINT in nano-units
# (1e9 = 1.0). All arithmetic is explicit integer half-up rounding —
# round(a/b) = (2a + b) div (2b) for positives — written IDENTICALLY in the
# Spark plan and the DuckDB oracle, so the unrolled-SQL value hash is exact
# by construction (no engine-specific decimal rounding rules to mirror, the
# trap the previous DECIMAL(19,18) form had: Spark's adjustPrecisionScale
# double-rounds every product at scale 35 then 18, which DuckDB cannot
# reproduce). Overflow-safe in 64 bits end-to-end: p9, r9 <= 1e9, so the
# contribution product 2*p9*r9 <= 2e18 < 2^63.
PAGERANK_P9 = 1_000_000_000


def _copurchase_weighted_edges(li: DataFrame) -> DataFrame:
    """(src, dst, w): the weighted co-purchase edge list shared by
    pagerank/LPA/k-core. ONE pass over lineitem — group lines by order,
    expand the (bounded, <= order size) part list to ordered pairs IN-ROW
    with nested array transforms, aggregate pair counts. Row-identical to
    the former lineitem self-join on orderkey but with one lineitem
    exchange instead of two plus a join (measured 2.9 s -> 1.8 s for the
    edge build alone at sf0.1, 4.5 s -> 2.9 s at sf1); the same
    basket-expansion shape graph_triangle_clustering uses for wedges. The
    per-order pair blow-up is bounded by max basket size squared — in-row
    work, never a shuffle."""
    g = li.groupBy("l_orderkey").agg(F.collect_list("l_partkey").alias("ps"))
    pairs = g.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ps",
                    lambda x: F.filter(
                        F.transform(
                            "ps", lambda y: F.struct(x.alias("src"), y.alias("dst"))
                        ),
                        lambda s: s["src"] != s["dst"],
                    ),
                )
            )
        ).alias("e")
    )
    return (
        pairs.select("e.src", "e.dst")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )

_PAGERANK_CONTRIB = (
    f"(2 * p9 * r + {PAGERANK_P9}) // (2 * {PAGERANK_P9})"  # round(p9*r / 1e9)
)
_PAGERANK_STEP = "(170 * coalesce(in9, 0) + 100) // 200"  # round(0.85 * in9)


def _pagerank_oracle() -> str:
    it = "r0"
    rounds = []
    for i in range(1, PAGERANK_ITERS + 1):
        rounds.append(f"""
it{i} AS (
  SELECT n.part,
         CAST(b.base9 + {_PAGERANK_STEP} AS BIGINT) AS r
  FROM nodes n CROSS JOIN basec b
  LEFT JOIN (
    SELECT e.dst, sum({_PAGERANK_CONTRIB}) AS in9
    FROM edges e JOIN {it} rk ON e.src = rk.part GROUP BY e.dst
  ) c ON c.dst = n.part
)""")
        it = f"it{i}"
    joined = ",".join(rounds)
    return f"""
WITH li AS (SELECT l_orderkey AS k, l_partkey AS p FROM lineitem),
edges_raw AS (
  SELECT a.p AS src, b.p AS dst, CAST(count(*) AS BIGINT) AS w
  FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p
  GROUP BY 1, 2
),
outw AS (SELECT src, sum(w) AS out_w FROM edges_raw GROUP BY 1),
edges AS (
  SELECT e.src, e.dst,
         CAST((2 * e.w * {PAGERANK_P9} + o.out_w) // (2 * o.out_w) AS BIGINT) AS p9
  FROM edges_raw e JOIN outw o USING (src)
),
nodes AS (SELECT DISTINCT src AS part FROM edges),
basec AS (
  SELECT (2 * 150000000 + count(*)) // (2 * count(*)) AS base9,
         (2 * {PAGERANK_P9} + count(*)) // (2 * count(*)) AS init9
  FROM nodes
),
r0 AS (SELECT part, CAST(b.init9 AS BIGINT) AS r FROM nodes CROSS JOIN basec b),
{joined}
SELECT part, r AS pagerank_e9, CAST(r AS DOUBLE) / CAST({PAGERANK_P9} AS DOUBLE) AS pagerank
FROM it{PAGERANK_ITERS}
"""


@register("pagerank_copurchase", oracle=_pagerank_oracle())
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (parts are linked when they
    appear in the same order; edge weight = co-occurrence count) — product
    importance by random-surfer centrality, the canonical iterative graph
    algorithm alongside the engine's connected components, k-means, and BPE
    loops. {PAGERANK_ITERS} damped power iterations; the co-purchase graph
    is symmetric, so there are no dangling nodes to redistribute.

    Value-hash oracle (upgraded from rows-only in r8, the bpe_train_merges /
    graph_label_propagation precedent): both engines run the SAME scale-9
    fixed-point integer recurrence (see PAGERANK_P9) — the oracle is the
    fixed-round unrolled SQL, one CTE per iteration. Integer sums are exact
    and order-independent under any partitioning, so ranks are byte-stable
    across runs, cluster layouts, AND engines; the 1e-9 quantization is far
    below any ranking-relevant signal (verified against float numpy in
    tests/test_analytics.py at 1e-6).

    Scale: edges come from the shared grouped basket expansion
    (_copurchase_weighted_edges: one lineitem exchange, in-row pair
    blow-up bounded by order size squared — the market-basket shape
    co-occurrence lift already uses); each
    iteration is one (edge join ranks) shuffle on src + one dst-keyed
    aggregate, the textbook distributed PageRank round — now on plain
    BIGINTs, cheaper per row than the previous decimal128 path. Ranks
    persist per round (lineage O(iters), not O(iters^2)); only the
    iteration counter lives on the driver."""
    from ..io import track_checkpoint, track_persist

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges_raw = _copurchase_weighted_edges(li)
    outw = edges_raw.groupBy("src").agg(F.sum("w").alias("out_w"))
    edges = track_persist(
        edges_raw.join(outw, "src").select(
            "src",
            "dst",
            F.expr(
                f"CAST((2 * w * {PAGERANK_P9} + out_w) DIV (2 * out_w) AS BIGINT)"
            ).alias("p9"),
        )
    )
    nodes = track_persist(edges.select(F.col("src").alias("part")).distinct())
    n_nodes = nodes.count()
    base9 = (2 * 150_000_000 + n_nodes) // (2 * n_nodes)
    init9 = (2 * PAGERANK_P9 + n_nodes) // (2 * n_nodes)
    ranks = nodes.select("part", F.lit(init9).cast("long").alias("r"))
    for it in range(PAGERANK_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.part)
            .select(
                "dst",
                F.expr(
                    f"(2 * p9 * r + {PAGERANK_P9}) DIV (2 * {PAGERANK_P9})"
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in9"))
        )
        nxt = (
            nodes.join(contrib, nodes.part == contrib.dst, "left_outer")
            .select(
                "part",
                (
                    F.lit(base9)
                    + F.expr("(170 * coalesce(in9, 0) + 100) DIV 200")
                ).cast("long").alias("r"),
            )
        )
        if (it + 1) % 4 == 0:
            # Lineage truncation every 4 rounds (VERDICT r5 #3): the rank
            # DataFrame otherwise unrolls every prior join into one growing
            # plan, so an evicted cache block recomputes from round 0.
            # localCheckpoint is eager — it IS the per-round materialization
            # (on a real cluster, checkpoint() to the lake for executor-loss
            # tolerance).
            nxt = track_checkpoint(nxt)
        else:
            # persist WITHOUT an eager count (r13): each round's ranks have
            # exactly one consumer (the next round's contrib join), so the
            # cache fills on first use anyway — the former count() was one
            # extra full-plan driver-blocking job per non-checkpoint round.
            nxt = track_persist(nxt)
        ranks = nxt
    # caches stay tracked; the CALLER releases them after its action (the
    # io.track_persist contract) — the returned plan reads the final
    # persisted ranks directly
    return ranks.select(
        "part",
        F.col("r").alias("pagerank_e9"),
        (F.col("r") / F.lit(PAGERANK_P9)).cast("double").alias("pagerank"),
    )


# --- temporal table join (state valid at event time) ------------------------------


@register(
    "temporal_join_orders_state",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS is_change
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
versioned AS (
  SELECT user_id, event_type, ts,
         sum(is_change) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS version
  FROM flagged
),
intervals AS (
  SELECT user_id, version, min(event_type) AS state, min(ts) AS valid_from
  FROM versioned GROUP BY 1, 2
),
bounded AS (
  SELECT user_id, version, state, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to
  FROM intervals
)
SELECT o.o_orderkey,
       o.o_custkey % 16 AS join_key,
       b.state AS state_at_order,
       CAST(b.version AS BIGINT) AS state_version
FROM orders o
LEFT JOIN bounded b
  ON b.user_id = o.o_custkey % 16
 AND b.valid_from <= o.o_orderdate
 AND (o.o_orderdate < b.valid_to OR b.valid_to IS NULL)
""",
)
def temporal_join_orders_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal table join — each order looks up the SCD-2 state interval
    VALID AT its own timestamp (Flink's FOR SYSTEM_TIME AS OF / the
    warehouse dimension-at-transaction-time join), including the NULL-open
    current interval and a NULL state for probes before the key's first
    interval. The oracle is the declarative interval-containment join;
    this side exploits that SCD-2 intervals are CONTIGUOUS (valid_to =
    next valid_from), so 'the interval containing t' reduces to 'the last
    interval starting at or before t' — the as-of tagged-union window, ONE
    key-partitioned shuffle, no interval range join and no |orders| x
    |intervals| expansion. Interval rows sort before probes at equal
    timestamps, giving the inclusive valid_from <= t bound.

    Scale: the interval table is |state runs| (already collapsed); probes
    and intervals co-shuffle once on the key; everything downstream is the
    same window pass the as-of and PIT joins ride."""
    from .relational import CUSTKEY_MOD

    intervals = scd2_user_state_intervals(spark, sf_dir).select(
        F.col("user_id").alias("k"),
        F.col("valid_from").alias("t"),
        F.lit(0).alias("tag"),
        "state",
        "version",
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    probes = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % CUSTKEY_MOD).alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("string").alias("state"),
        F.lit(None).cast("long").alias("version"),
        "o_orderkey",
    )
    # version as the tertiary sort key: two CONSECUTIVE intervals can share
    # valid_from when their boundary events carry the identical timestamp —
    # the containment oracle then deterministically assigns the LATER
    # version (v's valid_to == t makes "t < valid_to" false), so the window
    # must order equal-(t, tag) interval rows by version for last() to pick
    # the same one. No fixture exhibits the tie; the ordering closes the
    # hazard for data that does.
    w = (
        Window.partitionBy("k")
        .orderBy("t", "tag", "version")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = intervals.unionByName(probes).select(
        "*",
        F.last(F.when(F.col("tag") == 0, F.col("state")), ignorenulls=True)
        .over(w)
        .alias("state_at_order"),
        F.last(F.when(F.col("tag") == 0, F.col("version")), ignorenulls=True)
        .over(w)
        .alias("state_version"),
    )
    return carried.filter(F.col("tag") == 1).select(
        "o_orderkey",
        F.col("k").alias("join_key"),
        "state_at_order",
        F.col("state_version").cast("long").alias("state_version"),
    )


# --- time-weighted average value (TWAP) -------------------------------------------


@register(
    "twap_value_per_user",
    oracle="""
WITH seq AS (
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         epoch_us(ts) // 1000000 AS t,
         lead(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t_next
  FROM events
)
SELECT user_id,
       count(*) AS n_holding_periods,
       CAST(sum(t_next - t) AS BIGINT) AS total_seconds,
       CAST(sum(cents * (t_next - t)) AS DOUBLE) / CAST(sum(t_next - t) AS DOUBLE) AS twap_cents
FROM seq WHERE t_next IS NOT NULL AND t_next > t
GROUP BY user_id
""",
)
def twap_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user — each observation weighted by
    how long it REMAINED the latest one (the holding period until the next
    event), the metric finance and monitoring use where a plain mean
    over-counts bursty samplers. Weights and weighted mass are pure BIGINT
    (seconds x cents; both bounded so products stay far inside 2^63), the
    mean is one IEEE division of two exact integers, and zero-length
    holding periods (same-second events) plus each user's open-ended last
    observation are excluded by integer predicates — all cross-engine
    exact by construction.

    Scale: one user-keyed window (lead) and a per-user aggregate on the
    same partitioning — single exchange, the EWMA/LOCF family shape."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.expr("unix_micros(ts) DIV 1000000")
    seq = ev.select(
        "user_id",
        (F.col("value").cast(D2) * 100).cast("long").alias("cents"),
        t.alias("t"),
        F.lead(t).over(w).alias("t_next"),
    )
    dur = F.col("t_next") - F.col("t")
    return (
        seq.filter(F.col("t_next").isNotNull() & (F.col("t_next") > F.col("t")))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_holding_periods"),
            F.sum(dur).alias("total_seconds"),
            (
                F.sum(F.col("cents") * dur).cast("double")
                / F.sum(dur).cast("double")
            ).alias("twap_cents"),
        )
    )


# --- custom Python data source (Spark 4 DataSource API) ---------------------------

PYDS_N = 10_000


@register(
    "python_datasource_events",
    oracle=f"""
WITH gen AS (
  SELECT i,
         (i * 2654435761) % 2147483648 AS h
  FROM (SELECT unnest(range({PYDS_N})) AS i)
)
SELECT i AS event_id,
       CAST(1700000000 + i AS BIGINT) AS ts_epoch_s,
       h % 150 AS user_id,
       (['view', 'click', 'purchase', 'scroll', 'error'])[CAST(h % 5 AS INT) + 1] AS event_type,
       CAST(h % 10000 AS DOUBLE) / 100.0 AS value
FROM gen
""",
)
def python_datasource_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python data source read end to end: {PYDS_N} synthetic
    events generated partition-parallel by
    sources/python_datasource.py::SyntheticEventsSource and value-hash
    compared against a DuckDB range() reconstruction of the SAME integer
    arithmetic — the source (not just a query over it) is under the
    differential gate. sf_dir is unused by design: a generator source has
    no files."""
    from ..sources.python_datasource import register_synthetic_source

    register_synthetic_source(spark)
    return (
        spark.read.format("synthetic_events")
        .option("n", str(PYDS_N))
        .option("partitions", "8")
        .load()
    )


@register(
    "python_datasource_stream_events",
    oracle=f"""
WITH gen AS (
  SELECT i,
         (i * 2654435761) % 2147483648 AS h
  FROM (SELECT unnest(range({PYDS_N})) AS i)
)
SELECT i AS event_id,
       CAST(1700000000 + i AS BIGINT) AS ts_epoch_s,
       h % 150 AS user_id,
       (['view', 'click', 'purchase', 'scroll', 'error'])[CAST(h % 5 AS INT) + 1] AS event_type,
       CAST(h % 10000 AS DOUBLE) / 100.0 AS value
FROM gen
""",
)
def python_datasource_stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING Python data source drained end to end: the same
    {PYDS_N} rows arrive over four micro-batches through
    SimpleDataSourceStreamReader offset bookkeeping (initialOffset ->
    read -> commit, with readBetweenOffsets replayability), land in a
    memory sink, and value-hash match the identical DuckDB oracle the
    batch source uses — a stream==batch==oracle three-way differential
    that pins the offset arithmetic, not just the row content. The drain
    polls until the bounded generator reports exhaustion (a generator
    stream has no file to run dry; production streams never end, so the
    bound is the test harness, not the source)."""
    import time as _time

    from ..sources.python_datasource import register_synthetic_stream_source

    register_synthetic_stream_source(spark)
    name = "pyds_stream_drain"
    df = (
        spark.readStream.format("synthetic_events_stream")
        .option("n", str(PYDS_N))
        .option("batch", str(PYDS_N // 4))
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = _time.time() + 120
        while _time.time() < deadline:
            if spark.table(name).count() >= PYDS_N:
                break
            # 50 ms poll: the four micro-batches land ~0.1-0.3 s apart, so a
            # coarser poll adds up to its own granularity per batch boundary
            # to the drain's wall clock (r13; the count over the memory sink
            # is a local-relation scan, cheap at any cadence).
            _time.sleep(0.05)
        else:
            raise TimeoutError(f"stream drain incomplete: {spark.table(name).count()}/{PYDS_N}")
    finally:
        q.stop()
    return spark.table(name)


# --- interval union coverage (merge overlapping intervals) ------------------------

COVER_HALF_WINDOW_S = 1800  # each event covers ts +/- 30 min


@register(
    "interval_union_coverage",
    oracle=f"""
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) // 1000000 - {COVER_HALF_WINDOW_S} AS s,
         epoch_us(ts) // 1000000 + {COVER_HALF_WINDOW_S} AS e
  FROM events
),
marked AS (
  SELECT user_id, s, e,
         CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS is_new_block
  FROM iv
),
blocks AS (
  SELECT user_id, s, e,
         sum(is_new_block) OVER (PARTITION BY user_id ORDER BY s, e
                                 ROWS UNBOUNDED PRECEDING) AS block_id
  FROM marked
)
SELECT user_id,
       count(DISTINCT block_id) AS n_blocks,
       CAST(sum(block_len) AS BIGINT) AS covered_seconds
FROM (
  SELECT user_id, block_id, max(e) - min(s) AS block_len
  FROM blocks GROUP BY 1, 2
)
GROUP BY user_id
""",
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals coverage per user: every event covers
    +/- {COVER_HALF_WINDOW_S} s, overlapping covers MERGE, and the result
    is how many disjoint activity blocks each user has and their total
    covered seconds — the classic merge-overlapping-intervals problem
    (calendar busy time, sensor uptime, on-call coverage) solved with the
    sort + running-max chain idiom: an interval starts a new block exactly
    when its start exceeds the running max end of everything before it.
    All arithmetic is integer epoch seconds — the window comparison, block
    ids, and lengths are cross-engine exact with no float anywhere.

    Scale: one user-keyed sort feeds the running max, the block-id running
    sum, and (post block-grain aggregate) the rollup — the single-exchange
    gaps-and-islands family (SCD-2, sessionize) with an interval twist:
    the first window's frame must END at 1 PRECEDING, or each interval
    would chain off its own end and never split a block."""
    ev = _events(spark, sf_dir)
    t = F.expr("unix_micros(ts) DIV 1000000")
    iv = ev.select(
        "user_id",
        (t - COVER_HALF_WINDOW_S).alias("s"),
        (t + COVER_HALF_WINDOW_S).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = iv.select(
        "user_id",
        "s",
        "e",
        F.when(F.col("s") > prev_max_e, 1).otherwise(0).alias("is_new_block"),
    )
    blocks = marked.select(
        "user_id",
        "s",
        "e",
        F.sum("is_new_block")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("block_id"),
    )
    per_block = blocks.groupBy("user_id", "block_id").agg(
        (F.max("e") - F.min("s")).alias("block_len")
    )
    return per_block.groupBy("user_id").agg(
        F.count_distinct("block_id").alias("n_blocks"),
        F.sum("block_len").alias("covered_seconds"),
    )


# --- sequential pattern mining (top 3-step paths) ---------------------------------

PATH_TOP_K = 20


@register(
    "top_event_paths",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS nxt1,
         lead(event_type, 2) OVER w AS nxt2
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
paths AS (
  SELECT event_type || '>' || nxt1 || '>' || nxt2 AS path, count(*) AS n
  FROM seq
  WHERE event_type IS NOT NULL AND nxt1 IS NOT NULL AND nxt2 IS NOT NULL
  GROUP BY 1
),
ranked AS (
  SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rnk FROM paths
)
SELECT path, n, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {PATH_TOP_K}
""",
)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining, order three: the top-{PATH_TOP_K} most
    common consecutive event TRIPLES across all users — where the
    first-order transition matrix says what follows one step, this says
    which whole journeys dominate (the n-gram model over behavior instead
    of text; same skeleton as the token vocabulary build). Deterministic
    (ts, event_id) ordering makes every user's sequence, hence every
    path count and the tie-broken ranking, cross-engine exact.

    Scale: one user-keyed window (two leads share the frame) -> one
    path-keyed count with map-side partials -> TakeOrdered top-k; path
    cardinality is |event_types|^3, tiny regardless of corpus size."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("nxt1"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    )
    paths = (
        # all THREE legs must be non-NULL: concat_ws silently skips NULL
        # elements (turning a triple through an untyped event into a fake
        # pair path) while the oracle's || nulls the whole path — both
        # wrong, and divergent (r8 adversarial sweep)
        seq.filter(
            F.col("event_type").isNotNull()
            & F.col("nxt1").isNotNull()
            & F.col("nxt2").isNotNull()
        )
        .select(
            F.concat_ws(">", "event_type", "nxt1", "nxt2").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    topk = paths.orderBy(F.col("n").desc(), "path").limit(PATH_TOP_K)
    return topk.select(
        "path",
        "n",
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("path")))
        .cast("long")
        .alias("rnk"),
    )


# --- CUSUM change detection -------------------------------------------------------

CUSUM_SLACK_CENTS = 500  # half-width of the in-control band
CUSUM_THRESHOLD_CENTS = 20_000  # alarm level


@register(
    "cusum_value_alarms",
    oracle=f"""
WITH base AS (
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         ts, event_id
  FROM events
),
mu AS (
  SELECT user_id, CAST(sum(cents) AS BIGINT) AS tot, count(*) AS n
  FROM base GROUP BY user_id
),
dev AS (
  SELECT b.user_id, b.ts, b.event_id,
         b.cents * m.n - m.tot - {CUSUM_SLACK_CENTS} * m.n AS up_step_scaled,
         sum(b.cents * m.n - m.tot - {CUSUM_SLACK_CENTS} * m.n)
           OVER (PARTITION BY b.user_id ORDER BY b.ts, b.event_id
                 ROWS UNBOUNDED PRECEDING) AS raw_cusum_scaled,
         m.n AS n
  FROM base b JOIN mu m ON b.user_id = m.user_id
)
SELECT user_id,
       count(*) AS n_events,
       CAST(max(raw_cusum_scaled) AS BIGINT) AS peak_scaled,
       CAST(max(raw_cusum_scaled) AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS peak_drift,
       CAST(CASE WHEN max(raw_cusum_scaled) > CAST({CUSUM_THRESHOLD_CENTS} AS BIGINT) * n
            THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM dev
GROUP BY user_id, n
""",
)
def cusum_value_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM upward-drift detection per user: the cumulative sum of
    (value - mean - slack) crossing a threshold is the classic
    change-point alarm (Page's test, the simplified no-reset form whose
    peak statistic still bounds the resetting variant from below). Kept
    integer-exact by scaling through the per-user event count instead of
    dividing by it: cents*n - total - slack*n is BIGINT per row (bounds:
    1e4 cents x 1e4 rows x ... well inside 2^63), the running sum is
    exact, and the only float ops are the final reported drift and one
    integer threshold comparison scaled by the same n.

    Scale: a per-user 1-row aggregate broadcast back over the scan, one
    user-keyed window for the running sum, one rollup — the seasonal-
    anomaly family shape with a sequential statistic on top."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "user_id",
        (F.col("value").cast(D2) * 100).cast("long").alias("cents"),
        "ts",
        "event_id",
    )
    mu = base.groupBy("user_id").agg(
        F.sum("cents").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    dev = base.join(F.broadcast(mu), "user_id").select(
        "user_id",
        "ts",
        "event_id",
        "n",
        (
            F.col("cents") * F.col("n")
            - F.col("tot")
            - F.lit(CUSUM_SLACK_CENTS) * F.col("n")
        ).alias("up_step_scaled"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = dev.select(
        "user_id", "n", F.sum("up_step_scaled").over(w).alias("raw_cusum_scaled")
    )
    return cusum.groupBy("user_id", "n").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("raw_cusum_scaled").alias("peak_scaled"),
        (
            F.max("raw_cusum_scaled").cast("double") / F.col("n").cast("double") / F.lit(100.0)
        ).alias("peak_drift"),
        F.when(
            F.max("raw_cusum_scaled") > F.lit(CUSUM_THRESHOLD_CENTS).cast("long") * F.col("n"),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("alarm"),
    ).drop("n")


# --- trimmed mean (p5-p95 robust center) ------------------------------------------


@register(
    "trimmed_mean_value_by_type",
    oracle="""
WITH cuts AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n_kept,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS trimmed_mean,
       c.lo AS p05, c.hi AS p95
FROM events e JOIN cuts c ON e.event_type = c.event_type
WHERE e.value >= c.lo AND e.value <= c.hi
GROUP BY e.event_type, c.lo, c.hi
""",
)
def trimmed_mean_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% two-sided trimmed mean per event type — the robust center the
    median/MAD outlier pass's sibling: drop everything outside [p05, p95]
    and average what's left, so a handful of extreme values can't move the
    reported center. Cutoffs are the shared linear-interpolated exact
    percentile both engines compute bit-identically; the kept-set mean is
    a DECIMAL sum over one count division; membership is a plain <=
    comparison against the identical cutoff doubles — no tolerance
    anywhere.

    Scale: one percentile aggregate per type (|types| rows) broadcast back
    over the scan, one conditional aggregate — the MAD-outlier family
    shape."""
    ev = _events(spark, sf_dir)
    cuts = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    return (
        ev.join(F.broadcast(cuts), "event_type")
        .filter((F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi")))
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            (
                F.sum(F.col("value").cast(D2)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("trimmed_mean"),
        )
        .select(
            "event_type",
            "n_kept",
            "trimmed_mean",
            F.col("lo").alias("p05"),
            F.col("hi").alias("p95"),
        )
    )


# --- order-independent table checksums (migration validation) ---------------------


@register(
    "table_checksums",
    oracle=f"""
SELECT 'events' AS tbl, count(*) AS n_rows,
       bit_xor({h60_sql("coalesce(CAST(event_id AS VARCHAR), '<NULL>') || '|' || coalesce(CAST(epoch_us(ts) AS VARCHAR), '<NULL>') || '|' || coalesce(CAST(user_id AS VARCHAR), '<NULL>') || '|' || coalesce(event_type, '<NULL>') || '|' || coalesce(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR), '<NULL>') || '|' || coalesce(props, '<NULL>')")}) AS checksum
FROM events
UNION ALL
SELECT 'orders', count(*),
       bit_xor({h60_sql("coalesce(CAST(o_orderkey AS VARCHAR), '<NULL>') || '|' || coalesce(CAST(o_custkey AS VARCHAR), '<NULL>') || '|' || coalesce(o_orderstatus, '<NULL>') || '|' || coalesce(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), '<NULL>') || '|' || coalesce(CAST(epoch_us(o_orderdate) AS VARCHAR), '<NULL>') || '|' || coalesce(o_orderpriority, '<NULL>')")})
FROM orders
UNION ALL
SELECT 'customer', count(*),
       bit_xor({h60_sql("coalesce(CAST(c_custkey AS VARCHAR), '<NULL>') || '|' || coalesce(c_name, '<NULL>') || '|' || coalesce(CAST(c_nationkey AS VARCHAR), '<NULL>') || '|' || coalesce(CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR), '<NULL>') || '|' || coalesce(c_mktsegment, '<NULL>')")})
FROM customer
""",
)
def table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksums — the migration/replica
    validation primitive: per table, the row count plus the XOR of every
    row's canonical-serialization hash. XOR is commutative/associative
    with no overflow, so ANY partitioning, engine, or row order yields
    the same checksum, and a single changed row flips it. Canonical
    serialization pins the cross-engine trap: floats render differently
    per engine, so money fields pass through DECIMAL(18,2) before
    stringification, and timestamps serialize as epoch integers, never
    formatted strings.

    Scale: one scan per table, map-side-combinable count + bit_xor — the
    cheapest possible full-content verification; at 100 TB you run it per
    partition and XOR the partials (which is literally what the aggregate
    already does)."""
    # every field coalesces to an explicit '<NULL>' token BEFORE concat:
    # concat_ws silently SKIPS NULLs (shortening the canonical string and
    # colliding rows that differ only in which field was NULL) while the
    # oracle's || operator nulls the whole row out of the XOR — both wrong,
    # and divergent (r8 adversarial sweep)
    def _nn(c: F.Column) -> F.Column:
        return F.coalesce(c.cast("string"), F.lit("<NULL>"))

    ev = _events(spark, sf_dir)
    ev_canon = F.concat_ws(
        "|",
        _nn(F.col("event_id")),
        _nn(F.unix_micros("ts")),
        _nn(F.col("user_id")),
        _nn(F.col("event_type")),
        _nn(F.col("value").cast(D2)),
        _nn(F.col("props")),
    )
    orders = load_table(spark, sf_dir, "orders")
    o_canon = F.concat_ws(
        "|",
        _nn(F.col("o_orderkey")),
        _nn(F.col("o_custkey")),
        _nn(F.col("o_orderstatus")),
        _nn(F.col("o_totalprice").cast(D2)),
        _nn(F.unix_micros("o_orderdate")),
        _nn(F.col("o_orderpriority")),
    )
    customer = load_table(spark, sf_dir, "customer")
    c_canon = F.concat_ws(
        "|",
        _nn(F.col("c_custkey")),
        _nn(F.col("c_name")),
        _nn(F.col("c_nationkey")),
        _nn(F.col("c_acctbal").cast(D2)),
        _nn(F.col("c_mktsegment")),
    )

    def one(df: DataFrame, name: str, canon: F.Column) -> DataFrame:
        return df.agg(
            F.lit(name).alias("tbl"),
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(h60(canon)).alias("checksum"),
        ).select("tbl", "n_rows", "checksum")

    return (
        one(ev, "events", ev_canon)
        .unionByName(one(orders, "orders", o_canon))
        .unionByName(one(customer, "customer", c_canon))
    )


# --- triangle counting / clustering coefficient over the co-purchase graph -------


@register(
    "graph_triangle_clustering",
    oracle="""
WITH li AS (
  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
),
e AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM li a JOIN li b ON a.k = b.k AND a.p < b.p
),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
  ) GROUP BY node
),
tri AS (
  SELECT ab.u AS a, ab.v AS b, bc.v AS c
  FROM e ab JOIN e bc ON ab.v = bc.u
            JOIN e ac ON ac.u = ab.u AND ac.v = bc.v
),
pt AS (
  SELECT node, count(*) AS triangles FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b AS node FROM tri
    UNION ALL SELECT c AS node FROM tri
  ) GROUP BY node
)
SELECT d.node AS part, CAST(d.degree AS BIGINT) AS degree,
       CAST(COALESCE(pt.triangles, 0) AS BIGINT) AS triangles,
       CASE WHEN d.degree >= 2
            THEN 2.0 * CAST(COALESCE(pt.triangles, 0) AS DOUBLE)
                 / (CAST(d.degree AS DOUBLE) * CAST(d.degree - 1 AS DOUBLE))
            ELSE 0.0 END AS clustering_coeff
FROM deg d LEFT JOIN pt ON pt.node = d.node
""",
)
def graph_triangle_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counts and local clustering coefficients over the part
    co-purchase graph (the same graph ``pagerank_copurchase`` ranks) — the
    cohesion diagnostic behind community detection and recommendation
    neighborhoods.

    Scale shape (Suri & Vassilvitskii's degree ordering + the edge-iterator
    over collected adjacency arrays): every undirected edge is ORIENTED from
    its lower-(degree, id) endpoint to its higher one, which hard-bounds any
    node's out-neighborhood at sqrt(2m) regardless of how hot a Zipf-head
    product is (outdeg d implies d neighbors of degree >= d, so d^2 <= 2m) —
    total intersection work is O(m^1.5) instead of sum(deg^2), which is what
    dies on skewed graphs at 100 TB. Triangles close per EDGE: collect each
    node's out-neighbor array once (<= sqrt(2m) entries, a few MB worst case
    even at m = 10^12), join it onto both endpoints of every oriented edge,
    and intersect JVM-side (array_intersect) — each triangle {a,b,c} with
    rank a<b<c is found exactly once, at edge (a,b) with witness c. This
    replaces the classic wedge self-join + closing equi-join, whose
    intermediate IS the wedge set: measured at sf0.1 that plan shuffles 41M
    wedge rows against 1.2M edges (34x amplification, and the ratio grows
    with density); the edge-iterator's largest shuffle is the m-entry
    adjacency list itself. Corner credits (x and y each get |common|, every
    witness gets 1) ride one explode into the per-node sum. The DuckDB
    oracle orients by id instead — a different enumeration order of the
    SAME triangle set, so results hash-match while the Spark plan keeps the
    skew bound. Coefficient = 2T / (deg*(deg-1)), one exact division."""
    from ..io import track_persist

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    # basket expansion (the _copurchase_weighted_edges shape, VERDICT r10
    # #7): group lines by order and emit ordered pairs IN-ROW — one
    # lineitem exchange instead of the former li-self-join's two plus a
    # shuffle join; per-order blow-up is bounded by basket size squared,
    # in-row work. The edge set feeds degree counting AND both orientation
    # joins; as pure lineage the basket expansion would run three times.
    g = li.groupBy("k").agg(F.collect_list("p").alias("ps"))
    e = track_persist(
        g.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ps",
                        lambda x: F.filter(
                            F.transform(
                                "ps", lambda y: F.struct(x.alias("u"), y.alias("v"))
                            ),
                            lambda s: s["u"] < s["v"],
                        ),
                    )
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
    )
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # total order for orientation: (degree, id) packed into one BIGINT
    # (ids < 2^32 in every fixture; at lake scale widen to a struct compare)
    dk = deg.select("node", (F.col("degree") * F.lit(1 << 32) + F.col("node")).alias("rkey"))
    ek = (
        e.join(dk.select(F.col("node").alias("u"), F.col("rkey").alias("ku")), "u")
        .join(dk.select(F.col("node").alias("v"), F.col("rkey").alias("kv")), "v")
    )
    # the oriented adjacency feeds the neighbor-list build AND the per-edge
    # probe; as pure lineage the orientation joins would run twice
    adj = track_persist(
        ek.select(
            F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("x"),
            F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("y"),
        )
    )
    adj_list = adj.groupBy("x").agg(F.collect_list("y").alias("nbrs"))
    # left join for ny: maximal-rank nodes have no out-edges and no list row
    edges = (
        adj.join(adj_list.select("x", F.col("nbrs").alias("nx")), "x")
        .join(adj_list.select(F.col("x").alias("y"), F.col("nbrs").alias("ny")), "y", "left")
    )
    common = F.array_intersect(F.col("nx"), F.coalesce(F.col("ny"), F.array()))
    tri_e = edges.select("x", "y", common.alias("common")).filter(F.size("common") > 0)
    credits = tri_e.select(
        F.explode(
            F.concat(
                F.array(
                    F.struct(F.col("x").alias("node"), F.size("common").cast("long").alias("w")),
                    F.struct(F.col("y").alias("node"), F.size("common").cast("long").alias("w")),
                ),
                F.expr("transform(common, c -> struct(c AS node, 1L AS w))"),
            )
        ).alias("cr")
    )
    per_node = (
        credits.groupBy(F.col("cr.node").alias("node"))
        .agg(F.sum("cr.w").alias("triangles"))
    )
    tri_n = F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
    coeff = (F.lit(2.0) * tri_n.cast("double")) / (
        F.col("degree").cast("double") * (F.col("degree") - F.lit(1)).cast("double")
    )
    return deg.join(per_node, "node", "left").select(
        F.col("node").alias("part"),
        F.col("degree").cast("long").alias("degree"),
        tri_n.alias("triangles"),
        F.when(F.col("degree") >= 2, coeff).otherwise(F.lit(0.0)).alias("clustering_coeff"),
    )


# --- incremental JOIN-view maintenance (delta-join merge == recompute) -----------


@register(
    "incremental_join_view_merge",
    oracle="""
SELECT c.c_nationkey AS nationkey,
       CAST(year(o.o_orderdate) * 100 + month(o.o_orderdate) AS BIGINT) AS ym,
       count(*) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
""",
)
def incremental_join_view_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view, proven against full
    recompute: the (nation, month) order-revenue view — a fact⋈dim join
    plus aggregate — is maintained as base_view MERGE delta_view, where
    the delta path joins ONLY the new fact rows (last third of orders by
    o_orderkey) against the static customer dim. For insert-only fact
    deltas over a static dim, ΔV = Δfact ⋈ dim — the view-maintenance
    identity this query makes the value-hash gate prove (the oracle is the
    direct full join+aggregate; any double-count or missed delta row
    breaks the hash). The companion ``incremental_agg_union_merge`` proves
    the aggregate-only case; together they are the nightly-refresh recipe:
    never re-join the base fact table, join the delta and merge partials.

    Scale: the dim side broadcasts (or bucket-joins at lake scale); both
    partial views and the merge group on (nationkey, ym), so one hash
    partitioning serves all three aggregates with map-side combine;
    DECIMAL partials make the merge exact under any partitioning."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    mx = orders.agg(F.max("o_orderkey").alias("max_id"))
    tagged = orders.crossJoin(F.broadcast(mx)).withColumn(
        "is_old", F.col("o_orderkey") <= F.expr("(max_id * 2) DIV 3")
    )
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long").alias("ym")
    # the delta path and the base path are the SAME plan over disjoint
    # slices — each joins its slice to the broadcast dim and pre-aggregates
    partial = (
        tagged.join(F.broadcast(customer), tagged.o_custkey == customer.c_custkey)
        .select(F.col("c_nationkey").alias("nationkey"), ym, "is_old", "o_totalprice")
        .groupBy("nationkey", "ym", "is_old")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("o_totalprice").cast(D2)).alias("ps"),
        )
    )
    return partial.groupBy("nationkey", "ym").agg(
        F.sum("pn").alias("n_orders"),
        F.sum("ps").cast("double").alias("revenue"),
    )


# --- deterministic A/B experiment statistics --------------------------------------

AB_SALT = "ab"  # decorrelates variant assignment from every other h60 coin

# Shared formula text: the scalar statistics are derived doubles whose VALUE
# depends on operation order, so both engines evaluate the IDENTICAL
# expression tree over the same exact BIGINT inputs.
_AB_STATS_SQL = """
  CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 AS mean_a,
  CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0 AS mean_b,
  CASE WHEN n_a <= 1 THEN 0.0 ELSE
    (CAST(s2_a AS DOUBLE) - (CAST(s1_a AS DOUBLE) * CAST(s1_a AS DOUBLE)) / CAST(n_a AS DOUBLE))
      / CAST(n_a - 1 AS DOUBLE) END AS var_a,
  CASE WHEN n_b <= 1 THEN 0.0 ELSE
    (CAST(s2_b AS DOUBLE) - (CAST(s1_b AS DOUBLE) * CAST(s1_b AS DOUBLE)) / CAST(n_b AS DOUBLE))
      / CAST(n_b - 1 AS DOUBLE) END AS var_b
"""
_AB_T_SQL = """
  (mean_a - mean_b) / sqrt(var_a / 10000.0 / CAST(n_a AS DOUBLE)
                           + var_b / 10000.0 / CAST(n_b AS DOUBLE)) AS t_stat
"""
# A degenerate 2x2 margin (nobody / everybody converted, or an empty arm)
# makes chi-squared undefined; both engines emit 0.0 for that case instead
# of one erroring (Spark ANSI) while the other returns inf (DuckDB).
_AB_CHI_SQL = """
  CASE WHEN conv_a + conv_b = 0 OR (n_a - conv_a) + (n_b - conv_b) = 0
            OR n_a = 0 OR n_b = 0 THEN 0.0 ELSE
  CAST(n_a + n_b AS DOUBLE)
    * (CAST(conv_a AS DOUBLE) * CAST(n_b - conv_b AS DOUBLE)
       - CAST(n_a - conv_a AS DOUBLE) * CAST(conv_b AS DOUBLE))
    * (CAST(conv_a AS DOUBLE) * CAST(n_b - conv_b AS DOUBLE)
       - CAST(n_a - conv_a AS DOUBLE) * CAST(conv_b AS DOUBLE))
    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
       * CAST(conv_a + conv_b AS DOUBLE)
       * CAST((n_a - conv_a) + (n_b - conv_b) AS DOUBLE)) END AS chi2_conversion
"""


@register(
    "ab_test_stats",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
v AS (
  SELECT {h60_sql(f"'{AB_SALT}' || CAST(user_id AS VARCHAR)")} % 2 AS variant,
         cents, converted
  FROM per_user
),
g AS (
  SELECT variant, count(*) AS n, sum(cents) AS s1,
         sum(cents * cents) AS s2, sum(converted) AS conv
  FROM v GROUP BY variant
),
one AS (
  SELECT
    CAST(sum(CASE WHEN variant = 0 THEN n ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN variant = 1 THEN n ELSE 0 END) AS BIGINT) AS n_b,
    CAST(sum(CASE WHEN variant = 0 THEN s1 ELSE 0 END) AS BIGINT) AS s1_a,
    CAST(sum(CASE WHEN variant = 1 THEN s1 ELSE 0 END) AS BIGINT) AS s1_b,
    CAST(sum(CASE WHEN variant = 0 THEN s2 ELSE 0 END) AS BIGINT) AS s2_a,
    CAST(sum(CASE WHEN variant = 1 THEN s2 ELSE 0 END) AS BIGINT) AS s2_b,
    CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
    CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
  FROM g
),
stats AS (
  SELECT *, {_AB_STATS_SQL} FROM one
)
SELECT n_a, n_b, conv_a, conv_b, mean_a, mean_b, var_a, var_b,
       {_AB_T_SQL},
       {_AB_CHI_SQL}
FROM stats
""",
)
def ab_test_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B experiment readout: users are hash-assigned to two
    variants ({AB_SALT!r}-salted h60 coin — reproducible, uncorrelated with
    every other sampler), the per-user revenue metric is Welch-tested and
    the purchase-conversion 2x2 gets a chi-squared statistic. The canonical
    product-analytics pass, computed exactly: per-user cent totals and
    their squares are BIGINT power sums (exact under any partitioning /
    merge order), and every derived double (means in currency units,
    variances, t, chi2) is the IDENTICAL expression tree over those exact
    integers in both engines — so even the test statistics are value-hash
    checked, not approximated. (Bound: cents^2 sums stay under 2^63 up to
    ~3e9-cent users x 1e9 users; beyond that swap s2 to DECIMAL(38,0).)

    Scale: one user-keyed aggregate (map-side combinable) -> a 2-row
    variant aggregate -> a 1-row conditional pivot. Nothing after the
    first shuffle exceeds two rows."""
    per_user = _events(spark, sf_dir).groupBy("user_id").agg(
        F.sum(F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")).alias("cents"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted"),
    )
    v = per_user.select(
        (h60(F.concat(F.lit(AB_SALT), F.col("user_id").cast("string"))) % 2).alias("variant"),
        "cents",
        "converted",
    )
    g = v.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
        F.sum("converted").alias("conv"),
    )
    one = g.agg(
        *[
            F.sum(F.when(F.col("variant") == var, F.col(c)).otherwise(0))
            .cast("long")
            .alias(f"{c2}_{'a' if var == 0 else 'b'}")
            for var, c, c2 in [
                (0, "n", "n"), (1, "n", "n"),
                (0, "s1", "s1"), (1, "s1", "s1"),
                (0, "s2", "s2"), (1, "s2", "s2"),
                (0, "conv", "conv"), (1, "conv", "conv"),
            ]
        ]
    )
    stats = one.selectExpr("*", *[e.strip() for e in _AB_STATS_SQL.split(",\n")])
    return stats.selectExpr(
        "n_a", "n_b", "conv_a", "conv_b", "mean_a", "mean_b", "var_a", "var_b",
        _AB_T_SQL.strip(),
        _AB_CHI_SQL.strip(),
    )


# --- last-touch conversion attribution --------------------------------------------

ATTR_TOUCH_TYPES = ("view", "click")
ATTR_WINDOW_US = 24 * 3600 * 1_000_000  # 24 h lookback


@register(
    "attribution_last_touch",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         CAST(value AS DECIMAL(18,2)) AS v,
         last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type,
         last_value(CASE WHEN event_type IN ('view', 'click') THEN epoch_us(ts) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_us
  FROM events
),
attributed AS (
  SELECT CASE WHEN touch_type IS NOT NULL AND us - touch_us <= {ATTR_WINDOW_US}
              THEN touch_type ELSE 'direct' END AS channel, v
  FROM seq WHERE event_type = 'purchase'
)
SELECT channel, count(*) AS n_purchases,
       CAST(sum(v) AS DOUBLE) AS revenue
FROM attributed GROUP BY channel
""",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: every purchase is credited to the
    user's most recent preceding view/click within a 24 h lookback (older
    or absent touches fall to 'direct'), rolled up to purchases + revenue
    per channel — the canonical marketing-attribution pass. The touch is a
    strictly-before ignore-nulls last_value over the (epoch, event_id)
    order (frame excludes the current row, so a purchase can never
    attribute to itself); timestamps compare as integer microseconds, so
    the lookback is timezone-free in both engines; revenue sums in DECIMAL.

    Scale: one user-keyed window partitioning (both last_value columns
    share it — one exchange), then a channel aggregate over purchases
    only; state per user is O(1)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr("unix_micros(ts)"), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_t = F.last(
        F.when(F.col("event_type").isin(*ATTR_TOUCH_TYPES), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    touch_us = F.last(
        F.when(F.col("event_type").isin(*ATTR_TOUCH_TYPES), F.expr("unix_micros(ts)")),
        ignorenulls=True,
    ).over(w)
    seq = _events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
        F.col("value").cast(D2).alias("v"),
        touch_t.alias("touch_type"),
        touch_us.alias("touch_us"),
    )
    attributed = seq.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("touch_type").isNotNull()
            & (F.col("us") - F.col("touch_us") <= ATTR_WINDOW_US),
            F.col("touch_type"),
        )
        .otherwise(F.lit("direct"))
        .alias("channel"),
        "v",
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("v").cast("double").alias("revenue"),
    )


# --- autocorrelation of the hourly series -----------------------------------------


@register(
    "ts_autocorr_components",
    oracle="""
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
),
agg AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT g.user_id, g.hour, coalesce(a.x, 0) AS x
  FROM grid g LEFT JOIN agg a ON a.user_id = g.user_id AND a.hour = g.hour
),
lagged AS (
  SELECT user_id, x,
         lag(x, 1) OVER (PARTITION BY user_id ORDER BY hour) AS x1,
         lag(x, 2) OVER (PARTITION BY user_id ORDER BY hour) AS x2
  FROM series
),
suff AS (
  SELECT user_id,
         count(*) AS n_hours,
         CAST(sum(x) AS BIGINT) AS s_cents,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(CASE WHEN x1 IS NOT NULL THEN x * x1 END) AS BIGINT) AS sxy1,
         CAST(sum(CASE WHEN x1 IS NOT NULL THEN x END) AS BIGINT) AS head1,
         CAST(sum(x1) AS BIGINT) AS tail1,
         CAST(sum(CASE WHEN x2 IS NOT NULL THEN x * x2 END) AS BIGINT) AS sxy2,
         CAST(sum(CASE WHEN x2 IS NOT NULL THEN x END) AS BIGINT) AS head2,
         CAST(sum(x2) AS BIGINT) AS tail2
  FROM lagged GROUP BY user_id HAVING count(*) >= 3
),
d AS (
  SELECT user_id, n_hours, s_cents, sxx, sxy1, sxy2,
         CAST(n_hours AS DOUBLE) AS nd, CAST(s_cents AS DOUBLE) AS sd,
         CAST(sxx AS DOUBLE) AS sxxd,
         CAST(sxy1 AS DOUBLE) AS sxy1d, CAST(head1 AS DOUBLE) AS h1d, CAST(tail1 AS DOUBLE) AS t1d,
         CAST(sxy2 AS DOUBLE) AS sxy2d, CAST(head2 AS DOUBLE) AS h2d, CAST(tail2 AS DOUBLE) AS t2d
  FROM suff
)
SELECT user_id, n_hours, s_cents, sxx, sxy1, sxy2,
       CASE WHEN nd * nd * sxxd - nd * sd * sd <> 0.0 THEN
         (nd * nd * sxy1d - nd * sd * (h1d + t1d) + (nd - 1.0) * sd * sd)
           / (nd * nd * sxxd - nd * sd * sd) END AS r1,
       CASE WHEN nd * nd * sxxd - nd * sd * sd <> 0.0 THEN
         (nd * nd * sxy2d - nd * sd * (h2d + t2d) + (nd - 2.0) * sd * sd)
           / (nd * nd * sxxd - nd * sd * sd) END AS r2
FROM d
""",
)
def ts_autocorr_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1/lag-2 sample autocorrelation of each user's zero-filled hourly
    value series (the seasonality probe a forecasting pipeline runs before
    picking model order). The estimator is the textbook
    r_k = sum_(t>k) (x_t - m)(x_(t-k) - m) / sum_t (x_t - m)^2 cleared of
    divisions: both sides are expanded over exact BIGINT sufficient
    statistics in integer cents (n^2*sxy_k - n*s*(head_k + tail_k) +
    (n-k)*s^2 over n^2*sxx - n*s^2), so the only float work is one fixed
    IEEE expression per row, identical on both engines — no libm, no
    order-dependent accumulation, value-hash exact.

    Scale shape: gapfilled grid as in timeseries_hourly_gapfill (grid is
    |users| x |hours|, independent of event count), one per-user window for
    the two lags (partition-local sort, no global ordering), one hash
    aggregate for the sufficient statistics. Constant-width state per user;
    at 100 TB the lag window's input is the already-downsampled hourly
    series, not the raw stream."""
    ev = _events(spark, sf_dir)
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        "user_id", F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour")
    )
    agg = ev.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        (F.sum(F.col("value").cast(D2)) * 100).cast("long").alias("x")
    )
    series = grid.join(agg, ["user_id", "hour"], "left").select(
        "user_id", "hour", F.coalesce("x", F.lit(0)).alias("x")
    )
    w = Window.partitionBy("user_id").orderBy("hour")
    lagged = series.select(
        "user_id",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 2).over(w).alias("x2"),
    )
    suff = (
        lagged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum("x").alias("s_cents"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.when(F.col("x1").isNotNull(), F.col("x") * F.col("x1"))).alias("sxy1"),
            F.sum(F.when(F.col("x1").isNotNull(), F.col("x"))).alias("head1"),
            F.sum("x1").alias("tail1"),
            F.sum(F.when(F.col("x2").isNotNull(), F.col("x") * F.col("x2"))).alias("sxy2"),
            F.sum(F.when(F.col("x2").isNotNull(), F.col("x"))).alias("head2"),
            F.sum("x2").alias("tail2"),
        )
        .filter(F.col("n_hours") >= 3)
    )
    d = suff.select(
        "user_id",
        "n_hours",
        "s_cents",
        "sxx",
        "sxy1",
        "sxy2",
        F.col("n_hours").cast("double").alias("nd"),
        F.col("s_cents").cast("double").alias("sd"),
        F.col("sxx").cast("double").alias("sxxd"),
        F.col("sxy1").cast("double").alias("sxy1d"),
        F.col("head1").cast("double").alias("h1d"),
        F.col("tail1").cast("double").alias("t1d"),
        F.col("sxy2").cast("double").alias("sxy2d"),
        F.col("head2").cast("double").alias("h2d"),
        F.col("tail2").cast("double").alias("t2d"),
    )
    # the SQL text below mirrors the oracle token-for-token so both engines
    # build the identical IEEE expression tree (left-associative * and -)
    den = "nd * nd * sxxd - nd * sd * sd"
    r1 = (
        f"CASE WHEN {den} <> 0.0 THEN "
        f"(nd * nd * sxy1d - nd * sd * (h1d + t1d) + (nd - 1.0) * sd * sd) / ({den}) END"
    )
    r2 = (
        f"CASE WHEN {den} <> 0.0 THEN "
        f"(nd * nd * sxy2d - nd * sd * (h2d + t2d) + (nd - 2.0) * sd * sd) / ({den}) END"
    )
    return d.select(
        "user_id",
        "n_hours",
        "s_cents",
        "sxx",
        "sxy1",
        "sxy2",
        F.expr(r1).alias("r1"),
        F.expr(r2).alias("r2"),
    )


# --- label propagation communities (synchronous, weighted, deterministic) ---------

LPA_ROUNDS = 3
# Round budget for the fixpoint=True variants of graph_label_propagation /
# graph_kcore (the dedup_clusters MAX_CC_ITERATIONS discipline): measured
# convergence on the fixtures is 5-7 rounds (LPA) and 3-22 (k-core peel,
# O(degeneracy) — the r11 k = ceil(0.7 x mean) sits near the fixtures'
# degeneracy, where the peel cascade is longest: 22 rounds at sf0.1); 30
# still fails loudly on an oscillating or pathological graph.
GRAPH_MAX_FIXPOINT_ROUNDS = 30


def _round_break(df, lineage: str):
    """Per-round lineage break for the fixed-round iterative-graph loops —
    the two measured forms (VERDICT r10 #3, the iterative-family drift
    probe):

    - "checkpoint": eager localCheckpoint — truncates the LOGICAL plan to a
      checkpoint leaf. Mandatory for the fixpoint variants (k-core's alive
      set is referenced twice per round, so pure lineage doubles per round
      — a 22-round fixpoint would hand the analyzer a ~4M-leaf plan), but
      materializes every round's full set eagerly through the RDD path,
      which is where the cross-session host/IO sensitivity concentrated.
    - "cache": persist — lineage still nests (bounded: 2^ROUNDS leaves at
      k-core's 4 rounds = 16 cached-relation hits, linear for LPA), but
      execution computes each round once, AQE stays on for the whole plan,
      and nothing is eagerly materialized per round.

    tools/graph_watch.py times both forms head-to-head in one session
    (results sealed in GRAPH_WATCH.json). MEASURED KEEP DECISION (r11):
    checkpoint stays the registered default. At sf0.1 cache is 1.06-1.11x
    faster on min-of-3 — inside run noise — but at sf1 the cache form
    LOSES: LPA 0.78x on min, and k-core's cache runs swing 6.5/11.6/52.4 s
    (the nested 2^rounds lineage recomputes when executor storage evicts a
    round under memory pressure — precisely the failure a 1000-executor
    run cannot afford), while the checkpoint form's worst run is 8.7 s.
    The r9/r10 cross-session drift on this family is therefore host/IO
    noise on the eager materialization, not a fixable plan defect; the
    GRAPH_WATCH two-session min+median panel is the sealed reference band
    for future regression claims."""
    from ..io import track_checkpoint, track_persist

    return track_checkpoint(df) if lineage == "checkpoint" else track_persist(df)

# MATERIALIZED is load-bearing (the corpus.py BPE precedent): the edges CTE
# is referenced by every unrolled round, and DuckDB would otherwise inline
# and re-run the lineitem self-join once per round (~3x the whole oracle).
_LPA_EDGE_CTES = """
li AS (SELECT l_orderkey, l_partkey FROM lineitem),
edges AS MATERIALIZED (
  SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS w
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
),
l0 AS (SELECT DISTINCT src AS part, src AS lab FROM edges)
"""


def _lpa_round_sql(r: int) -> str:
    # MATERIALIZED is load-bearing (the BPE-oracle precedent): the final
    # round is referenced twice (labels + sizes) and each round feeds the
    # next, so without the hint DuckDB re-inlines the whole chain per
    # reference (measured 43 s -> 5.5 s at sf0.1, identical rows).
    return f"""
v{r} AS MATERIALIZED (
  SELECT e.dst AS part, l.lab, sum(e.w) AS wv
  FROM edges e JOIN l{r - 1} l ON l.part = e.src
  GROUP BY 1, 2
),
l{r} AS MATERIALIZED (
  SELECT part, min(struct_pack(nw := -wv, l := lab)).l AS lab
  FROM v{r} GROUP BY part
)"""


@register(
    "graph_label_propagation",
    oracle=f"""
WITH {_LPA_EDGE_CTES},
{",".join(_lpa_round_sql(r) for r in range(1, LPA_ROUNDS + 1))},
sizes AS (SELECT lab, count(*) AS community_size FROM l{LPA_ROUNDS} GROUP BY lab)
SELECT f.part, f.lab AS community, s.community_size
FROM l{LPA_ROUNDS} f JOIN sizes s ON s.lab = f.lab
""",
)
def graph_label_propagation(
    spark: SparkSession, sf_dir: str, fixpoint: bool = False,
    lineage: str = "checkpoint",
) -> DataFrame:
    """Community detection by synchronous weighted label propagation
    (Raghavan et al. 2007) over the part co-purchase graph ({LPA_ROUNDS}
    fixed rounds): every node starts as its own label; each round a node
    adopts the label with the largest incoming co-purchase weight among its
    neighbors' CURRENT labels, ties broken to the smaller label — the
    (-weight, label) struct-min makes the whole algorithm deterministic, so
    the unrolled SQL mirror is value-hash exact. Distinct from the
    connected-components family (dedup_clusters_star): LPA partitions a
    CONNECTED graph into densely-linked communities; min-label CC would
    collapse it to one component.

    fixpoint=True switches from the fixed {LPA_ROUNDS}-round unroll (the
    oracle-matched registered shape) to loop-until-no-label-changes with a
    {GRAPH_MAX_FIXPOINT_ROUNDS}-round budget, raising on non-convergence —
    the dedup_clusters discipline. Synchronous LPA can 2-cycle on
    pathological graphs; the raise makes that loud instead of returning a
    non-fixpoint labeling (measured: the fixture converges in 5 rounds at
    sf0.001, 7 at sf0.01 — tests/test_analytics.py pins budget headroom).
    The per-round convergence check costs one count() scalar on the driver,
    never data.

    Scale: the graph is symmetric so every node appears as a dst — one
    vote-join (shuffle on src) + one (part, lab) aggregate + one argmax per
    round, all map-side combinable; labels persist per round and the loop
    count is fixed, so the DAG is {LPA_ROUNDS} joined stages, the same
    batch-iterative shape as pagerank_copurchase. Hub skew lands on the
    vote aggregate key (dst, lab) — two-level, not per-dst — and AQE
    splits any residual hot key."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    from ..io import track_checkpoint, track_persist

    # repartition("src") before persist: the per-round vote join hashes on
    # src, so caching the edge list already src-partitioned means each round
    # shuffles only the (small) label side — without it every round re-moves
    # all m edge rows, the dominant network cost of the loop at cluster scale
    # (the groupBy leaves the cache partitioned by (src, dst), which the
    # src-equi-join cannot reuse). Measured at sf0.1: 5.3 s -> 4.6 s warm.
    edges = track_persist(_copurchase_weighted_edges(li).repartition("src"))
    labels = edges.select(F.col("src").alias("part")).distinct().select(
        "part", F.col("part").alias("lab")
    )
    if fixpoint:
        labels = track_checkpoint(labels)
    rounds = GRAPH_MAX_FIXPOINT_ROUNDS if fixpoint else LPA_ROUNDS
    converged = not fixpoint
    for _ in range(rounds):
        # One exchange per round, not two (VERDICT r13 #3, guide §2.4): the
        # vote aggregate keys on (dst, lab) and the argmax on dst — planned
        # naively that is Exchange(hash(dst,lab)) THEN Exchange(hash(dst)).
        # An explicit repartition on dst alone satisfies BOTH clustered
        # distributions (hash(dst) clusters (dst, lab) too — subset-key
        # partitioning), so the vote sum and the argmax both run
        # partition-local after a single shuffle of the raw vote rows.
        # Values are partitioning-independent (oracle-checked); measured
        # same-session A/B below. AQE still coalesces the keyless-N
        # repartition output.
        votes = (
            edges.join(labels, edges.src == labels.part)
            .select("dst", "lab", "w")
            .repartition("dst")
            .groupBy("dst", "lab")
            .agg(F.sum("w").alias("wv"))
        )
        # per-round lineage break (labels feed the next round once, so the
        # cache form's plan growth is LINEAR here); fixpoint keeps the
        # eager checkpoint so the convergence count() per round stays cheap.
        new_labels = _round_break(
            votes.groupBy("dst")
            .agg(F.min(F.struct((-F.col("wv")).alias("nw"), F.col("lab").alias("l"))).alias("m"))
            .select(F.col("dst").alias("part"), F.col("m.l").alias("lab")),
            "checkpoint" if fixpoint else lineage,
        )
        if fixpoint:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "part")
                .filter(F.col("n.lab") != F.col("o.lab"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                converged = True
                break
        else:
            labels = new_labels
    if not converged:
        raise RuntimeError(
            f"graph_label_propagation did not reach a fixpoint within "
            f"{GRAPH_MAX_FIXPOINT_ROUNDS} rounds — synchronous LPA can "
            f"oscillate on pathological graphs; inspect the label 2-cycle "
            f"or switch to the fixed-round variant"
        )
    sizes = labels.groupBy("lab").agg(F.count(F.lit(1)).alias("community_size"))
    return labels.join(sizes, "lab").select(
        "part", F.col("lab").alias("community"), "community_size"
    )


# --- compaction planning over the partition/file inventory ------------------------

COMPACT_TARGET_DENOM = 16  # target bin size = total_bytes / 16 (corpus-relative)


@register(
    "compaction_plan",
    oracle=f"""
WITH files AS (
  SELECT date_trunc('month', o_orderdate) AS part_month,
         count(*) AS n_rows,
         CAST(count(*) * 32
              + sum(strlen(o_orderstatus) + strlen(o_orderpriority)) AS BIGINT) AS bytes
  FROM orders GROUP BY 1
),
tgt AS (
  SELECT greatest(CAST(sum(bytes) AS BIGINT) // {COMPACT_TARGET_DENOM}, 1) AS target
  FROM files
),
ordered AS (
  SELECT f.part_month, f.n_rows, f.bytes, t.target,
         coalesce(sum(f.bytes) OVER (ORDER BY f.part_month
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM files f CROSS JOIN tgt t
)
SELECT CAST(cum_before // target AS BIGINT) AS compaction_group,
       count(*) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS group_bytes,
       CAST(sum(n_rows) AS BIGINT) AS group_rows,
       min(part_month) AS first_month,
       max(part_month) AS last_month,
       min(target) AS target_bytes
FROM ordered
GROUP BY 1
""",
)
def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the OPTIMIZE/bin-pack step of
    lakehouse table maintenance, planned over the partition inventory
    (monthly order partitions with a deterministic byte proxy). Files walk
    in partition order and file i lands in bin floor(cum_bytes_before /
    target); the target is corpus-relative (total/{COMPACT_TARGET_DENOM}),
    so the plan scales with the table instead of hardcoding a byte count.
    This is the distributed analog of sequential first-fit: bins are
    contiguous in sort order (rewrites stay partition-local and
    time-clustered) and every bin lands in (target - max_file, target +
    max_file).

    Scale: the inventory is METADATA — one row per file/partition, millions
    of rows at 100 TB, not billions — so the single-ordered window over it
    is deliberate (same justification as token_shard_assembly's offset
    table: tiny global structures are fine; row-scale global windows are
    not). The byte aggregation below it is a plain map-side-combined
    groupBy of the fact table; in production the inventory comes free from
    the table manifest and the fact scan disappears entirely."""
    orders = load_table(spark, sf_dir, "orders")
    files = orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("part_month")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.count(F.lit(1)) * 32
            + F.sum(F.length("o_orderstatus") + F.length("o_orderpriority"))
        ).cast("long").alias("bytes"),
    )
    tgt = files.agg(
        F.greatest(
            F.expr(f"sum(bytes) DIV {COMPACT_TARGET_DENOM}"), F.lit(1).cast("long")
        ).alias("target")
    )
    w = Window.orderBy("part_month").rowsBetween(Window.unboundedPreceding, -1)
    ordered = files.crossJoin(F.broadcast(tgt)).select(
        "part_month",
        "n_rows",
        "bytes",
        "target",
        F.coalesce(F.sum("bytes").over(w), F.lit(0)).alias("cum_before"),
    )
    return (
        ordered.groupBy(F.expr("cum_before DIV target").cast("long").alias("compaction_group"))
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").cast("long").alias("group_bytes"),
            F.sum("n_rows").cast("long").alias("group_rows"),
            F.min("part_month").alias("first_month"),
            F.max("part_month").alias("last_month"),
            F.min("target").alias("target_bytes"),
        )
    )


# --- k-core decomposition (fixed-round peeling) ------------------------------------

KCORE_ROUNDS = 4


def _kcore_round_sql(r: int) -> str:
    return f"""
d{r} AS (
  SELECT e.src AS part, count(*) AS deg
  FROM edges e JOIN a{r - 1} s ON s.part = e.src JOIN a{r - 1} t ON t.part = e.dst
  GROUP BY 1
),
a{r} AS (SELECT part, deg FROM d{r}, kk WHERE deg >= kk.k)"""


@register(
    "graph_kcore",
    oracle=f"""
WITH {_LPA_EDGE_CTES},
kk AS (
  SELECT CAST((7 * count(*) + 10 * count(DISTINCT src) - 1) // (10 * count(DISTINCT src)) AS BIGINT) AS k
  FROM edges
),
a0 AS (SELECT DISTINCT src AS part FROM edges),
{",".join(_kcore_round_sql(r) for r in range(1, KCORE_ROUNDS + 1))}
SELECT part, deg AS core_degree, kk.k AS k_threshold FROM a{KCORE_ROUNDS}, kk
""",
)
def graph_kcore(
    spark: SparkSession, sf_dir: str, fixpoint: bool = False,
    lineage: str = "checkpoint",
) -> DataFrame:
    """K-core decomposition of the part co-purchase graph by synchronous
    peeling ({KCORE_ROUNDS} fixed rounds): drop every node whose degree in
    the CURRENT surviving subgraph is below k, recompute degrees, repeat.
    Survivors after the fixed rounds are (a superset of) the k-core — the
    densely-connected backbone a recommender or GNN-sampling pipeline keeps.
    k is corpus-relative, ceil(0.7 x mean degree) over the symmetric edge
    table ((7|E|+10|V|-1) DIV (10|V|), integer-exact), so the operator peels
    meaningfully at every scale factor instead of hardcoding a density.
    The 0.7 coefficient is MEASURED against the fixtures' degeneracy
    (VERDICT r10 #1 — the vacuous-green fix): ceil(mean) peeled these
    near-random co-purchase graphs to an EMPTY core at every driver SF
    (degeneracy is ~0.70-0.76 x mean there: 68/82/84 vs means 89/116/120 at
    sf0.001/0.01/0.1), while ceil(0.7 x mean) sits at-or-under the
    degeneracy, so BOTH the registered 4-round output AND the true fixpoint
    core are non-empty at all three driver fixtures (192 / 1807 / 17982
    rows after 4 rounds; fixpoints 192 / 1744 / 17732).

    fixpoint=True peels until no node drops (the TRUE k-core, convergence
    certified) within a {GRAPH_MAX_FIXPOINT_ROUNDS}-round budget, raising
    on non-convergence — the dedup_clusters discipline. The alive set
    shrinks monotonically, so one count() scalar per round detects the
    fixpoint (measured: 3 rounds at sf0.001, 20 at sf0.01, 22 at sf0.1 —
    inside the budget with headroom).

    All math is integer (counts and an integer ceil-DIV), so the unrolled
    SQL mirror is value-hash exact. Complements graph_label_propagation
    (communities) and graph_triangle_clustering (local density): k-core is
    the global-density filter.

    Scale: each round is two semi-join prunes of the edge list (shuffle on
    src/dst) + one map-side-combinable degree count; the edge table is
    persisted once and only the alive set (one long column) changes per
    round — the classic batch-iterative shape shared with
    pagerank_copurchase. Peeling converges in O(degeneracy) rounds;
    production would loop to fixpoint with the same per-round plan."""
    from ..io import track_checkpoint, track_persist

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # src-partitioned cache (the LPA/pagerank discipline): the first semi-join
    # of every peel round hashes on src and reuses this partitioning; only the
    # round's already-pruned survivor set moves for the dst-side join.
    edges = track_persist(
        _copurchase_weighted_edges(li).select("src", "dst").repartition("src")
    )
    k_row = edges.agg(
        F.expr(
            "(7 * count(1) + 10 * count(DISTINCT src) - 1) DIV (10 * count(DISTINCT src))"
        ).alias("k")
    )
    alive = edges.select(F.col("src").alias("part")).distinct()
    n_alive = alive.count() if fixpoint else None
    converged = not fixpoint
    for _ in range(GRAPH_MAX_FIXPOINT_ROUNDS if fixpoint else KCORE_ROUNDS):
        deg = (
            edges.join(alive.select(F.col("part").alias("src")), "src")
            .join(alive.select(F.col("part").alias("dst")), "dst")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        # per-round lineage break: each round's alive set references the
        # previous round TWICE (both semi-join sides), so pure lineage grows
        # exponentially in rounds. The fixpoint path MUST checkpoint (22
        # rounds -> ~4M-leaf plan otherwise); the fixed-round registered
        # shape uses the measured winner of _round_break's two forms.
        alive = _round_break(
            deg.crossJoin(F.broadcast(k_row))
            .filter(F.col("deg") >= F.col("k"))
            .select(F.col("src").alias("part"), "deg"),
            "checkpoint" if fixpoint else lineage,
        )
        if fixpoint:
            n = alive.count()
            if n == n_alive:
                converged = True
                break
            n_alive = n
    if not converged:
        raise RuntimeError(
            f"graph_kcore did not reach its peel fixpoint within "
            f"{GRAPH_MAX_FIXPOINT_ROUNDS} rounds — the graph's degeneracy "
            f"ordering is deeper than the budget; raise "
            f"GRAPH_MAX_FIXPOINT_ROUNDS"
        )
    return alive.crossJoin(F.broadcast(k_row)).select(
        "part", F.col("deg").alias("core_degree"), F.col("k").cast("long").alias("k_threshold")
    )


# --- Pareto frontier (skyline) via order-statistics scan ---------------------------

PARETO_SHARDS = 16


@register(
    "pareto_frontier_parts",
    oracle="""
WITH pr AS (SELECT DISTINCT p_retailprice AS price, p_size AS size FROM part),
w AS (
  SELECT price, size,
         max(size) OVER (ORDER BY price ASC, size DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM pr
),
f AS (SELECT price, size FROM w WHERE prev_max IS NULL OR prev_max < size)
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p JOIN f ON f.price = p.p_retailprice AND f.size = p.p_size
""",
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: parts not dominated on (minimize retail price, maximize
    size) — "no other part is at least as cheap AND at least as big, with one
    strict". The naive formulation is a quadratic NOT EXISTS self-join; over
    DISTINCT (price, size) pairs ordered by (price asc, size desc) a pair is
    dominated iff ANY earlier pair has size >= its own (earlier means
    strictly cheaper, or equal price with strictly larger size — both genuine
    dominators once duplicates are collapsed), so the skyline reduces to one
    running-max scan.

    Scale: the scan is NOT a global single-task window — pairs are range-
    partitioned on the sort key ({PARETO_SHARDS} shards here, thousands in
    production; Spark's range partitioner samples balanced boundaries), each
    shard runs its own running max, and the cross-shard carry-in is a prefix
    max over the {PARETO_SHARDS}-row per-shard-max table joined back by
    broadcast — the token_shard_assembly two-level pattern applied to MAX.
    The result is boundary-invariant: per-shard-earlier plus earlier-shards
    is exactly the set of global predecessors under the strict total order,
    wherever the sampled boundaries land. Dominance verdicts then broadcast
    back to the fact table on the (price, size) pair."""
    parts = load_table(spark, sf_dir, "part")
    pairs = parts.select(
        F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
    ).distinct()
    sh = pairs.withColumn("nsize", -F.col("size")).repartitionByRange(
        PARETO_SHARDS, "price", "nsize"
    ).withColumn("shard", F.spark_partition_id())
    win = (
        Window.partitionBy("shard")
        .orderBy("price", "nsize")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    in_shard = sh.select("price", "size", "shard", F.max("size").over(win).alias("prev_in"))
    offs = (
        sh.groupBy("shard")
        .agg(F.max("size").alias("smax"))
        .select(
            "shard",
            F.max("smax")
            .over(Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1))
            .alias("prev_shards"),
        )
    )
    frontier = (
        in_shard.join(F.broadcast(offs), "shard")
        .withColumn("prev_max", F.greatest("prev_in", "prev_shards"))
        .filter(F.col("prev_max").isNull() | (F.col("prev_max") < F.col("size")))
        .select("price", "size")
    )
    return parts.join(
        F.broadcast(frontier),
        (parts.p_retailprice == frontier.price) & (parts.p_size == frontier.size),
    ).select("p_partkey", "p_retailprice", "p_size")


# --- CDC merge-apply (MERGE INTO semantics over a changelog) -----------------------

CDC_SPLIT_TS = "2024-01-16 00:00:00"


@register(
    "cdc_merge_apply",
    oracle=f"""
WITH base AS (
  SELECT user_id,
         max(struct_pack(ts := ts, eid := event_id, et := event_type, v := value)) AS last
  FROM events WHERE ts < TIMESTAMP '{CDC_SPLIT_TS}' GROUP BY user_id
),
base_live AS (
  SELECT user_id, last.v AS value, last.ts AS ts FROM base WHERE last.et <> 'error'
),
chg AS (
  SELECT user_id,
         max(struct_pack(ts := ts, eid := event_id, et := event_type, v := value)) AS last
  FROM events WHERE ts >= TIMESTAMP '{CDC_SPLIT_TS}' GROUP BY user_id
)
SELECT coalesce(b.user_id, c.user_id) AS user_id,
       CASE WHEN c.user_id IS NULL THEN b.value ELSE c.last.v END AS value,
       CASE WHEN c.user_id IS NULL THEN b.ts ELSE c.last.ts END AS last_ts,
       CASE WHEN c.user_id IS NULL THEN 'kept'
            WHEN b.user_id IS NULL THEN 'inserted'
            ELSE 'updated' END AS merge_action
FROM base_live b FULL OUTER JOIN chg c ON b.user_id = c.user_id
WHERE c.user_id IS NULL OR c.last.et <> 'error'
""",
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics — the lakehouse CDC-apply primitive: a base
    snapshot (latest state per user before the split instant, tombstones
    dropped) merged with a changelog (events at/after the split), where the
    LATEST change per key wins: 'error' acts as DELETE, anything else as
    UPSERT. Output is the post-merge state with the merge action audit
    column (kept / updated / inserted; deleted keys are absent by
    definition). Latest-wins is deterministic via the (ts, event_id, ...)
    struct-max — event_id breaks timestamp ties, so both engines pick the
    same row bit-for-bit.

    Complements snapshot_diff_user_state (which DIFFS two snapshots; this
    APPLIES a changelog) and scd2_user_state_intervals (which keeps
    history; this collapses to current state).

    Scale: one map-side-combinable struct-max aggregate per side (shuffle
    on user_id) + one shuffle-colocated full outer join. In a real
    lakehouse the base side is file-pruned to the touched keys' partitions
    (the changelog is always the small side); the deterministic latest-wins
    core is exactly this plan."""
    events = load_table(spark, sf_dir, "events")
    split = F.to_timestamp(F.lit(CDC_SPLIT_TS))
    last = F.max(
        F.struct(
            F.col("ts"), F.col("event_id").alias("eid"),
            F.col("event_type").alias("et"), F.col("value").alias("v"),
        )
    ).alias("last")
    base = (
        events.filter(F.col("ts") < split).groupBy("user_id").agg(last)
        .filter(F.col("last.et") != "error")
        .select("user_id", F.col("last.v").alias("b_value"), F.col("last.ts").alias("b_ts"))
    )
    chg = events.filter(F.col("ts") >= split).groupBy("user_id").agg(last)
    merged = base.join(chg, "user_id", "full_outer")
    return (
        merged.filter(F.col("last").isNull() | (F.col("last.et") != "error"))
        .select(
            "user_id",
            F.when(F.col("last").isNull(), F.col("b_value"))
            .otherwise(F.col("last.v"))
            .alias("value"),
            F.when(F.col("last").isNull(), F.col("b_ts"))
            .otherwise(F.col("last.ts"))
            .alias("last_ts"),
            F.when(F.col("last").isNull(), F.lit("kept"))
            .when(F.col("b_value").isNull() & F.col("b_ts").isNull(), F.lit("inserted"))
            .otherwise(F.lit("updated"))
            .alias("merge_action"),
        )
    )


# --- association rules over co-purchase baskets (Apriori-pruned) --------------------

# Frequent item: basket count >= greatest(MEAN item basket-count, floor).
# r11 (the ok_but_empty catch): the former n_baskets/1000 rule assumed
# baskets-per-item grows with the corpus, but in a catalog that grows WITH
# the data (TPC-H: ~30 baskets/item at every SF) a basket-count fraction
# goes unreachable — 0 frequent items at sf0.1, so every sweep's green row
# was a hash match over the empty set. The mean-relative form is
# scale-free: 117/1228/11949 frequent items and 2332/3832/3874 rules at
# sf0.001/0.01/0.1 (measured), and on Zipf-real data the mean cuts the
# long tail exactly as Apriori intends.
ASSOC_ITEM_FLOOR = 5
ASSOC_MIN_PAIR = 2       # rule support floor (fixture baskets are near-uniform)


@register(
    "assoc_rules_copurchase",
    oracle=f"""
WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
n AS (SELECT count(DISTINCT ok) AS n_baskets FROM b),
ic AS (SELECT item, count(*) AS cnt FROM b GROUP BY item),
st AS (SELECT count(*) AS n_items, sum(cnt) AS tot FROM ic),
freq AS (
  SELECT ic.item, ic.cnt FROM ic, st
  WHERE ic.cnt >= greatest(st.tot // st.n_items, {ASSOC_ITEM_FLOOR})
),
fb AS (SELECT b.ok, b.item FROM b JOIN freq ON freq.item = b.item),
pc AS (
  SELECT a.item AS antecedent, c.item AS consequent, count(*) AS support_cnt
  FROM fb a JOIN fb c ON a.ok = c.ok AND a.item <> c.item
  GROUP BY 1, 2 HAVING count(*) >= {ASSOC_MIN_PAIR}
)
SELECT pc.antecedent, pc.consequent, pc.support_cnt,
       CAST(pc.support_cnt AS DOUBLE) / CAST(fa.cnt AS DOUBLE) AS confidence,
       CAST(pc.support_cnt * n.n_baskets AS DOUBLE) / CAST(fa.cnt * fc.cnt AS DOUBLE) AS lift
FROM pc JOIN freq fa ON fa.item = pc.antecedent
        JOIN freq fc ON fc.item = pc.consequent, n
""",
)
def assoc_rules_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (antecedent -> consequent over order
    baskets) with support, confidence, and lift. The Apriori property does
    the pruning: items below the corpus-relative support floor (the MEAN
    per-item basket count, floor {ASSOC_ITEM_FLOOR} — see the r11
    scale-trap note above the constants) are removed BEFORE the basket
    self-join, so the pair-generation input shrinks with the (Zipf) item
    tail rather than paying |basket|^2 over everything; rules themselves
    need support >= {ASSOC_MIN_PAIR}. Confidence and lift are each one
    IEEE division of exact integer counts — hash-identical across
    engines.

    Distinct from event_cooccurrence_lift (a 5-type event-pair contingency
    table): this mines a ~|parts|-wide item catalog with Apriori pruning,
    the actual basket-analysis shape.

    Scale: basket dedup and item counts are map-side-combinable aggregates;
    the only quadratic work is per-basket among FREQUENT items (the
    self-join shuffles on orderkey, basket-local); giant baskets are the
    skew risk and the item prefilter is exactly what bounds them. Count
    fetches are key joins — nothing catalog-sized is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item")).distinct()
    from ..io import track_persist

    b = track_persist(b)
    n_row = b.agg(F.countDistinct("ok").alias("n_baskets"))
    ic = b.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    st = ic.agg(
        F.count(F.lit(1)).alias("n_items"), F.sum("cnt").alias("tot")
    )
    freq = track_persist(
        ic.crossJoin(F.broadcast(st)).filter(
            F.col("cnt")
            >= F.greatest(
                F.expr("tot DIV n_items"),
                F.lit(ASSOC_ITEM_FLOOR).cast("long"),
            )
        ).select("item", "cnt")
    )
    fb = b.join(freq.select("item"), "item").select("ok", "item")
    pc = (
        fb.select("ok", F.col("item").alias("antecedent"))
        .join(fb.select("ok", F.col("item").alias("consequent")), "ok")
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("support_cnt"))
        .filter(F.col("support_cnt") >= ASSOC_MIN_PAIR)
    )
    fa = freq.select(F.col("item").alias("antecedent"), F.col("cnt").alias("a_cnt"))
    fc = freq.select(F.col("item").alias("consequent"), F.col("cnt").alias("c_cnt"))
    return (
        pc.join(fa, "antecedent")
        .join(fc, "consequent")
        .crossJoin(F.broadcast(n_row))
        .select(
            "antecedent", "consequent", "support_cnt",
            (F.col("support_cnt").cast("double") / F.col("a_cnt").cast("double")).alias(
                "confidence"
            ),
            (
                (F.col("support_cnt") * F.col("n_baskets")).cast("double")
                / (F.col("a_cnt") * F.col("c_cnt")).cast("double")
            ).alias("lift"),
        )
    )


# --- Benford first-digit conformance (DQ screen for fabricated values) --------------

# log10(1 + 1/d) in millionths, d = 1..9 — Benford's published constants as
# integer literals (no libm call crosses an engine boundary).
BENFORD_MILLIONTHS = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757)


@register(
    "benford_first_digit_dq",
    oracle=f"""
WITH v AS (
  SELECT CAST(substr(CAST(CAST(o_totalprice * 100 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
           AS digit
  FROM orders WHERE o_totalprice > 0
),
obs AS (SELECT digit, count(*) AS observed FROM v GROUP BY digit),
tot AS (SELECT CAST(sum(observed) AS BIGINT) AS total FROM obs)
SELECT obs.digit, obs.observed,
       CAST(tot.total * ({list(BENFORD_MILLIONTHS)})[CAST(obs.digit AS INT)] // 1000000
            AS BIGINT) AS expected,
       CAST(obs.observed AS DOUBLE)
         / CAST(tot.total * ({list(BENFORD_MILLIONTHS)})[CAST(obs.digit AS INT)] // 1000000
                AS DOUBLE) AS obs_over_exp
FROM obs, tot
""",
)
def benford_first_digit_dq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit screen over order totals — the
    classic forensic DQ check for fabricated or truncated numeric columns.
    The digit is taken from the exact cents integer (price*100 as BIGINT,
    then first character), so no float formatting is involved; expected
    counts come from Benford's published log10(1+1/d) constants embedded as
    integer millionths (total*const DIV 1e6) — no transcendental is ever
    evaluated, keeping the report value-hash exact. obs_over_exp is the
    single-division conformance ratio per digit (fixture prices are
    uniform, so the report SHOWS non-conformance — that is the point of
    the screen: it flags distributions that cannot be organic).

    Scale: one map-side-combinable 9-key aggregate over the scan plus a
    1-row total broadcast; the digit extraction is pushdown-friendly
    column arithmetic."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    v = orders.select(
        F.substring(
            (F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        ).cast("long").alias("digit")
    )
    obs = v.groupBy("digit").agg(F.count(F.lit(1)).alias("observed"))
    tot = obs.agg(F.sum("observed").cast("long").alias("total"))
    millionths = F.element_at(
        F.array(*[F.lit(m) for m in BENFORD_MILLIONTHS]), F.col("digit").cast("int")
    )
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "observed",
            F.expr(
                f"CAST(total * element_at(array{BENFORD_MILLIONTHS}, CAST(digit AS INT)) "
                f"DIV 1000000 AS BIGINT)"
            ).alias("expected"),
        )
        .select(
            "digit", "observed", "expected",
            (F.col("observed").cast("double") / F.col("expected").cast("double")).alias(
                "obs_over_exp"
            ),
        )
    )


# --- Holt linear-trend exponential smoothing -------------------------------------

# alpha = beta = 0.5: both coefficients exactly representable in binary, so
# every smoothing step is plain IEEE multiply/add both engines evaluate
# identically (the registry-wide float discipline — same reason ewma uses 0.5).


@register(
    "holt_linear_forecast",
    oracle="""
WITH RECURSIVE hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT user_id, y,
         row_number() OVER (PARTITION BY user_id ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM hourly
),
rec(user_id, rn, l, b, n) AS (
  -- seed trend must be typed DOUBLE explicitly: a bare 0.0 seeds the
  -- recursive column as DECIMAL(1,1) and the recursive term's DOUBLE
  -- values then fail the cast back
  SELECT user_id, 1, y, CAST(0.0 AS DOUBLE), n FROM seq WHERE rn = 1
  UNION ALL
  SELECT r.user_id, r.rn + 1,
         0.5 * s.y + 0.5 * (r.l + r.b),
         0.5 * ((0.5 * s.y + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b,
         r.n
  FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT user_id, CAST(n AS BIGINT) AS n_hours,
       l AS level, b AS trend, l + b AS forecast_next
FROM rec WHERE rn = n
""",
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per user over the
    hourly value series (alpha = beta = 0.5): level l_t = a*y_t +
    (1-a)*(l_{t-1}+b_{t-1}), trend b_t = B*(l_t-l_{t-1}) + (1-B)*b_{t-1},
    seeded l_1 = y_1, b_1 = 0; output is each user's final state plus the
    one-step-ahead forecast l+b — the trend-aware upgrade of
    ewma_value_per_user (EWMA flattens ramps; Holt tracks them).

    Spark shape: ONE hourly pre-aggregation (decimal-exact, map-side
    combined) bounds the per-user series by hours-in-horizon, never event
    count; the recurrence itself is an F.aggregate fold over the per-user
    sorted hour array — pure JVM codegen, zero additional shuffles, and the
    array length is the time horizon (8.8k/year) regardless of corpus size.
    The DuckDB oracle restates the same recurrence as a recursive CTE; both
    engines run identical IEEE ops in identical order, so the doubles
    hash-match bit-for-bit. The smoothing itself is inherently sequential —
    this (fold over a bounded pre-aggregated series) is the only shape that
    distributes it without changing semantics."""
    hourly = (
        _events(spark, sf_dir)
        .groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("y"))
    )
    series = hourly.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("h", "y"))).alias("pts")
    )
    n = F.size("pts")
    # fold the tail (points 2..n) over state (l, b) seeded from point 1;
    # the new level expression appears twice (for l and inside b) exactly
    # like the oracle's recursive term — same value, deterministically.
    init = F.struct(
        F.element_at("pts", 1)["y"].alias("l"), F.lit(0.0).alias("b")
    )
    state = F.aggregate(
        F.slice("pts", 2, F.greatest(n - 1, F.lit(0))),
        init,
        lambda acc, p: F.struct(
            (F.lit(0.5) * p["y"] + F.lit(0.5) * (acc["l"] + acc["b"])).alias("l"),
            (
                F.lit(0.5)
                * (
                    (F.lit(0.5) * p["y"] + F.lit(0.5) * (acc["l"] + acc["b"]))
                    - acc["l"]
                )
                + F.lit(0.5) * acc["b"]
            ).alias("b"),
        ),
    )
    return series.select(
        "user_id",
        n.cast("long").alias("n_hours"),
        state["l"].alias("level"),
        state["b"].alias("trend"),
        (state["l"] + state["b"]).alias("forecast_next"),
    )


# --- link prediction by common neighbors (query-anchored wedge counting) -----------

LINKPRED_QUERY_NODES = 10  # smallest part keys present in the edge set
LINKPRED_TOPK = 5          # recommendations per query node


@register(
    "graph_linkpred_common_neighbors",
    oracle=f"""
WITH li AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
e AS (
  SELECT a.p AS u, b.p AS v
  FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p
  GROUP BY 1, 2
),
deg AS (SELECT u, count(*) AS d FROM e GROUP BY 1),
q AS (SELECT u FROM e GROUP BY u ORDER BY u LIMIT {LINKPRED_QUERY_NODES}),
wedge AS (
  SELECT qe.u AS qn, e2.v AS cand, count(*) AS cn
  FROM e qe JOIN e e2 ON e2.u = qe.v
  WHERE qe.u IN (SELECT u FROM q) AND e2.v <> qe.u
  GROUP BY 1, 2
),
nonadj AS (
  SELECT w.qn, w.cand, w.cn FROM wedge w
  LEFT JOIN e ON e.u = w.qn AND e.v = w.cand
  WHERE e.u IS NULL
),
scored AS (
  SELECT n.qn, n.cand, n.cn,
         CAST(n.cn AS DOUBLE) / (dq.d + dc.d - n.cn) AS jaccard,
         row_number() OVER (PARTITION BY n.qn ORDER BY n.cn DESC, n.cand) AS rnk
  FROM nonadj n
  JOIN deg dq ON dq.u = n.qn
  JOIN deg dc ON dc.u = n.cand
)
SELECT qn AS query_part, cand AS candidate_part,
       CAST(cn AS BIGINT) AS common_neighbors, jaccard,
       CAST(rnk AS BIGINT) AS rnk
FROM scored WHERE rnk <= {LINKPRED_TOPK}
""",
)
def graph_linkpred_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the part co-purchase graph (Liben-Nowell &
    Kleinberg 2007's common-neighbors / Jaccard predictors): for each of
    the {LINKPRED_QUERY_NODES} smallest part keys in the edge set, rank the
    NON-adjacent parts by shared-neighbor count — "customers who bought
    products adjacent to X also bought Y" — and emit the top
    {LINKPRED_TOPK} with Jaccard(Gamma(q), Gamma(y)) as the normalized
    score. Complements the existing graph suite: pagerank ranks nodes,
    LPA/k-core find structure, triangles score cohesion; this one scores
    ABSENT edges, the recommendation/GNN-candidate shape.

    Cross-engine exactness: neighbor sets are exact (distinct co-purchase
    edges), counts are integers, Jaccard = cn / (deg_q + deg_y - cn) is one
    IEEE division of exact ints, and the per-query ranking orders by
    (cn DESC, candidate id) — fully deterministic, so the row set
    value-hash-checks.

    Scale: this is the QUERY-ANCHORED wedge shape — wedges are enumerated
    only from the |Q| query nodes' adjacency (|Q| x deg(q) x avg-deg work),
    never the full sum(deg^2) wedge set that dies on skewed graphs; the
    candidate aggregation and the anti-join against existing edges shuffle
    only (q, cand) pairs. At 100 TB, |Q| is the serving batch (the parts a
    session touched) and the same plan serves it; a full-graph variant
    would add the triangle family's degree-orientation bound. The query
    set is broadcast; the two degree joins are |candidates|-sized."""
    from ..io import track_persist

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    edges = track_persist(
        _copurchase_weighted_edges(li).select("src", "dst").repartition("src")
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    q = F.broadcast(
        edges.select("src").distinct().orderBy("src").limit(LINKPRED_QUERY_NODES)
        .select(F.col("src").alias("qn"))
    )
    # wedges anchored at the query nodes: q -> n (its neighbors), n -> y
    qn = edges.join(q, edges.src == F.col("qn")).select("qn", F.col("dst").alias("n"))
    wedge = (
        qn.join(edges.select(F.col("src").alias("n"), F.col("dst").alias("cand")), "n")
        .filter(F.col("cand") != F.col("qn"))
        .groupBy("qn", "cand")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    nonadj = wedge.join(
        edges.select(F.col("src").alias("qn"), F.col("dst").alias("cand")),
        ["qn", "cand"],
        "left_anti",
    )
    scored = (
        nonadj.join(deg.select(F.col("src").alias("qn"), F.col("d").alias("dq")), "qn")
        .join(deg.select(F.col("src").alias("cand"), F.col("d").alias("dc")), "cand")
        .select(
            "qn",
            "cand",
            "cn",
            (F.col("cn").cast("double") / (F.col("dq") + F.col("dc") - F.col("cn"))).alias(
                "jaccard"
            ),
        )
    )
    w = Window.partitionBy("qn").orderBy(F.col("cn").desc(), F.col("cand"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= LINKPRED_TOPK)
        .select(
            F.col("qn").alias("query_part"),
            F.col("cand").alias("candidate_part"),
            F.col("cn").cast("long").alias("common_neighbors"),
            "jaccard",
            "rnk",
        )
    )


# --- seasonal-naive forecast backtest ----------------------------------------------

SEASONAL_LAG_HOURS = 24


@register(
    "timeseries_seasonal_naive_eval",
    oracle=f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         sum(CAST(value AS DECIMAL(18,2))) AS y
  FROM events GROUP BY 1, 2
),
evals AS (
  SELECT c.user_id, c.y AS actual, p.y AS forecast, abs(c.y - p.y) AS abs_err
  FROM hourly c JOIN hourly p
    ON p.user_id = c.user_id
   AND p.h = c.h - INTERVAL {SEASONAL_LAG_HOURS} HOUR
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_evals,
       CAST(sum(abs_err) AS DOUBLE) AS sum_abs_err,
       CAST(sum(abs_err) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mae,
       CAST(sum(CASE WHEN abs_err = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
FROM evals GROUP BY user_id
""",
)
def timeseries_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest per user (the standard baseline
    every forecasting model must beat — Hyndman & Athanasopoulos, FPP:
    y_hat(t) = y(t - season)): forecast each user's hourly value sum with
    the value {SEASONAL_LAG_HOURS} h earlier, score every hour where both
    sides exist, and report per-user n_evals / total absolute error / MAE /
    exact-hit count. Completes the timeseries eval story the way
    retrieval_eval_metrics completes retrieval: holt/EWMA/CUSUM produce
    forecasts and alarms, this measures one against ground truth.

    Cross-engine exactness: hourly sums are DECIMAL(18,2) (exact,
    order-independent), the forecast join is integer-exact interval
    arithmetic on truncated hours, abs_err stays decimal through the
    per-user SUM (a double sum over hours would be fold-order-sensitive),
    and only the two final reported columns cast to double — one cast and
    one IEEE division per row, identical in both engines. The hour bucket
    and the 24 h lag live entirely in the TIMESTAMP_NTZ (wall-clock)
    domain (trunc_hour_ntz; NTZ + day-time interval is pure wall-clock
    arithmetic): under a DST session timezone a coerced date_trunc would
    shift gap-hour rows and split an ambiguous fall-back hour by offset
    while the DuckDB oracle's naive timestamps would not (ADVICE r11 #4) —
    NTZ end-to-end makes the backtest bit-exact in EVERY session zone,
    transitions included.

    Scale: one map-side-combinable hourly rollup, then a self-equi-join on
    (user_id, hour) — both sides hash-partition on user_id, the join is
    1:1 per (user, hour), and output is bounded by the rollup; no windows,
    no grids, no skew beyond the per-user event share the rollup already
    collapsed. At 100 TB with a date-partitioned lake the lagged side
    prunes to the same partitions shifted by one day."""
    ev = _events(spark, sf_dir)
    hour = trunc_hour_ntz(F.col("ts").cast("timestamp_ntz"))
    hourly = ev.groupBy("user_id", hour.alias("h")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("y")
    )
    lag = F.expr(f"INTERVAL {SEASONAL_LAG_HOURS} HOURS")
    cur = hourly.select("user_id", "h", F.col("y").alias("actual"))
    prev = hourly.select(
        "user_id", (F.col("h") + lag).alias("h"), F.col("y").alias("forecast")
    )
    evals = cur.join(prev, ["user_id", "h"]).select(
        "user_id", F.abs(F.col("actual") - F.col("forecast")).alias("abs_err")
    )
    return evals.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_evals"),
        F.sum("abs_err").cast("double").alias("sum_abs_err"),
        (F.sum("abs_err").cast("double") / F.count(F.lit(1)).cast("double")).alias("mae"),
        F.sum(F.when(F.col("abs_err") == 0, 1).otherwise(0)).cast("long").alias("n_exact"),
    )


# --- classical seasonal decomposition (r12) ------------------------------------------

DECOMP_MA = 25          # centered moving-average width (12 back, 12 ahead)
DECOMP_PERIOD = 24      # hour-of-day seasonality


@register(
    "timeseries_classical_decomposition",
    oracle=f"""
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
),
agg AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         sum(CAST(value AS DECIMAL(18,2))) AS y
  FROM events GROUP BY 1, 2
),
dense AS (
  SELECT g.user_id, g.hour,
         coalesce(a.y, CAST(0 AS DECIMAL(18,2))) AS y
  FROM grid g LEFT JOIN agg a ON a.user_id = g.user_id AND a.hour = g.hour
),
ma AS (
  SELECT user_id, hour, y,
         sum(y) OVER w AS trend_sum,
         count(*) OVER w AS w_n
  FROM dense
  WINDOW w AS (PARTITION BY user_id ORDER BY hour
               ROWS BETWEEN {DECOMP_MA // 2} PRECEDING AND {DECOMP_MA // 2} FOLLOWING)
),
mid AS (
  SELECT user_id, hour, y,
         CAST({DECOMP_MA} AS DECIMAL(4,0)) * y - trend_sum AS detr
  FROM ma WHERE w_n = {DECOMP_MA}
),
seas AS (
  SELECT user_id, CAST(hour(hour) AS INT) AS hod,
         sum(detr) AS s_detr, CAST(count(*) AS BIGINT) AS n_hod
  FROM mid GROUP BY 1, 2
)
SELECT m.user_id, m.hour,
       CAST(m.y AS DOUBLE) AS y,
       CAST(({DECOMP_MA} * m.y - m.detr) AS DOUBLE) / {DECOMP_MA}.0 AS trend,
       CAST(s.s_detr AS DOUBLE) / (s.n_hod * {DECOMP_MA}.0) AS seasonal,
       CAST(m.y AS DOUBLE)
         - CAST(({DECOMP_MA} * m.y - m.detr) AS DOUBLE) / {DECOMP_MA}.0
         - CAST(s.s_detr AS DOUBLE) / (s.n_hod * {DECOMP_MA}.0) AS remainder
FROM mid m JOIN seas s ON s.user_id = m.user_id AND s.hod = CAST(hour(m.hour) AS INT)
""",
)
def timeseries_classical_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition (Hyndman & Athanasopoulos,
    FPP §3.4 — the moving-average method, the deterministic ancestor of
    STL): per user, the dense zero-filled hourly series splits into
    trend (centered {DECOMP_MA}-hour moving average, emitted only where the
    full window exists), seasonal (mean detrended value per hour-of-day —
    the {DECOMP_PERIOD}-period seasonal index, un-normalized variant), and
    remainder. Completes the timeseries family's decomposition story:
    EWMA/Holt smooth, CUSUM alarms, seasonal-naive backtests, gapfill
    densifies — this separates the signal a dashboard overlays and a
    feature pipeline feeds as three channels.

    Cross-engine exactness: the series is DECIMAL(18,2) end-to-end through
    every aggregation — the MA window sums <= {DECOMP_MA} decimals
    (exact), the detrended value is kept as the SCALED exact integer form
    {DECOMP_MA}*y - trend_sum (no division before the per-hour-of-day
    sum), and only the three reported channels divide, as doubles, in the
    same expression order in both engines. The window frame is ROWS-based
    over the dense grid (one row per hour by construction), so frame
    membership is integer-exact; rows without a full window are excluded
    by count, not null-padded.

    Scale: inherits the gapfill grid contract (Theta(users x span) rows —
    trend and seasonal are DEFINED on the dense series; sparse input would
    change the answer, not just the cost): one user-keyed bounded-frame
    window ({DECOMP_MA} rows of state per user) and one (user,
    hour-of-day)-partitioned unbounded window for the seasonal index —
    chosen over groupBy + join-back by measurement (one fewer full-grid
    exchange; 74 s -> 54 s at sf1). Its sealed three-decade exponent is
    ~1.0 on the top decade (SCALING_SF1.json): per-row cost is FLAT and
    the output grid itself grows 10x with users — the same output-contract
    reading as the dense gapfill, not a candidate explosion; nothing here
    is super-linear in its contracted output. At 100 TB both windows are
    streaming-friendly sliding/partition aggregates over a
    date-partitioned grid."""
    ev = _events(spark, sf_dir)
    # NTZ wall-clock domain end-to-end (ADVICE r12 #4): date_trunc/sequence
    # on instant timestamps silently coerce through the session timezone, so
    # a DST gap/repeat hour would split the hourly buckets vs the oracle's
    # naive date_trunc the moment io.py's UTC enforcement relaxed. Same fix
    # class as timeseries_seasonal_naive_eval (ADVICE r11 #4); sequence()
    # is NTZ-native in Spark 4 (element type stays timestamp_ntz).
    hntz = F.col("ts").cast("timestamp_ntz")
    hour = trunc_hour_ntz(hntz)
    bounds = ev.groupBy("user_id").agg(
        trunc_hour_ntz(F.min(hntz)).alias("h0"),
        trunc_hour_ntz(F.max(hntz)).alias("h1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour"),
    )
    agg = ev.groupBy("user_id", hour.alias("hour")).agg(
        F.sum(F.col("value").cast(D2)).alias("y")
    )
    dense = grid.join(agg, ["user_id", "hour"], "left").select(
        "user_id", "hour", F.coalesce("y", F.lit(0).cast(D2)).alias("y")
    )
    # Scale-adaptive fan-out before the window sort (r14, guide §2.5/§5):
    # the dense grid is the one genuinely row-heavy intermediate in the
    # fleet (~1M rows at sf0.1, Theta(users x span) by contract), and the
    # broadcast-join output above it inherits the session's (small) static
    # shuffle-partition count — the MA window's sort then runs near-serial.
    # Hash on user_id to defaultParallelism keeps the window's required
    # clustering while using every core; measured min-of-4 same-session:
    # 5.60 -> 2.10 s at sf0.1.
    dense = dense.repartition(
        dense.sparkSession.sparkContext.defaultParallelism, "user_id"
    )
    half = DECOMP_MA // 2
    # Prefix-sum trend instead of a 25-row sliding frame (r14, guide §1.1):
    # Spark re-evaluates a bounded ROWS frame's aggregate from scratch every
    # row (no inverse-combine), so sum OVER (-12, +12) costs O(frame)/row =
    # 25 decimal adds per grid row. The running sum is incremental O(1)/row,
    # and trend_sum = cum[i+12] - cum[i-13] exactly (decimal arithmetic is
    # exact — integers in cents — so the prefix difference is bit-equal to
    # the frame sum; verified row-identical vs the frame form at sf0.01 AND
    # sf0.1). The full-window condition w_n = 25 becomes a rank test:
    # 12 < rn <= cnt - 12. Same one window sort; measured with the fan-out:
    # 2.10 -> 1.89 s min-of-4.
    wo = Window.partitionBy("user_id").orderBy("hour")
    cum = F.sum("y").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    trend_sum = F.lead(cum, half).over(wo) - F.coalesce(
        F.lag(cum, half + 1).over(wo), F.lit(0).cast(D2)
    )
    rn = F.row_number().over(wo)
    cnt = F.count(F.lit(1)).over(Window.partitionBy("user_id"))
    ma = dense.select(
        "user_id",
        "hour",
        "y",
        trend_sum.alias("trend_sum"),
        rn.alias("rn"),
        cnt.alias("cnt"),
    ).filter((F.col("rn") > half) & (F.col("rn") <= F.col("cnt") - half))
    mid = ma.select(
        "user_id",
        "hour",
        "y",
        (F.lit(DECOMP_MA).cast("decimal(4,0)") * F.col("y") - F.col("trend_sum")).alias(
            "detr"
        ),
    )
    # seasonal via an unbounded window over (user, hour-of-day) instead of
    # groupBy + join-back: same values (decimal sums are order-free), one
    # fewer full-grid exchange — measured 74 s -> see docstring at sf1,
    # where the grid is ~13M rows and every extra shuffle is ~linear cost
    mid = mid.withColumn("hod", F.hour("hour").cast("int"))
    whod = Window.partitionBy("user_id", "hod")
    trend = (
        (F.lit(DECOMP_MA) * F.col("y") - F.col("detr")).cast("double") / DECOMP_MA
    )
    seasonal = F.sum("detr").over(whod).cast("double") / (
        F.count(F.lit(1)).over(whod) * float(DECOMP_MA)
    )
    return mid.select(
        "user_id",
        "hour",
        F.col("y").cast("double").alias("y"),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        (F.col("y").cast("double") - trend - seasonal).alias("remainder"),
    )


@register(
    "timeseries_decomposition_sparse",
    oracle=f"""
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
),
agg AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         sum(CAST(value AS DECIMAL(18,2))) AS y
  FROM events GROUP BY 1, 2
),
dense AS (
  SELECT g.user_id, g.hour,
         coalesce(a.y, CAST(0 AS DECIMAL(18,2))) AS y
  FROM grid g LEFT JOIN agg a ON a.user_id = g.user_id AND a.hour = g.hour
),
ma AS (
  SELECT user_id, hour, y,
         sum(y) OVER w AS trend_sum,
         count(*) OVER w AS w_n
  FROM dense
  WINDOW w AS (PARTITION BY user_id ORDER BY hour
               ROWS BETWEEN {DECOMP_MA // 2} PRECEDING AND {DECOMP_MA // 2} FOLLOWING)
),
mid AS (
  SELECT user_id, hour, y,
         CAST({DECOMP_MA} AS DECIMAL(4,0)) * y - trend_sum AS detr
  FROM ma WHERE w_n = {DECOMP_MA}
),
seas AS (
  SELECT user_id, CAST(hour(hour) AS INT) AS hod,
         sum(detr) AS s_detr, CAST(count(*) AS BIGINT) AS n_hod
  FROM mid GROUP BY 1, 2
)
SELECT m.user_id, m.hour,
       CAST(m.y AS DOUBLE) AS y,
       CAST(({DECOMP_MA} * m.y - m.detr) AS DOUBLE) / {DECOMP_MA}.0 AS trend,
       CAST(s.s_detr AS DOUBLE) / (s.n_hod * {DECOMP_MA}.0) AS seasonal,
       CAST(m.y AS DOUBLE)
         - CAST(({DECOMP_MA} * m.y - m.detr) AS DOUBLE) / {DECOMP_MA}.0
         - CAST(s.s_detr AS DOUBLE) / (s.n_hod * {DECOMP_MA}.0) AS remainder
FROM mid m
JOIN seas s ON s.user_id = m.user_id AND s.hod = CAST(hour(m.hour) AS INT)
JOIN agg o ON o.user_id = m.user_id AND o.hour = m.hour
""",
)
def timeseries_decomposition_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse twin of timeseries_classical_decomposition (VERDICT r12 #5,
    the gapfill/gapfill_runs pairing applied to decomposition): the SAME
    trend/seasonal/remainder values, restricted to OBSERVED hours, computed
    WITHOUT materializing the dense grid — output and work are
    Theta(observed hours), not Theta(users x span). The oracle runs the
    DENSE decomposition and inner-joins it to the observed hours, so a
    value-hash match PROVES the sparse rewrite equivalent on the fixture.

    The rewrite, exactly (all three identities hold in exact decimal
    arithmetic, so the emitted doubles are bit-identical to the dense
    form's):

    - trend: the dense centered {DECOMP_MA}-hour MA sum equals a RANGE
      window over the sparse series (zero-filled hours contribute nothing),
      ordered by the integer hour index x = hours since the user's first
      hour; the dense full-window condition w_n = {DECOMP_MA} is exactly
      12 <= x <= X-12 where X is the user's span in hours.
    - seasonal numerator, s_detr(hod) = sum over ALL dense mid hours at
      that hour-of-day of ({DECOMP_MA}*y - trend_sum): split as
      {DECOMP_MA} * (sum of y over OBSERVED mid hours at hod) minus
      (sum over observed rows o of y_o * cnt(o, hod)) — swapping the
      summation order of trend_sum turns the dense-grid pass into a
      24-way fan-out of the observed rows, where cnt(o, hod) is the
      number of dense mid hours at hod within 12 hours of o, a clipped
      arithmetic-progression count computed in closed form.
    - the seasonal denominator n_hod is the same closed-form count over
      the full mid range [12, X-12].

    The closed-form counts use (v + 48) DIV 24 with non-negative
    numerators so truncating division (both engines) equals floor; hour
    arithmetic lives in the TIMESTAMP_NTZ wall-clock domain (uniform
    3600 s hours, no DST) via timestampdiff on hour-truncated values.

    Scale: one hash aggregate over events, two per-user windows over the
    SPARSE rows (a {DECOMP_MA}-hour RANGE frame and an unbounded min/max),
    a 24x fan-out of observed rows into a (user, hod)-keyed aggregate, and
    a broadcast-sized join back — no sequence-explode, no grid. At sf0.1
    the grid is ~11x the observed rows (9.1% density); at 100 TB with
    sparse per-user activity the dense form's Theta(users x span) grid is
    the difference between feasible and not. Companion precedent:
    timeseries_gapfill_runs cut the gapfill family's top-decade scaling
    exponent 0.74 -> 0.36 with the same contract change."""
    from pyspark.sql.window import Window as W

    ev = _events(spark, sf_dir)
    hntz = F.col("ts").cast("timestamp_ntz")
    half = DECOMP_MA // 2
    agg = ev.groupBy("user_id", trunc_hour_ntz(hntz).alias("hour")).agg(
        F.sum(F.col("value").cast(D2)).alias("y")
    )
    wu = W.partitionBy("user_id")
    base = (
        agg.withColumn("h0", F.min("hour").over(wu))
        .withColumn("h1", F.max("hour").over(wu))
        .withColumn("x", F.expr("timestampdiff(HOUR, h0, hour)"))
        .withColumn("bigx", F.expr("timestampdiff(HOUR, h0, h1)"))
        .withColumn("hod0", F.hour("h0").cast("int"))
    )
    wr = W.partitionBy("user_id").orderBy("x").rangeBetween(-half, half)
    base = base.withColumn("trend_sum", F.sum("y").over(wr))
    mid = base.filter(
        (F.col("x") >= half) & (F.col("x") <= F.col("bigx") - half)
    ).withColumn("hod", F.hour("hour").cast("int"))

    # 24-way fan-out of ALL observed rows: each contributes y * cnt(o, hod)
    # to every hour-of-day's dense trend_sum total. a/b clip o's 25-hour
    # window to the mid range; r maps hod to the residue of the hour index.
    fan = base.select("user_id", "y", "x", "bigx", "hod0").withColumn(
        "hod", F.explode(F.sequence(F.lit(0), F.lit(23)))
    )
    a = F.greatest(F.col("x") - half, F.lit(half))
    b = F.least(F.col("x") + half, F.col("bigx") - half)
    r = ((F.col("hod") - F.col("hod0")) % 24 + 24) % 24
    cnt = F.when(
        b >= a,
        F.expr(f"(b_ - r_ + 48) DIV 24") - F.expr(f"(a_ - 1 - r_ + 48) DIV 24"),
    ).otherwise(F.lit(0))
    fan = (
        fan.withColumn("a_", a)
        .withColumn("b_", b)
        .withColumn("r_", r)
        .withColumn("cnt", cnt)
        .filter(F.col("cnt") > 0)
    )
    tsum = fan.groupBy("user_id", "hod").agg(
        F.sum(F.col("y") * F.col("cnt")).alias("t_sum")
    )
    ssum = mid.groupBy("user_id", "hod").agg(F.sum("y").alias("s_obs"))
    idx = ssum.join(tsum, ["user_id", "hod"]).select(
        "user_id",
        "hod",
        (
            F.lit(DECOMP_MA).cast("decimal(4,0)") * F.col("s_obs") - F.col("t_sum")
        ).alias("s_detr"),
    )
    out = mid.join(idx, ["user_id", "hod"])
    # n_hod: closed-form count of dense mid hours at this hod (a=12, b=X-12)
    n_hod = (
        F.expr(f"(bigx - {half} - nr_ + 48) DIV 24")
        - F.expr(f"({half} - 1 - nr_ + 48) DIV 24")
    ).cast("long")
    out = out.withColumn("nr_", ((F.col("hod") - F.col("hod0")) % 24 + 24) % 24)
    trend = F.col("trend_sum").cast("double") / float(DECOMP_MA)
    seasonal = F.col("s_detr").cast("double") / (n_hod * float(DECOMP_MA))
    return out.select(
        "user_id",
        "hour",
        F.col("y").cast("double").alias("y"),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        (F.col("y").cast("double") - trend - seasonal).alias("remainder"),
    )
