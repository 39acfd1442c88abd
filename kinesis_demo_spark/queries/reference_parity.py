"""Reference-parity queries: every operator in SURVEY.md §2 instantiated as a
named (PySpark plan, DuckDB oracle SQL) pair over the ``events`` fixture.

Parameterized serving-API operators are pinned to deterministic literals
(user 7, cursor/now constants from plans.serving) so the differential check is
reproducible. Column names are aliased identically on both sides — the
driver's value-hash sorts columns by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions.timeutil import epoch_ms_sql
from ..io import load_table, spread
from ..plans.heatmap import heatmap_counts, heatmap_max_intensity
from ..plans.movements import SENTINEL_SQL, X_SQL, Y_SQL, movement_aggregates, movements
from ..plans.serving import (
    CURSOR,
    DEFAULT_USER,
    NOW,
    cursor_bootstrap,
    last_n_windows,
    poll_page_with_total,
    poll_sum,
    range_scan,
)
from ..registry import register

# Shared oracle CTE: the movement-aggregate serving table, flat columns.
_AGG_CTE = """
agg AS (
  SELECT user_id, date_trunc('second', ts) AS window_start, count(*) AS cnt
  FROM events
  GROUP BY 1, 2
)
"""

# Shared oracle CTE: the flattened movement stream with derived coordinates.
_MOV_CTE = f"""
mov AS (
  SELECT event_id, user_id, ts,
         {X_SQL} AS x,
         {Y_SQL} AS y,
         {epoch_ms_sql('ts')} AS time_ms,
         {SENTINEL_SQL} AS is_sentinel
  FROM events
)
"""


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- A1 + W1: tumbling-window grouped count -----------------------------------


@register(
    "agg_window_count",
    oracle=f"WITH {_AGG_CTE} SELECT user_id, window_start, cnt FROM agg",
)
def agg_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/W1 (functions.js:49-52 bucketing; reconstructed Lambda count)."""
    return movement_aggregates(_events(spark, sf_dir)).select(
        "user_id", "window_start", "cnt"
    )


# --- A2: collect_list of movement structs (flattened projection for hashing) --


@register(
    "agg_window_movs_stats",
    oracle=f"""
WITH {_MOV_CTE},
ranked AS (
  SELECT user_id, date_trunc('second', ts) AS window_start, time_ms, x, y,
         row_number() OVER (
           PARTITION BY user_id, date_trunc('second', ts)
           ORDER BY time_ms, event_id
         ) AS rn
  FROM mov
)
SELECT user_id, window_start, count(*) AS cnt,
       min(time_ms) AS min_time_ms, max(time_ms) AS max_time_ms,
       max(CASE WHEN rn = 1 THEN x END) AS first_x,
       max(CASE WHEN rn = 1 THEN y END) AS first_y
FROM ranked
GROUP BY 1, 2
""",
)
def agg_window_movs_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (reconstructed Lambda collect-list; consumed functions.js:361-377).

    The per-window struct list itself is nested; the hash-checked projection
    exposes its deterministic properties (size, time span, head element) —
    list construction order is pinned by sort_array.
    """
    agg = movement_aggregates(_events(spark, sf_dir))
    head = F.element_at("movs", 1)
    tail = F.element_at("movs", -1)
    return agg.select(
        "user_id",
        "window_start",
        "cnt",
        head["time_ms"].alias("min_time_ms"),
        tail["time_ms"].alias("max_time_ms"),
        head["x"].alias("first_x"),
        head["y"].alias("first_y"),
    )


# --- Q1+Q2+Q3: keyed range scan, forward poll ----------------------------------


@register(
    "serving_forward_poll",
    oracle=f"""
WITH {_AGG_CTE}
SELECT user_id, window_start, cnt
FROM agg
WHERE user_id = {DEFAULT_USER} AND window_start > TIMESTAMP '{CURSOR}'
""",
)
def serving_forward_poll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 user equi-filter + Q2 exclusive range scan + asc Q3 (the E2 chart
    poll, functions.js:151-157,168)."""
    agg = movement_aggregates(_events(spark, sf_dir))
    return range_scan(agg, user_id=DEFAULT_USER, after=CURSOR)


# --- Q3 desc + Q5 limit: reverse top-k scan ------------------------------------


@register(
    "serving_reverse_limit",
    oracle=f"""
WITH {_AGG_CTE}
SELECT user_id, window_start, cnt
FROM agg
WHERE user_id = {DEFAULT_USER} AND window_start <= TIMESTAMP '{NOW}'
ORDER BY window_start DESC
LIMIT 10
""",
)
def serving_reverse_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 reverse=true + Q5 limit=10 (heatmap fetch, functions.js:349-351):
    TakeOrderedAndProject in the physical plan."""
    agg = movement_aggregates(_events(spark, sf_dir))
    return range_scan(agg, user_id=DEFAULT_USER, upto=NOW, descending=True, limit=10)


# --- Q4: projection switch (movs instead of counts) -----------------------------


@register(
    "serving_projection_movs",
    oracle=f"""
WITH {_MOV_CTE},
recent AS (
  SELECT date_trunc('second', ts) AS window_start
  FROM events
  WHERE user_id = {DEFAULT_USER} AND date_trunc('second', ts) <= TIMESTAMP '{NOW}'
  GROUP BY 1
  ORDER BY window_start DESC
  LIMIT 10
),
ranked AS (
  SELECT m.user_id, r.window_start, m.time_ms, m.x, m.y,
         row_number() OVER (
           PARTITION BY r.window_start ORDER BY m.time_ms, m.event_id
         ) AS rn,
         count(*) OVER (PARTITION BY r.window_start) AS n_movs
  FROM mov m
  JOIN recent r ON date_trunc('second', m.ts) = r.window_start
  WHERE m.user_id = {DEFAULT_USER}
)
SELECT user_id, window_start, n_movs, x AS first_x, y AS first_y
FROM ranked WHERE rn = 1
""",
)
def serving_projection_movs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 count=false: serve raw movement lists (functions.js:351), projected
    to flat hash-checkable columns (size + head element)."""
    agg = movement_aggregates(_events(spark, sf_dir))
    sel = range_scan(
        agg, user_id=DEFAULT_USER, upto=NOW, descending=True, limit=10, project_movs=True
    )
    head = F.element_at("movs", 1)
    return sel.select(
        "user_id",
        "window_start",
        F.size("movs").cast("long").alias("n_movs"),
        head["x"].alias("first_x"),
        head["y"].alias("first_y"),
    )


# --- A3: scalar sum over a poll result ------------------------------------------


@register(
    "serving_poll_sum",
    oracle=f"""
WITH {_AGG_CTE}
SELECT sum(cnt)::BIGINT AS total_events
FROM agg
WHERE user_id = {DEFAULT_USER} AND window_start > TIMESTAMP '{CURSOR}'
""",
)
def serving_poll_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 running total (functions.js:171-175)."""
    agg = movement_aggregates(_events(spark, sf_dir))
    return poll_sum(agg, user_id=DEFAULT_USER, after=CURSOR)


# --- one poll tick as ONE plan: page + running total fused -------------------------


@register(
    "serving_poll_page_fused",
    oracle=f"""
WITH {_AGG_CTE},
matched AS (
  SELECT user_id, window_start, cnt,
         CAST(sum(cnt) OVER () AS BIGINT) AS total_events
  FROM agg
  WHERE user_id = {DEFAULT_USER} AND window_start > TIMESTAMP '{CURSOR}'
)
SELECT user_id, window_start, cnt, total_events
FROM matched
WHERE window_start <= TIMESTAMP '{NOW}'
ORDER BY window_start DESC
LIMIT 10
""",
)
def serving_poll_page_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One poll tick (page fetch + the client's running total,
    functions.js:156-175) served as a SINGLE job — the r8 serving-
    concurrency fix: two actions per poll capped the 64-client sf1 sweep at
    ~15 qps on pure scheduler overhead (see plans/serving.py::
    poll_page_with_total and the sweep record in SCALING.md). r9 promotion
    pool; fused-vs-composed differential in tests/test_serving_concurrency.py."""
    agg = movement_aggregates(_events(spark, sf_dir))
    return poll_page_with_total(agg, DEFAULT_USER, after=CURSOR, upto=NOW, limit=10)


# --- Q6: cursor bootstrap ---------------------------------------------------------


@register(
    "serving_cursor_bootstrap",
    oracle=f"""
WITH {_AGG_CTE}
SELECT max(window_start) AS last_evaluated_key
FROM agg
WHERE user_id = {DEFAULT_USER} AND window_start <= TIMESTAMP '{NOW}'
""",
)
def serving_cursor_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 resume-cursor bootstrap (functions.js:317-323): newest existing
    window at query time."""
    agg = movement_aggregates(_events(spark, sf_dir))
    return cursor_bootstrap(agg, user_id=DEFAULT_USER, now=NOW)


# --- W2: last-10 retention for every user ----------------------------------------


@register(
    "last10_per_user",
    oracle=f"""
WITH {_AGG_CTE},
ranked AS (
  SELECT user_id, window_start, cnt,
         row_number() OVER (PARTITION BY user_id ORDER BY window_start DESC) AS rn
  FROM agg
)
SELECT user_id, window_start, cnt, rn::BIGINT AS rn
FROM ranked WHERE rn <= 10
""",
)
def last10_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 sliding last-N retention (functions.js:177-181), scalable form:
    row_number over a per-user desc window."""
    agg = movement_aggregates(_events(spark, sf_dir))
    return last_n_windows(agg, n=10)


# --- E3: heatmap rollup (W3 LOCF + A4) --------------------------------------------


_HEATMAP_ORACLE = f"""
WITH {_MOV_CTE},
recent AS (
  SELECT date_trunc('second', ts) AS window_start
  FROM events
  WHERE user_id = {DEFAULT_USER} AND date_trunc('second', ts) <= TIMESTAMP '{NOW}'
  GROUP BY 1
  ORDER BY window_start DESC
  LIMIT 10
),
flat AS (
  SELECT m.*
  FROM mov m
  JOIN recent r ON date_trunc('second', m.ts) = r.window_start
  WHERE m.user_id = {DEFAULT_USER}
),
locf AS (
  SELECT
    last_value(CASE WHEN NOT (x = 0 AND y = 0) THEN x END IGNORE NULLS) OVER w AS cx,
    last_value(CASE WHEN NOT (x = 0 AND y = 0) THEN y END IGNORE NULLS) OVER w AS cy
  FROM flat
  WINDOW w AS (PARTITION BY user_id ORDER BY time_ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT cx AS x, cy AS y, count(*) AS cnt
FROM locf
WHERE cx IS NOT NULL
GROUP BY 1, 2
"""


@register("heatmap_rollup", oracle=_HEATMAP_ORACLE)
def heatmap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 end-to-end: last-10 windows -> flatten movs -> W3 LOCF sentinel
    imputation (functions.js:358-391) -> A4 grouped position counts."""
    agg = movement_aggregates(_events(spark, sf_dir))
    return heatmap_counts(agg, user_id=DEFAULT_USER, now=NOW, n_windows=10)


@register(
    "heatmap_max_intensity",
    oracle=f"WITH pts AS ({_HEATMAP_ORACLE}) SELECT max(cnt) AS max_cnt FROM pts",
)
def heatmap_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 max intensity normalizer (functions.js:357,388)."""
    agg = movement_aggregates(_events(spark, sf_dir))
    return heatmap_max_intensity(
        heatmap_counts(agg, user_id=DEFAULT_USER, now=NOW, n_windows=10)
    )


# --- W3 standalone: LOCF imputation over the raw stream ---------------------------


@register(
    "locf_impute_value",
    oracle=f"""
SELECT event_id,
       user_id,
       last_value(CASE WHEN NOT ({SENTINEL_SQL}) THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_value
FROM events
""",
)
def locf_impute_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 as a standalone operator: carry the last non-sentinel ``value``
    forward per user; rows before the first real observation stay null
    (the drop-leading-sentinel branch, functions.js:379-381)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(
        F.when(F.col("event_type") != "error", F.col("value")), ignorenulls=True
    ).over(w)
    return _events(spark, sf_dir).select(
        "event_id", "user_id", carried.alias("carried_value")
    )


# --- A4 global + A5 + A6 -----------------------------------------------------------


@register(
    "grouped_count_by_position",
    oracle=f"""
WITH {_MOV_CTE}
SELECT x, y, count(*) AS cnt
FROM mov
WHERE NOT is_sentinel
GROUP BY 1, 2
""",
)
def grouped_count_by_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 grouped count by composite position key over the whole stream
    (functions.js:356-391, engine-side instead of a JS associative array)."""
    mov = movements(_events(spark, sf_dir))
    return (
        mov.filter(~F.col("is_sentinel"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "global_event_count",
    oracle="SELECT count(*) AS n FROM events",
)
def global_event_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 lifetime counter (functions.js:19,257,262)."""
    return _events(spark, sf_dir).agg(F.count(F.lit(1)).alias("n"))


@register(
    "sum_value_by_user",
    oracle="""
SELECT user_id,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       count(*) AS n_events
FROM events
GROUP BY user_id
""",
)
def sum_value_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 generalized: per-user sum. Summed in DECIMAL(18,2) on both engines
    so the result is exact and order-independent (float sums diverge in the
    last ulp across engines/partitionings), then served as DOUBLE."""
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --- scalar function parity (F1-F15) -----------------------------------------------


@register(
    "scalar_functions_parity",
    oracle=f"""
WITH {_MOV_CTE}
SELECT event_id,
       epoch(date_trunc('second', ts))::BIGINT AS epoch_s,
       time_ms AS epoch_millis,
       strftime(ts, '%H:%M:%S') AS time_str,
       strftime(ts, '%I:%M:%S %p') AS time_12h,
       x || ':' || y AS pos_key,
       string_split(x || ':' || y, ':')[1]::BIGINT AS decoded_x,
       string_split(x || ':' || y, ':')[2]::BIGINT AS decoded_y,
       greatest(x - 1000, 0) AS clamped,
       floor(x / 7.0)::BIGINT AS floored,
       concat(substr(md5(event_id::VARCHAR), 1, 8), '-',
              substr(md5(event_id::VARCHAR), 9, 4), '-',
              substr(md5(event_id::VARCHAR), 13, 4), '-',
              substr(md5(event_id::VARCHAR), 17, 4), '-',
              substr(md5(event_id::VARCHAR), 21, 12)) AS guid
FROM mov
""",
)
def scalar_functions_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F15 parity in one projection (SURVEY.md §2.5): epoch seconds (F2),
    epoch millis (F3), wall-clock formatting (F4), 12-hour clock (F5),
    'x:y' key encode/decode (F6/F7), numeric coercion via cast (F8),
    clamp-to-zero (F11), floor (F13), and a deterministic md5-derived
    guid surrogate for F1 (uuid() itself is non-deterministic, so the
    differential check uses a seeded equivalent)."""
    mov = movements(_events(spark, sf_dir))
    md5 = F.md5(F.col("event_id").cast("string"))
    key = F.concat_ws(":", "x", "y")
    return mov.select(
        "event_id",
        F.col("ts").cast("long").alias("epoch_s"),
        F.col("time_ms").alias("epoch_millis"),
        F.date_format("ts", "HH:mm:ss").alias("time_str"),
        F.date_format("ts", "hh:mm:ss a").alias("time_12h"),
        key.alias("pos_key"),
        F.element_at(F.split(key, ":"), 1).cast("long").alias("decoded_x"),
        F.element_at(F.split(key, ":"), 2).cast("long").alias("decoded_y"),
        F.greatest(F.col("x") - 1000, F.lit(0)).alias("clamped"),
        F.floor(F.col("x") / 7.0).alias("floored"),
        F.concat_ws(
            "-",
            F.substring(md5, 1, 8),
            F.substring(md5, 9, 4),
            F.substring(md5, 13, 4),
            F.substring(md5, 17, 4),
            F.substring(md5, 21, 12),
        ).alias("guid"),
    )


@register("uuid_generate")  # nondeterministic by definition -> rows-only check
def uuid_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 literally: a real RFC-4122 version-4 ``uuid()`` per event
    (functions.js:38-46 generates one client-side per captured record). No
    SQL oracle is possible — every call draws fresh randomness — so the
    driver records a rows-only check; tests/test_hashing.py pins the format
    and the version/variant bits instead. The deterministic md5-derived
    surrogate in scalar_functions_parity remains the value-hash-checked
    stand-in."""
    return _events(spark, sf_dir).select(
        "event_id",
        F.expr("uuid()").alias("uuid"),
    )


# --- F9/F10: JSON serde --------------------------------------------------------------


@register(
    "json_extract_props",
    oracle="""
SELECT event_id,
       CASE WHEN props IS NOT NULL AND json_valid(props)
            THEN json_extract_string(props, '$.k')::BIGINT END AS k,
       CASE WHEN props IS NOT NULL AND json_valid(props)
            THEN json_extract_string(props, '$.missing') END AS missing
FROM events
""",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 JSON parse of the loosely-typed payload column (the reference's
    records are JSON-on-the-wire, functions.js:211)."""
    return _events(spark, sf_dir).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


_HEATMAP_CLIENT_ORACLE = f"""
WITH {_MOV_CTE},
recent AS (
  SELECT date_trunc('second', ts) AS window_start
  FROM events
  WHERE user_id = {DEFAULT_USER} AND date_trunc('second', ts) <= TIMESTAMP '{NOW}'
  GROUP BY 1
  ORDER BY window_start DESC
  LIMIT 10
),
flat AS (
  SELECT m.*, r.window_start
  FROM mov m
  JOIN recent r ON date_trunc('second', m.ts) = r.window_start
  WHERE m.user_id = {DEFAULT_USER}
),
locf AS (
  SELECT
    last_value(CASE WHEN NOT (x = 0 AND y = 0) THEN x END IGNORE NULLS) OVER w AS cx,
    last_value(CASE WHEN NOT (x = 0 AND y = 0) THEN y END IGNORE NULLS) OVER w AS cy
  FROM flat
  WINDOW w AS (PARTITION BY user_id ORDER BY window_start DESC, time_ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT cx AS x, cy AS y, count(*) AS cnt
FROM locf
WHERE cx IS NOT NULL
GROUP BY 1, 2
"""


@register("heatmap_rollup_client_order", oracle=_HEATMAP_CLIENT_ORACLE)
def heatmap_rollup_client_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 in the reference client's EXACT iteration order (windows DESC from
    the reverse-scan response, movs ASC within each window — functions.js:
    356-391): the reference-faithful companion to heatmap_rollup, which uses
    global event-time order. Shipping both makes the documented LOCF
    divergence (plans/heatmap.py) a user choice instead of a behavior gap."""
    from ..plans.heatmap import heatmap_counts_client_order

    agg = movement_aggregates(_events(spark, sf_dir))
    return heatmap_counts_client_order(agg, user_id=DEFAULT_USER, now=NOW, n_windows=10)


# --- VARIANT semi-structured path (Spark 4) ----------------------------------------


@register(
    "variant_props_extract",
    oracle="""
WITH j AS (
  SELECT event_id,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k
  FROM events
)
SELECT event_id, k, k % 10 AS k_mod,
       CASE WHEN k >= 50 THEN 'hi' ELSE 'lo' END AS k_band
FROM j WHERE k IS NOT NULL
""",
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: the JSON
    payload is parsed ONCE into the binary variant encoding
    (``parse_json``) and fields are read with typed path extraction
    (``try_variant_get``) — the modern engine path that replaces
    per-access string re-parsing (json_extract_props is the classic
    get_json_object form; this row pins the new one against the same
    DuckDB JSON oracle). try_variant_get returns NULL on path/type
    misses, matching the oracle's CAST-NULL semantics.

    Scale: parse_json is per-row JVM work inside codegen, and the variant
    binary is columnar-friendly — one parse feeding N typed extractions
    is exactly why the type exists; at 100 TB you'd persist the variant
    column and let shredding prune paths at the scan."""
    ev = spread(load_table(spark, sf_dir, "events"))
    # try_parse_json, not parse_json: corrupt transport payloads must
    # surface as NULL variants, never fail the scan (the decode_wire_events
    # PERMISSIVE contract; parse_json is FAILFAST and crashed on the r8
    # adversarial fixture's malformed props)
    v = ev.select("event_id", F.try_parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "long")
    return (
        v.select(
            "event_id",
            k.alias("k"),
            (k % 10).alias("k_mod"),
            F.when(k >= 50, F.lit("hi")).otherwise(F.lit("lo")).alias("k_band"),
        )
        .filter(F.col("k").isNotNull())
    )
