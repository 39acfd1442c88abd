"""Relational operator suite (SURVEY.md §2.6: the surface the reference lacks
but the north star mandates): joins of every flavor (broadcast, sort-merge,
semi, anti, as-of, range), set ops, distinct, rollup/cube/grouping sets, and
ranking/analytic windows — all over the TPC-H-ish star schema.

Float policy: money columns are summed as DECIMAL on both engines (exact,
order-independent — double sums diverge across engines/partitionings in the
last ulp) and served as DOUBLE. Ratios divide two exact numbers, so both
engines perform the identical single IEEE division.

Scale notes are per-query docstrings; the common themes: dimension joins are
broadcast (no shuffle of the fact side), fact-fact joins shuffle on the join
key once and AQE handles skew, and every aggregation is partial-aggregated
map-side before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..io import load_table
from ..registry import register

DEC = "decimal(18,2)"


def _dsum(col: str) -> F.Column:
    return F.sum(F.col(col).cast(DEC)).cast("double")


# --- TPC-H Q1-style pricing summary (wide agg, the classic scan+agg shape) ----


@register(
    "tpch_q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) * CAST(1 + l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-11-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + filter + wide hash aggregate. The filter reaches the parquet
    scan (PushedFilters) and only 8 of 11 columns are read (ReadSchema);
    partial aggregation runs map-side so the exchange carries ~|groups| rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ep, di, tx, qt = (F.col(c).cast(DEC) for c in ("l_extendedprice", "l_discount", "l_tax", "l_quantity"))
    one_minus_disc = (F.lit(1) - F.col("l_discount")).cast(DEC)
    one_plus_tax = (F.lit(1) + F.col("l_tax")).cast(DEC)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-11-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qt).cast("double").alias("sum_qty"),
            F.sum(ep).cast("double").alias("sum_base_price"),
            F.sum(ep * one_minus_disc).cast("double").alias("sum_disc_price"),
            F.sum(ep * one_minus_disc * one_plus_tax).cast("double").alias("sum_charge"),
            (F.sum(qt).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(ep).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(di).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- star-schema join with broadcast dimensions --------------------------------


@register(
    "star_join_revenue_by_region",
    oracle="""
SELECT r.r_name AS region,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def star_join_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact->dim->dim->dim chain with every dimension explicitly broadcast:
    the fact table never shuffles for the joins (BroadcastHashJoin x3), only
    the final small aggregation exchanges. This is the plan shape that
    survives a 1000-executor 100 TB fact scan."""
    orders = load_table(spark, sf_dir, "orders")
    customer = F.broadcast(load_table(spark, sf_dir, "customer"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(_dsum("o_totalprice").alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


# --- fact-fact join (shuffled hash / sort-merge territory) ----------------------


@register(
    "join_orders_lineitem_priority",
    oracle="""
SELECT o.o_orderpriority AS priority,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
""",
)
def join_orders_lineitem_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The big fact-fact equi-join: both sides shuffle on o_orderkey once
    (sort-merge or shuffled-hash per AQE stats; skew split is automatic).
    At 100 TB the win is bucketing both tables on orderkey — then this is a
    zero-shuffle join; the declarative plan is identical either way."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    revenue = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- semi / anti joins -----------------------------------------------------------


@register(
    "semi_join_customers_with_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
""",
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: existence check without fan-out (never duplicates the
    left side, never materializes the right's payload columns)."""
    customer = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return customer.join(
        big_orders, customer.c_custkey == big_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "anti_join_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join. Oracle uses NOT EXISTS (not NOT IN) so its NULL
    semantics match Spark's left_anti exactly even if o_custkey had NULLs."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "full_outer_join_supplier_customer_nations",
    oracle="""
WITH s AS (
  SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
  FROM supplier GROUP BY s_nationkey
),
c AS (
  SELECT c_nationkey AS nationkey, count(*) AS n_customers
  FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
)
SELECT coalesce(s.nationkey, c.nationkey) AS nationkey,
       coalesce(n_suppliers, 0) AS n_suppliers,
       coalesce(n_customers, 0) AS n_customers
FROM s FULL OUTER JOIN c ON s.nationkey = c.nationkey
""",
)
def full_outer_join_supplier_customer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join — the one outer shape semi/anti/left don't cover:
    per-nation supplier counts against rich-customer counts, keeping nations
    that appear on only one side (zero-filled). Aggregating BEFORE the join
    keeps both sides |nations|-sized, so the outer join is a tiny
    hash-partition merge no matter how large the fact tables are — the
    pre-aggregate-then-outer-join pattern any reconciliation report uses."""
    sup = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return sup.join(cust, "nationkey", "full_outer").select(
        "nationkey",
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
    )


# --- set operations ----------------------------------------------------------------


@register(
    "set_ops_nations",
    oracle="""
SELECT 'union' AS op, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'intersect' AS op, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'except' AS op, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT
  SELECT s_nationkey FROM supplier
)
""",
)
def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three set operations in one tagged union (fused from the former
    set_union_nations / set_intersect_nations / set_except_nations so the
    family lands one hard-signal row inside the driver's 50-query cap):
    UNION (distinct) is union + hash-dedup on the output key, INTERSECT and
    EXCEPT are Spark's set-semantic intersect/subtract."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    tagged = (
        c.union(s).distinct().select(F.lit("union").alias("op"), "nationkey")
        .unionAll(c.intersect(s).select(F.lit("intersect").alias("op"), "nationkey"))
        .unionAll(c.subtract(s).select(F.lit("except").alias("op"), "nationkey"))
    )
    return tagged


# --- distinct ------------------------------------------------------------------------


@register(
    "distinct_part_supp_pairs",
    oracle="""
SELECT count(*) AS n_pairs FROM (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
""",
)
def distinct_part_supp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_partkey", "l_suppkey").distinct().agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register("approx_distinct_parts")  # approximate -> no SQL oracle; rows-only check
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB-scale substitute for
    exact distinct (no shuffle of distinct keys, constant-size sketch state).
    Approximate by design, so the driver records a rows-only check; the pytest
    suite bounds its relative error against the exact count instead."""
    li = load_table(spark, sf_dir, "lineitem")
    # split aggs (see approx_distinct_error_bound): one mixed
    # DISTINCT+sketch agg forces the Expand path
    approx = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts")
    )
    # NULL-key filter matches count(DISTINCT ...) / approx_count_distinct
    # semantics (both exclude NULLs); without it a hostile NULL-key fixture
    # would count one extra "distinct" value on the exact side only
    exact = (
        li.select("l_partkey")
        .filter(F.col("l_partkey").isNotNull())
        .distinct()
        .agg(F.count(F.lit(1)).alias("exact_parts"))
    )
    return approx.crossJoin(exact)


HLL_RSD = 0.01  # requested relative standard deviation
HLL_BOUND = 5 * HLL_RSD  # 5-sigma acceptance band for the property gate


@register(
    "approx_distinct_error_bound",
    oracle="""
SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS within_bound
FROM lineitem
""",
)
def approx_distinct_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTERNAL property gate for the HyperLogLog++ path (the
    'pinned as an identity' pattern): |approx - exact| / exact must stay
    within 5x the requested rsd. Spark's HLL++ is deterministic for a given
    dataset, so the boolean is stable, and SQL cannot reproduce the sketch
    value itself — which is exactly why approx_distinct_parts stays
    rows-only while THIS row value-hash-checks the sketch's contract at
    the driver. A register-width regression or merge bug flips the column
    and the row goes red.

    Scale: one aggregate-only pass (both the sketch and the exact distinct
    are map-side partial); at 100 TB the exact side is the expensive one —
    the audit would run on a sampled stratum while production trusts the
    sketch this gate certifies."""
    li = load_table(spark, sf_dir, "lineitem")
    # two separate 1-row aggregates, not one mixed agg: combining a
    # DISTINCT aggregate with the sketch in a single agg forces Catalyst's
    # Expand path (every row duplicated per aggregate group) — measured
    # 2.9 s vs 0.8 s at sf0.1 for the split + crossJoin form, which keeps
    # both sides map-side partial
    approx = li.agg(
        F.approx_count_distinct("l_partkey", rsd=HLL_RSD).alias("approx_parts")
    )
    # NULL-key filter: count(DISTINCT) in the oracle excludes NULLs, and so
    # does approx_count_distinct — the exact side must agree or a hostile
    # NULL-l_partkey fixture flips the hash (ADVICE r9)
    exact = (
        li.select("l_partkey")
        .filter(F.col("l_partkey").isNotNull())
        .distinct()
        .agg(F.count(F.lit(1)).alias("exact_parts"))
    )
    agg = approx.crossJoin(exact)
    rel_err = F.abs(F.col("approx_parts") - F.col("exact_parts")) / F.col(
        "exact_parts"
    )
    return agg.select(
        F.col("exact_parts").cast("long").alias("exact_parts"),
        (rel_err <= F.lit(HLL_BOUND)).alias("within_bound"),
    )


# --- rollup / cube / grouping sets ----------------------------------------------------


@register(
    "rollup_flag_status",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag, flag+status, grand total)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), _dsum("l_quantity").alias("sum_qty")
    )


@register(
    "cube_flag_status",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), _dsum("l_quantity").alias("sum_qty")
    )


@register(
    "grouping_sets_priority_status",
    oracle="""
SELECT o_orderpriority, o_orderstatus, count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
""",
)
def grouping_sets_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """
    )


# --- ranking / analytic windows ---------------------------------------------------------


@register(
    "window_topk_orders_per_customer",
    oracle="""
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
         dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS drnk
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice, rn::BIGINT AS rn, rnk::BIGINT AS rnk, drnk::BIGINT AS drnk
FROM ranked WHERE rn <= 3
""",
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key top-k via ranking windows (the distributed form of the
    reference's client-side last-N eviction, generalized). One shuffle on the
    partition key; ties broken deterministically by o_orderkey."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_lag_lead_user_values",
    oracle="""
SELECT event_id, user_id, value,
       lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
       value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
FROM events
""",
)
def window_lag_lead_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics over per-user event-time order. The delta is a
    single IEEE subtraction of identical operands on both engines — exact."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


# --- as-of join (event-time alignment) ----------------------------------------------------

# Orders key into the events' user_id space via o_custkey % CUSTKEY_MOD; the
# single module constant feeds both oracles, both Spark plans, and the
# range-join probe prefilter bounds so they cannot drift.
CUSTKEY_MOD = 16


_ASOF_ORACLE = f"""
WITH tagged AS (
  SELECT user_id AS k, ts AS t, 0 AS tag, event_id, value,
         CAST(NULL AS BIGINT) AS o_orderkey
  FROM events
  UNION ALL
  SELECT o_custkey % {CUSTKEY_MOD}, o_orderdate, 1, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), o_orderkey
  FROM orders
),
carried AS (
  SELECT *,
         last_value(CASE WHEN tag = 0 THEN t END IGNORE NULLS) OVER w AS last_event_ts,
         last_value(CASE WHEN tag = 0 THEN value END IGNORE NULLS) OVER w AS last_event_value
  FROM tagged
  WINDOW w AS (PARTITION BY k ORDER BY t, tag, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT o_orderkey, k AS join_key, last_event_ts, last_event_value
FROM carried WHERE tag = 1
"""


@register("asof_join_orders_events", oracle=_ASOF_ORACLE)
def asof_join_orders_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: for each order, the most recent event with the
    same key at-or-before the order date.

    Implemented the scale-native way: union the two tagged streams, single
    shuffle+sort on (key, time, tag), then last-ignorenulls carries the event
    payload onto each order row. One exchange total — no per-row lookups, no
    O(n*m) range join, no driver involvement. Event rows sort before order
    rows at equal timestamps (tag 0 < 1), giving inclusive <= semantics.
    """
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(0).alias("tag"),
        "event_id",
        "value",
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % CUSTKEY_MOD).alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        "o_orderkey",
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = events.unionByName(orders).select(
        "*",
        F.last(F.when(F.col("tag") == 0, F.col("t")), ignorenulls=True)
        .over(w)
        .alias("last_event_ts"),
        F.last(F.when(F.col("tag") == 0, F.col("value")), ignorenulls=True)
        .over(w)
        .alias("last_event_value"),
    )
    return carried.filter(F.col("tag") == 1).select(
        "o_orderkey", F.col("k").alias("join_key"), "last_event_ts", "last_event_value"
    )


# --- range join -----------------------------------------------------------------------------


@register(
    "range_join_events_before_orders",
    oracle=f"""
SELECT o.o_orderkey, count(e.event_id) AS n_events
FROM orders o
LEFT JOIN events e
  ON e.user_id = o.o_custkey % {CUSTKEY_MOD}
 AND e.ts > o.o_orderdate - INTERVAL 1 DAY
 AND e.ts <= o.o_orderdate
GROUP BY o.o_orderkey
""",
)
def range_join_events_before_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band/range join: events in the 24 h window before each order, per key.

    The equi-key is COMPOSITE — (key, day_bucket) — so the shuffle fans out
    over |keys| x |distinct days| reduce partitions instead of capping
    parallelism at CUSTKEY_MOD=16 keys (a hard ceiling and guaranteed skew at
    100x scale). The 24 h band relative to a date boundary spans at most two
    calendar days, so each event is credited to its own day and the next
    (explode of two buckets = bounded 2x replication of the already
    prefiltered probe side); exactly one replica can satisfy the bucket
    equality for a given order, so the band filter introduces no duplicates.
    The time band itself stays a post-join filter — the shape Spark executes
    as an equi-join, never a cartesian."""
    orders = load_table(spark, sf_dir, "orders")
    # constraint-derived prefilter: the equi-key is
    # o_custkey % CUSTKEY_MOD ∈ [0, CUSTKEY_MOD), so events outside that key
    # range can never match — pushing the filter shrinks the probe side ~10x
    # at this fixture's user cardinality (Catalyst cannot infer range
    # constraints through %, so it is stated explicitly); bounds and join key
    # derive from the same constant so they cannot drift
    events = (
        load_table(spark, sf_dir, "events")
        .filter((F.col("user_id") >= 0) & (F.col("user_id") < CUSTKEY_MOD))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.explode(
                F.array(F.to_date("ts"), F.date_add(F.to_date("ts"), 1))
            ).alias("day_bucket"),
        )
    )
    cond = (
        (events.user_id == orders.o_custkey % CUSTKEY_MOD)
        & (events.day_bucket == F.to_date(orders.o_orderdate))
        & (events.ts > orders.o_orderdate - F.expr("INTERVAL 1 DAY"))
        & (events.ts <= orders.o_orderdate)
    )
    return (
        orders.join(events, cond, "left")
        .groupBy("o_orderkey")
        .agg(F.count("event_id").alias("n_events"))
    )


# --- TPC-H Q3-shape: shipping priority (filtered 3-way join + top-k) -------------


@register(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey AS o_orderkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY 1, 3, 4
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: selective dimension filter broadcast into the fact chain,
    both date predicates pushed to their scans, global top-10 via
    TakeOrderedAndProject (only 10 rows ever reach the driver/exchange)."""
    customer = F.broadcast(
        load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    revenue = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("o_orderkey"), "o_orderdate", "o_orderpriority"
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


# --- TPC-H Q5-shape: regional supplier volume (6-way join) ------------------------


@register(
    "tpch_q5_region_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY 1
""",
)
def tpch_q5_region_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: the classic 6-way join. Every dimension (customer, supplier,
    nation, region) broadcasts; only orders><lineitem shuffles, once, on the
    order key. The c_nationkey = s_nationkey condition rides the supplier
    broadcast as a post-join predicate — no extra exchange."""
    customer = F.broadcast(load_table(spark, sf_dir, "customer"))
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    revenue = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


# --- TPC-H Q18-shape: large-volume orders (agg-filter semi join) -------------------


@register(
    "tpch_q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
)
SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM orders o
JOIN big b ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3, 4
""",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING-filtered aggregate as a semi-join driver. The big
    aggregation runs once; its tiny result broadcasts back against orders,
    so the fact table is filtered before the re-join with lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = F.broadcast(load_table(spark, sf_dir, "customer"))
    qty = F.col("l_quantity").cast(DEC)
    big = F.broadcast(
        li.groupBy("l_orderkey").agg(F.sum(qty).alias("q")).filter(F.col("q") > 300).select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(qty).cast("double").alias("total_qty"))
    )


# --- SQL front-end -------------------------------------------------------------------


@register(
    "sql_frontend_revenue_by_nation",
    oracle="""
SELECT n.n_name,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
""",
)
def sql_frontend_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same engine through the SQL TEXT front-end: tables registered as
    temp views, the query submitted as a literal ``spark.sql(...)`` string —
    proving a reference user can keep writing SQL and get the identical
    Catalyst plan the DataFrame API produces (both compile to the same
    logical plan; the dimension joins broadcast, the aggregate is
    decimal-exact). View names are scoped by the fixture dir so concurrent
    scale factors in one session never collide."""
    import re as _re

    tag = _re.sub(r"[^0-9a-zA-Z]", "_", sf_dir).strip("_")
    for t in ("customer", "orders", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_{tag}")
    return spark.sql(f"""
        SELECT n.n_name,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               count(*) AS n_orders
        FROM orders_{tag} o
        JOIN customer_{tag} c ON c.c_custkey = o.o_custkey
        JOIN nation_{tag} n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
    """)


# --- correlated subquery (decorrelated to a window) ------------------------------------


@register(
    "orders_above_customer_avg",
    oracle="""
WITH stats AS (
  SELECT *,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS DOUBLE)
           / count(*) OVER (PARTITION BY o_custkey) AS cust_avg,
         count(*) OVER (PARTITION BY o_custkey) AS cust_orders
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice, cust_avg, cust_orders
FROM stats
WHERE cust_orders > 1 AND CAST(o_totalprice AS DOUBLE) > cust_avg
""",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated-scalar-subquery shape (``WHERE o_totalprice > (SELECT
    avg(...) FROM orders i WHERE i.o_custkey = o.o_custkey)``) in its
    decorrelated form — an analytic window over the correlation key, which
    is how Catalyst itself rewrites such subqueries: ONE shuffle on
    o_custkey instead of a per-row re-aggregation. The per-customer mean is
    a DECIMAL sum divided once (exact, order-independent); single-order
    customers are excluded (a row is never above its own degenerate
    average)."""
    w = Window.partitionBy("o_custkey")
    o = load_table(spark, sf_dir, "orders")
    dec_sum = F.sum(F.col("o_totalprice").cast(DEC)).over(w)
    n = F.count(F.lit(1)).over(w)
    stats = o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        (dec_sum.cast("double") / n).alias("cust_avg"),
        n.alias("cust_orders"),
    )
    return stats.filter(
        (F.col("cust_orders") > 1)
        & (F.col("o_totalprice").cast("double") > F.col("cust_avg"))
    )


# --- TPC-H Q4-shape: EXISTS-driven priority count ---------------------------------


@register(
    "tpch_q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o.o_orderpriority
""",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape adapted to the fixture schema (it carries no
    commit/receipt dates — the reference fixture's lineitem ends at
    l_shipdate, so the EXISTS predicate becomes 'shipped after the order
    date'): orders counted by priority where ANY line item satisfies a
    correlated inequality. The plan is the canonical EXISTS decorrelation:
    a LEFT SEMI join on the order key with the inequality as a join-side
    residual — the fact-fact semi join shuffles each side once on the key
    and lineitem rows never duplicate orders (semi join short-circuits on
    first match)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --- TPC-H Q6-shape: pushdown filter + scalar aggregate ---------------------------


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_quantity < 24 AND l_discount >= 0.05 AND l_discount <= 0.07
""",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: the pushdown showcase — a tight scan filter (quantity +
    discount band) feeding one scalar decimal aggregate. Both predicates
    reach the parquet reader as PushedFilters (asserted in
    tests/test_plans.py), so row groups outside the band never decompress;
    the aggregate is a map-side partial + single-row reduce. The discount
    band compares stored doubles against the exact literals 0.05/0.07 —
    identical parses in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)
    return (
        li.filter(
            (F.col("l_quantity") < 24)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
        )
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


# --- TPC-H Q7-shape: volume shipping between two nations ---------------------------


@register(
    "tpch_q7_volume_shipping",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_4')
         OR (n1.n_name = 'NATION_4' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                         AND TIMESTAMP '1996-12-31 00:00:00'
) shipping
GROUP BY 1, 2, 3
""",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two named nations by ship
    year. The nation pair disjunction lives on the joined row, but both
    nation tables are first pre-filtered to the two named nations — at 100 TB
    that turns the customer/supplier broadcasts into semi-filtered subsets
    (only rows in either nation survive their broadcast hash join) before
    the single orders><lineitem shuffle. Year bucketing is a scan-side
    expression; the final group-by has ~2x2xYears groups — map-side partial
    aggregation collapses it before one tiny exchange."""
    pair = ("NATION_1", "NATION_4")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    supplier = F.broadcast(
        load_table(spark, sf_dir, "supplier").join(n1, F.col("s_nationkey") == F.col("s_nk"))
    )
    customer = F.broadcast(
        load_table(spark, sf_dir, "customer").join(n2, F.col("c_nationkey") == F.col("c_nk"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    volume = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    return (
        li.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(volume).cast("double").alias("revenue"))
    )


# --- TPC-H Q10-shape: returned-item report (top-20 customers) ----------------------


@register(
    "tpch_q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       c.c_acctbal, n.n_name AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 4, 5
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: who returned the most revenue last quarter. The quarter
    predicate prunes orders at the scan; the returnflag predicate prunes
    lineitem at the scan (both PushedFilters); customer+nation broadcast, so
    the only shuffle is orders><lineitem on the order key followed by the
    customer-grain partial agg. Top-20 with a deterministic revenue/custkey
    tie-break is TakeOrderedAndProject — per-partition local heaps, 20 rows
    to the driver, no global sort."""
    customer = F.broadcast(load_table(spark, sf_dir, "customer"))
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .join(nation, F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "nation")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --- TPC-H Q14-shape: promotion revenue share --------------------------------------


@register(
    "tpch_q14_promo_revenue",
    oracle="""
WITH j AS (
  SELECT CASE WHEN p.p_type = 'PROMO'
              THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))
              ELSE CAST(0 AS DECIMAL(18,2)) END AS promo_rev,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS total_rev
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
)
SELECT CAST(100.0 * CAST(sum(promo_rev) AS DOUBLE) / CAST(sum(total_rev) AS DOUBLE) AS DOUBLE) AS promo_pct,
       CAST(sum(promo_rev) AS DOUBLE) AS promo_revenue,
       CAST(sum(total_rev) AS DOUBLE) AS total_revenue
FROM j
""",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional-aggregate ratio after a dimension join. The
    one-month ship window is a pushed scan filter; part broadcasts (it's the
    small dim), so there is NO shuffle at all before the single-row global
    aggregate — the plan is scan -> broadcast hash join -> partial agg ->
    1-row reduce. Both sums are DECIMAL-exact; the percentage is computed as
    100.0 * promo / total in doubles, the identical two IEEE ops in both
    engines (multiply first, then divide — parenthesization mirrored)."""
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp"))
    )
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    zero = F.lit(0).cast(DEC)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue_d"),
            F.sum(rev).cast("double").alias("total_revenue_d"),
        )
        .select(
            (F.lit(100.0) * F.col("promo_revenue_d") / F.col("total_revenue_d")).alias("promo_pct"),
            F.col("promo_revenue_d").alias("promo_revenue"),
            F.col("total_revenue_d").alias("total_revenue"),
        )
    )


# --- TPC-H Q8-shape: national market share -----------------------------------------


@register(
    "tpch_q8_market_share",
    oracle="""
WITH all_nations AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA'
    AND p.p_type = 'STANDARD'
    AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                          AND TIMESTAMP '1996-12-31 00:00:00'
)
SELECT o_year,
       CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume
                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
            / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS mkt_share,
       CAST(sum(volume) AS DOUBLE) AS total_volume
FROM all_nations
GROUP BY o_year
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: the 8-way market-share join. Every dimension broadcasts
    (part filtered on type, customer pre-joined to its ASIA-filtered
    nation/region leg, supplier pre-joined to its nation), the orders date
    band is a pushed scan filter, so the only shuffle is orders><lineitem.
    The share is two DECIMAL-exact sums and ONE double division per year —
    bit-identical in both engines."""
    part = F.broadcast(load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD"))
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust_leg = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_leg = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    volume = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    zero = F.lit(0).cast(DEC)
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_leg, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_leg, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", volume).otherwise(zero))
            .cast("double")
            .alias("nation_volume"),
            F.sum(volume).cast("double").alias("total_volume"),
        )
        .select(
            "o_year",
            (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
            "total_volume",
        )
    )


# --- TPC-H Q19-shape: disjunctive predicate revenue --------------------------------


@register(
    "tpch_q19_disjunctive_revenue",
    oracle="""
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: the disjunctive-predicate benchmark. The WHERE is a
    3-branch OR mixing both tables' columns; Catalyst factors the common
    conjuncts per side (CNF conversion), so each branch's part-side terms
    (brand, size) prune the broadcast dim BEFORE the join and the
    quantity bands reach the lineitem scan as an OR-of-ranges PushedFilter
    — the plan every optimizer paper grades OR-pushdown on. One broadcast
    join, one 1-row aggregate, zero shuffles of the fact side."""
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            branch("Brand#1", 15, 1, 11)
            | branch("Brand#2", 25, 10, 20)
            | branch("Brand#3", 35, 20, 30)
        )
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- TPC-H Q15-shape: top supplier(s) by revenue -----------------------------------


@register(
    "tpch_q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the revenue view + global-max filter (keeps ALL tied
    maxima, which a LIMIT 1 would not). The quarter predicate is a pushed
    scan filter; revenue is one supplier-keyed aggregate; the max is a
    1-row aggregate broadcast back as a join-free filter (Catalyst plans
    the scalar subquery as a broadcast exchange reused against the view),
    and only the winners join the supplier dim."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).cast("double").alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(supplier, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- TPC-H Q16-shape: supplier diversity per part attribute ------------------------


@register(
    "tpch_q16_supplier_diversity",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 20
""",
)
def tpch_q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: DISTINCT aggregate after a dimension join — how many
    distinct suppliers serve each (brand, type, size). The brand exclusion
    prunes the broadcast dim before the join; count(DISTINCT) expands to
    the two-phase partial-distinct plan (dedupe on (keys, suppkey) map-side,
    then count) so the exchange carries pre-deduped rows; top-20 with a
    full deterministic tie-break is TakeOrderedAndProject."""
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(20)
    )


# --- RFM customer segmentation ------------------------------------------------------


@register(
    "rfm_customer_segments",
    oracle="""
WITH anchor AS (
  SELECT max(o_orderdate) AS mx FROM orders
),
base AS (
  SELECT o.o_custkey AS c_custkey,
         CAST(date_diff('day', max(o.o_orderdate), a.mx) AS BIGINT) AS recency_days,
         count(*) AS frequency,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
  FROM orders o, anchor a
  GROUP BY o.o_custkey, a.mx
),
scored AS (
  SELECT c_custkey, recency_days, frequency, monetary,
         CAST(ntile(4) OVER (ORDER BY recency_days DESC, c_custkey) AS BIGINT) AS r_score,
         CAST(ntile(4) OVER (ORDER BY frequency, c_custkey) AS BIGINT) AS f_score,
         CAST(ntile(4) OVER (ORDER BY monetary, c_custkey) AS BIGINT) AS m_score
  FROM base
)
SELECT c_custkey, recency_days, frequency, monetary,
       r_score, f_score, m_score,
       r_score * 100 + f_score * 10 + m_score AS rfm_code
FROM scored
""",
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — recency (days since last order, against the
    corpus max date so the operator is a pure function of the data),
    frequency, monetary (DECIMAL-exact), each quartile-scored with ntile
    so 4 is always the best bucket (most recent / most frequent / highest
    spend), composed into the classic 3-digit RFM code. Every ntile
    ordering carries a c_custkey tie-break, so bucket boundaries are
    deterministic and cross-engine identical.

    Scale: one customer-grain aggregate, then three ntile windows over the
    CUSTOMER table (not the fact table). A global ntile needs a global
    sort of customer-grain rows — the documented scale-out swap is
    percentile-bound bucketing (approx quantile cutoffs broadcast as a
    pure filter), identical buckets up to boundary ties."""
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("mx"))
    base = (
        orders.crossJoin(F.broadcast(anchor))
        .groupBy(F.col("o_custkey").alias("c_custkey"), "mx")
        .agg(
            F.datediff(F.max("mx"), F.max("o_orderdate")).cast("long").alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("monetary"),
        )
        .drop("mx")
    )
    r_w = Window.orderBy(F.col("recency_days").desc(), "c_custkey")
    f_w = Window.orderBy("frequency", "c_custkey")
    m_w = Window.orderBy("monetary", "c_custkey")
    scored = base.select(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(r_w).cast("long").alias("r_score"),
        F.ntile(4).over(f_w).cast("long").alias("f_score"),
        F.ntile(4).over(m_w).cast("long").alias("m_score"),
    )
    return scored.withColumn(
        "rfm_code",
        F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"),
    )


# --- 2-D binned aggregate (dashboard heatmap shape) --------------------------------

BIN2D_QTY = 5.0       # quantity bin width
BIN2D_PRICE = 10000.0  # extended-price bin width


@register(
    "lineitem_2d_histogram",
    oracle=f"""
SELECT CAST(floor(l_quantity / {BIN2D_QTY}) AS BIGINT) AS qty_bin,
       CAST(floor(l_extendedprice / {BIN2D_PRICE}) AS BIGINT) AS price_bin,
       count(*) AS n,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_discount
FROM lineitem
GROUP BY 1, 2
""",
)
def lineitem_2d_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D binned aggregate over (quantity, extended price) with a per-cell
    mean discount — the density-heatmap shape every dashboard scatter
    renders once raw points stop fitting on screen (and the server-side
    pre-aggregation that makes it O(cells) to ship instead of O(rows)).
    Bin ids are floor divisions of stored doubles by exact binary-friendly
    or identical-literal widths — the same two IEEE ops in both engines;
    the cell mean is a DECIMAL sum over one count division.

    Scale: a pure scan + one grouped aggregate on the (cheap, low-card)
    cell key; map-side partials collapse the fact table before the
    exchange, which carries only |cells| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_quantity") / BIN2D_QTY).cast("long").alias("qty_bin"),
            F.floor(F.col("l_extendedprice") / BIN2D_PRICE).cast("long").alias("price_bin"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("l_discount").cast(DEC)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_discount"),
        )
    )


# --- Ratio-to-report window (percent of total) --------------------------------------


@register(
    "orders_share_by_priority",
    oracle="""
WITH per AS (
  SELECT o_orderpriority,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue_dec,
         count(*) AS n_orders
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(revenue_dec AS DOUBLE) AS revenue,
       n_orders,
       CAST(revenue_dec AS DOUBLE) / CAST(sum(revenue_dec) OVER () AS DOUBLE) AS revenue_share,
       CAST(n_orders AS DOUBLE) / CAST(sum(n_orders) OVER () AS DOUBLE) AS order_share
FROM per
""",
)
def orders_share_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each priority's share of total revenue and order
    count via an unbounded empty-partition window OVER the already-reduced
    aggregate — the reporting idiom behind every percent-of-total column.
    The window runs over |priorities| rows (the fact table was collapsed
    first), so the global frame costs nothing. The denominator is summed
    as DECIMAL THROUGH the window (exact, order-independent — a double
    window sum diverges in the last ulp because the engines reduce the
    partition in different orders; measured on this very query) and cast
    once, so the share is a single identical IEEE division in both
    engines."""
    per = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).alias("revenue_dec"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.partitionBy()
    return per.select(
        "o_orderpriority",
        F.col("revenue_dec").cast("double").alias("revenue"),
        "n_orders",
        (
            F.col("revenue_dec").cast("double")
            / F.sum("revenue_dec").over(w).cast("double")
        ).alias("revenue_share"),
        (F.col("n_orders").cast("double") / F.sum("n_orders").over(w).cast("double")).alias(
            "order_share"
        ),
    )


# --- TPC-H Q13-shape: customer order-count distribution ---------------------------


@register(
    "tpch_q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: left-outer join with a residual predicate ON THE JOIN
    (priority exclusion — filtering in WHERE would silently drop the
    zero-order customers the query exists to count), then two stacked
    aggregations: orders-per-customer, customers-per-order-count. The
    fixture lacks o_comment, so the classic 'not like %special%requests%'
    becomes a priority-class exclusion with identical plan shape.

    Scale: the outer join shuffles both sides on custkey once; the first
    aggregate reuses that partitioning (no second exchange — custkey is
    the grouping key), and the distribution aggregate exchanges only
    |distinct counts| rows. count(o_orderkey) counts non-null matches
    only, which is what makes the left join's padding rows land in the
    c_count=0 bucket on both engines."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- TPC-H Q17-shape: small-quantity-order revenue --------------------------------


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
WITH brand_lines AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#3'
),
thresholds AS (
  SELECT l_partkey,
         0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) AS thr
  FROM brand_lines GROUP BY l_partkey
)
SELECT CAST(sum(CAST(b.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM brand_lines b JOIN thresholds t ON b.l_partkey = t.l_partkey
WHERE b.l_quantity < t.thr
""",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: the correlated per-part average-quantity subquery,
    decorrelated to a WINDOW over the brand's lineitems — each row
    compares against its part's mean quantity computed in the same pass
    (an aggregate-then-join form would scan lineitem twice; the window
    form is one scan, one partkey shuffle). The per-part threshold is
    0.2 x mean quantity computed as a DECIMAL-exact window sum over one
    count division and one literal multiply — three identical IEEE ops
    in both engines, so the strict < comparison cannot flap on summation
    order.

    Scale: the brand filter prunes the broadcast part dim BEFORE the
    fact join (the fact side never shuffles for it); the window
    partitions the pruned brand stream by partkey — one exchange of
    |brand lineitems| rows; the final sum is a 1-row aggregate."""
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    )
    li = load_table(spark, sf_dir, "lineitem")
    brand_lines = li.join(part, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    thr = F.lit(0.2) * (
        F.sum(F.col("l_quantity").cast(DEC)).over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double")
    )
    return (
        brand_lines.withColumn("thr", thr)
        .filter(F.col("l_quantity") < F.col("thr"))
        .agg((F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


# --- TPC-H Q22-shape: wealthy inactive customers ----------------------------------


@register(
    "tpch_q22_inactive_wealthy",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS ab
  FROM customer WHERE c_acctbal > 0.0
)
SELECT n.n_name AS nation,
       count(*) AS numcust,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
CROSS JOIN avg_bal a
WHERE c.c_acctbal > a.ab
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY n.n_name
""",
)
def tpch_q22_inactive_wealthy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: a global scalar aggregate (average positive balance)
    broadcast back as a filter, composed with an anti join against orders
    (customers who never ordered) and a nation rollup. The fixture lacks
    c_phone, so the country-code substring becomes the nation dim the
    schema actually has — same plan: scalar subquery + NOT EXISTS + group.

    Scale: the average is a 1-row aggregate crossJoin-broadcast (no
    driver collect); the anti join is the shuffle — it keys both sides on
    custkey once, and AQE converts it to broadcast-anti when the order
    side's distinct custkeys fit; the nation dim is broadcast. The
    balance filter is applied before the anti join so only above-average
    customers shuffle at all."""
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("ab")
        )
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum("c_acctbal").alias("totacctbal"),
        )
    )


# --- TPC-H Q2-shape: minimum-cost supplier per part -------------------------------


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
WITH pcost AS (
  SELECT l.l_partkey, l.l_suppkey, min(l.l_extendedprice) AS supply_cost
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_regionkey = 1
  GROUP BY 1, 2
),
sized AS (
  SELECT pc.*, p.p_name
  FROM pcost pc JOIN part p ON p.p_partkey = pc.l_partkey
  WHERE p.p_size < 8
),
ranked AS (
  SELECT *, min(supply_cost) OVER (PARTITION BY l_partkey) AS best
  FROM sized
)
SELECT r.l_partkey AS p_partkey, r.p_name, s.s_name, n.n_name AS nation,
       r.supply_cost
FROM ranked r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE r.supply_cost = r.best
""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each qualifying part, the supplier(s) offering the
    minimum cost within one region — the correlated-min subquery of the
    original, with the fixture's lineitem history standing in for the
    partsupp catalog it lacks (cost of a (part, supplier) pair = the
    minimum price that pair ever shipped at). All ties are kept, like the
    original's `ps_supplycost = (SELECT min...)`. The compared cost is a
    stored double propagated untouched through min(), so the equality
    filter cannot flap across engines.

    Scale: region prunes supplier to a broadcast list BEFORE the fact
    scan joins it (the fact side never shuffles for the dim); the
    (part, supplier) aggregate shuffles once on a two-column key; the
    per-part min is a window over that already-reduced table (|pairs|
    rows, not |lineitems|); the size-filtered part dim is broadcast and
    applied before the window to shrink its input."""
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    supp_region = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(nation.filter(F.col("n_regionkey") == 1), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    part_sized = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") < 8)
        .select("p_partkey", "p_name")
    )
    li = load_table(spark, sf_dir, "lineitem")
    pcost = (
        li.join(supp_region, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    sized = pcost.join(part_sized, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_suppkey", "supply_cost", "p_name"
    )
    w = Window.partitionBy("l_partkey")
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        sized.withColumn("best", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("best"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "s_name",
            F.col("n_name").alias("nation"),
            "supply_cost",
        )
    )


# --- TPC-H Q9-shape: product-line profit by nation and year -----------------------


@register(
    "tpch_q9_product_profit",
    oracle="""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
         - 0.8 * CAST(sum(CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%gear%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
""",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit per (supplier nation, order year) for one product
    line — the widest join tree in TPC-H (fact x 3 dims x fact). The
    fixture has no ps_supplycost, so cost is modeled as 80% of retail
    price x quantity; to stay cross-engine exact, revenue and cost are
    summed as separate DECIMAL aggregates and the 0.8 factor is applied
    once on the already-exact double — two IEEE ops per group, not one
    rounding per row.

    Scale: the part name filter prunes the broadcast dim to ~13% before
    the fact join; supplier and nation are broadcast; the only real
    shuffle is the lineitem-orders equi-join on orderkey, and the final
    aggregate carries |nations x years| groups. This is the plan a
    100 TB fact table needs: one fact-fact exchange, everything else
    riding map-side."""
    part_g = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    cost = F.col("p_retailprice").cast(DEC) * F.col("l_quantity").cast(DEC)
    return (
        li.join(part_g, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            (
                F.sum(rev).cast("double") - F.lit(0.8) * F.sum(cost).cast("double")
            ).alias("profit")
        )
    )


# --- TPC-H Q11-shape: concentrated-value parts ------------------------------------


@register(
    "tpch_q11_important_stock",
    oracle="""
WITH pv AS (
  SELECT l.l_partkey,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value_dec
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_regionkey = 2
  GROUP BY 1
)
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM pv
WHERE CAST(value_dec AS DOUBLE)
      > 1.5 * ((SELECT CAST(sum(value_dec) AS DOUBLE) FROM pv)
               / (SELECT CAST(count(*) AS DOUBLE) FROM pv))
""",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose shipped value within one region exceeds a
    threshold derived from the region's total — the HAVING-over-a-global-
    scalar-subquery pattern (Q15 filters on the global MAX; this one on a
    function of the global SUM, which is the harder case because the
    threshold depends on every group). The threshold is 1.5 x the MEAN
    per-part share (r11, the ok_but_empty catch): the former fixed
    0.001 x total is TPC-H's own scaling trap — the spec scales its
    FRACTION by 1/SF precisely because a fixed fraction of total goes
    unreachable as the part catalog grows (measured here: 33 rows at
    sf0.001, 0 at sf0.1 where every part holds ~1/20000 of total); the
    mean-relative form is scale-free (33/290/2864 rows at
    sf0.001/0.01/0.1). Per-part values are DECIMAL-exact; the grand total
    and count are exact aggregates of those group sums (associative,
    order-free), so the threshold is one IEEE divide + multiply in both
    engines.

    Scale: region prunes supplier to a broadcast list before the fact
    join; the per-part aggregate shuffles once on partkey; the grand
    total is a 1-row re-aggregate of the |parts|-sized intermediate,
    broadcast back — the fact table is scanned exactly once and the
    second pass runs over group sums, not rows."""
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    supp_region = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(nation.filter(F.col("n_regionkey") == 2), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    pv = (
        li.join(supp_region, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("value_dec"))
    )
    total = pv.agg(
        F.sum("value_dec").alias("total_dec"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec").cast("double")
            > F.lit(1.5)
            * (F.col("total_dec").cast("double") / F.col("n_parts").cast("double"))
        )
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


# --- TPC-H Q12-shape: late-shipment priority counts -------------------------------


@register(
    "tpch_q12_shipclass_priority",
    oracle="""
SELECT l.l_linestatus AS ship_class,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= o.o_orderdate
  AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
""",
)
def tpch_q12_shipclass_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: fact-fact join with a residual cross-table predicate
    (shipdate >= orderdate — the commitdate/receiptdate chronology check
    the fixture's columns allow) plus a pushed year band, then a
    conditional aggregate splitting order priorities into high/low counts
    per line class (l_linestatus stands in for the missing l_shipmode;
    the group-by-CASE-count plan is identical).

    Scale: the year band reaches the lineitem scan as PushedFilters
    before the join; the orderkey equi-join is the one shuffle and the
    chronology predicate evaluates as a post-join filter on already
    co-located rows; the CASE counts partial-aggregate map-side into
    |classes| rows."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = orders.join(li, F.col("o_orderkey") == F.col("l_orderkey")).filter(
        F.col("l_shipdate") >= F.col("o_orderdate")
    )
    grouped = joined.groupBy(F.col("l_linestatus").alias("ship_class")).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )
    return grouped


# --- TPC-H Q20-shape: excess-availability suppliers -------------------------------


@register(
    "tpch_q20_excess_suppliers",
    oracle="""
WITH sp AS (
  SELECT l.l_suppkey, l.l_partkey, sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '%bolt%'
  GROUP BY 1, 2
),
ptot AS (SELECT l_partkey, sum(qty) AS tot FROM sp GROUP BY 1)
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
        SELECT sp.l_suppkey FROM sp JOIN ptot ON sp.l_partkey = ptot.l_partkey
        WHERE CAST(sp.qty AS DOUBLE) > 0.1 * CAST(ptot.tot AS DOUBLE))
  AND s.s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
""",
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: the double-nested semi-join chain — suppliers (in one
    region) who hold an outsized share of any one product line's flow.
    The original's `ps_availqty > 0.5 * sum(l_quantity)` correlated
    subquery becomes: per-(supplier, part) shipped quantity exceeding 10%
    of that part's total, with the part set pre-filtered by name. Both
    IN-subqueries stay semi joins (no multiplicity leak into the output).

    Scale: the name filter prunes the broadcast part dim; the
    (supplier, part) aggregate shuffles once on the pair key; the
    per-part totals re-aggregate the |pairs|-sized intermediate (no
    second fact scan) and join back on partkey; both IN lists resolve as
    broadcast LeftSemi against the 100-row supplier dim."""
    part_sel = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    sp = (
        li.join(part_sel, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
    )
    ptot = sp.groupBy("l_partkey").agg(F.sum("qty").alias("tot"))
    excess = (
        sp.join(ptot, "l_partkey")
        .filter(F.col("qty").cast("double") > F.lit(0.1) * F.col("tot").cast("double"))
        .select("l_suppkey")
    )
    nation_r = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2).select("n_nationkey")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        supplier.join(excess, supplier.s_suppkey == excess.l_suppkey, "left_semi")
        .join(nation_r, supplier.s_nationkey == nation_r.n_nationkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


# --- TPC-H Q21-shape: suppliers who kept orders waiting ---------------------------


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
SELECT s.s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_regionkey = 1
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY 1
""",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the EXISTS + NOT-EXISTS self-join pair — for finalized
    orders, count per supplier the late line items where the order was
    multi-supplier yet THIS supplier was the only late one. 'Late' is
    shipdate > orderdate + 90 days (the fixture's stand-in for the
    receiptdate > commitdate check). The oracle keeps the literal
    correlated-EXISTS formulation; this side runs the decorrelation
    Catalyst cannot do automatically for the pair: one pass computes
    per-order distinct-supplier and distinct-late-supplier counts, and
    the EXISTS/NOT-EXISTS become `n_supp > 1 AND n_late = 1` on the late
    rows — proven row-identical to the correlated form.

    Scale: lineitem joins the F-orders once on orderkey and BOTH the
    per-order aggregate and the qualify join reuse that partitioning (a
    correlated-subquery plan would scan lineitem three times; this scans
    it once). Supplier and nation are broadcast; the output aggregate
    carries |suppliers| groups."""
    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    ol = li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("late"),
    )
    per_order = ol.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation_r = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1).select("n_nationkey")
    )
    return (
        ol.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation_r, F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --- Bag-semantics set ops (EXCEPT ALL / INTERSECT ALL) ---------------------------


@register(
    "bag_set_ops_priorities",
    oracle="""
WITH early AS (
  SELECT o_orderpriority AS prio FROM orders
  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
),
late AS (
  SELECT o_orderpriority AS prio FROM orders
  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
)
SELECT 'except_all' AS op, prio, count(*) AS n
FROM (SELECT prio FROM early EXCEPT ALL SELECT prio FROM late)
GROUP BY 2
UNION ALL
SELECT 'intersect_all' AS op, prio, count(*) AS n
FROM (SELECT prio FROM early INTERSECT ALL SELECT prio FROM late)
GROUP BY 2
""",
)
def bag_set_ops_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — the BAG-semantics siblings of
    set_ops_nations' distinct set ops, which most engines get subtly wrong
    by deduplicating first: per value v, EXCEPT ALL keeps
    max(count_a(v) - count_b(v), 0) copies and INTERSECT ALL keeps
    min(count_a, count_b). The probe multisets are order priorities before
    vs after a date split, so every value survives with a nontrivial
    multiplicity; the result re-groups the surviving bag so the
    multiplicities themselves are value-hash checked.

    Scale: Catalyst plans both as a single aggregate computing per-value
    counts on each side then a generate replicating the difference/min —
    one shuffle on the value key, never a row-by-row anti join; the
    grouped output collapses it right back, which AQE fuses into the same
    exchange."""
    orders = load_table(spark, sf_dir, "orders")
    split = F.lit("1998-01-01 00:00:00").cast("timestamp")
    early = orders.filter(F.col("o_orderdate") < split).select(
        F.col("o_orderpriority").alias("prio")
    )
    late = orders.filter(F.col("o_orderdate") >= split).select(
        F.col("o_orderpriority").alias("prio")
    )
    ex = (
        early.exceptAll(late)
        .groupBy("prio")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "prio", "n")
    )
    inter = (
        early.intersectAll(late)
        .groupBy("prio")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "prio", "n")
    )
    return ex.unionAll(inter)


# --- Null-aware anti join (NOT IN three-valued logic) -----------------------------


@register(
    "not_in_null_semantics",
    oracle="""
SELECT
  (SELECT count(*) FROM customer
   WHERE c_nationkey NOT IN
     (SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000.0)) AS clean_list_survivors,
  (SELECT count(*) FROM customer
   WHERE c_nationkey NOT IN
     (SELECT CASE WHEN s_acctbal >= 0 THEN s_nationkey END
      FROM supplier WHERE s_acctbal > 9000.0 OR s_acctbal < 0)) AS null_poisoned_survivors
""",
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN under SQL three-valued logic — the classic correctness trap a
    plain left-anti join gets wrong: one NULL in the subquery list makes
    `x NOT IN (list)` UNKNOWN for every non-matching x, so the poisoned
    variant must return ZERO survivors while the clean variant returns
    thousands. Expressed through the SQL front-end because this is
    precisely the case where the DataFrame `left_anti` join is NOT
    equivalent; Catalyst plans it as NullAwareAntiJoin (a broadcast join
    carrying the extra null-existence check) rather than a plain anti
    join. Both counts ride in one row so the driver hash pins both
    semantics at once.

    Scale: each branch is a broadcast null-aware anti join against a
    filtered 100-row dim list plus a 1-row count aggregate — the fact side
    scans once per branch and never shuffles."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    customer.createOrReplaceTempView("nins_customer")
    supplier.createOrReplaceTempView("nins_supplier")
    return spark.sql(
        """
SELECT
  (SELECT count(*) FROM nins_customer
   WHERE c_nationkey NOT IN
     (SELECT s_nationkey FROM nins_supplier WHERE s_acctbal > 9000.0)) AS clean_list_survivors,
  (SELECT count(*) FROM nins_customer
   WHERE c_nationkey NOT IN
     (SELECT CASE WHEN s_acctbal >= 0 THEN s_nationkey END
      FROM nins_supplier WHERE s_acctbal > 9000.0 OR s_acctbal < 0)) AS null_poisoned_survivors
"""
    )


# --- point-in-time feature join (leakage-free training features) -------------------


@register(
    "pit_feature_join_orders",
    oracle=f"""
SELECT o.o_orderkey,
       o.o_custkey % {CUSTKEY_MOD} AS join_key,
       count(e.event_id) AS n_prior_events,
       CAST(coalesce(sum(CAST(e.value AS DECIMAL(18,2))), 0) AS DOUBLE) AS prior_value_sum
FROM orders o
LEFT JOIN events e
  ON e.user_id = o.o_custkey % {CUSTKEY_MOD} AND e.ts < o.o_orderdate
GROUP BY 1, 2
""",
)
def pit_feature_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature join — the feature-store shape that keeps
    training data leakage-free: each order (the 'label' row) is enriched
    with the key's CUMULATIVE event features (count, exact value sum)
    STRICTLY BEFORE its own timestamp; an event at exactly the order's
    time must NOT count, because at serving time it would not have been
    visible yet. The as-of join answers 'what was the last event'; this
    answers 'what had accumulated', which is what feature pipelines
    actually ship.

    Implemented with the same one-shuffle tagged-union machinery as the
    as-of join, with the tag order INVERTED (label rows sort before
    feature rows at equal timestamps, so equal-ts events are excluded —
    the strict-< leakage pin, asserted in tests/test_analytics.py). The
    cumulative sum is a window over DECIMAL, exact under any partitioning.
    The oracle is the naive expanded left join + group; this plan carries
    each row once through ONE (key)-partitioned sort — no |orders| x
    |events| intermediate at any point, which is the difference at
    100 TB."""
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("tag"),  # feature rows AFTER label rows at equal t
        "event_id",
        F.col("value").cast(DEC).alias("v"),
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % CUSTKEY_MOD).alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast(DEC).alias("v"),
        "o_orderkey",
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = events.unionByName(orders).select(
        "*",
        F.count(F.when(F.col("tag") == 1, F.lit(1))).over(w).alias("n_prior_events"),
        F.sum(F.when(F.col("tag") == 1, F.col("v"))).over(w).alias("prior_sum_dec"),
    )
    return carried.filter(F.col("tag") == 0).select(
        "o_orderkey",
        F.col("k").alias("join_key"),
        "n_prior_events",
        F.coalesce(F.col("prior_sum_dec").cast("double"), F.lit(0.0)).alias(
            "prior_value_sum"
        ),
    )


# --- blocked fuzzy matching (entity-resolution candidate generation) ---------------


@register(
    "fuzzy_match_blocked_pairs",
    oracle="""
WITH names AS (
  SELECT p_name, string_split(p_name, ' ')[2] AS block, count(*) AS cnt
  FROM part GROUP BY 1, 2
),
cross_pairs AS (
  SELECT a.block, levenshtein(a.p_name, b.p_name) AS dist,
         a.cnt * b.cnt AS weight
  FROM names a JOIN names b
    ON a.block = b.block AND a.p_name < b.p_name
),
same_pairs AS (
  SELECT block, 0 AS dist, cnt * (cnt - 1) // 2 AS weight
  FROM names WHERE cnt >= 2
)
SELECT block, CAST(dist AS BIGINT) AS dist,
       CAST(sum(weight) AS BIGINT) AS n_pairs
FROM (SELECT * FROM cross_pairs WHERE dist <= 3 UNION ALL SELECT * FROM same_pairs)
GROUP BY 1, 2
""",
)
def fuzzy_match_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate generation: fuzzy name matching as
    blocking + within-block pairwise edit distance — the record-linkage
    shape (Fellegi-Sunter style pipelines) none of the token-set dedup
    family covers, because edit distance sees transpositions and
    single-character noise that shingle Jaccard scores as near-zero
    overlap. Blocks are the name's noun token; pairs are generated ONLY
    within a block (never all-pairs corpus-wide), scored with
    levenshtein — the same DP edit distance, integer-exact, in both
    engines — and reported as a per-(block, distance) candidate-volume
    histogram, the calibration table a linkage pipeline thresholds from.

    Scale — attribute-level comparison, the optimization every real ER
    system applies: records collapse to DISTINCT (value, count) rows
    FIRST (one map-side-combined aggregate over the corpus), fuzzy
    pairing runs over distinct values only, and each surviving value
    pair is weighted by cnt_a * cnt_b (same-value record pairs enter at
    distance 0 as cnt choose 2) — numerically IDENTICAL to naive
    record-level pairing, at |distinct values|^2-per-block cost instead
    of |records|^2 (here: 64 names stand in for 20k records; on a
    100 TB corpus the ratio is what makes fuzzy matching feasible at
    all). Residual hot blocks are AQE skew-split territory; multi-pass
    blocking (noun + length band + prefix) tightens further when even
    distinct values are many."""
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name", F.split("p_name", " ").getItem(1).alias("block"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    a = names.select("block", F.col("p_name").alias("na"), F.col("cnt").alias("ca"))
    b = names.select("block", F.col("p_name").alias("nb"), F.col("cnt").alias("cb"))
    cross_pairs = (
        a.join(b, "block")
        .filter(F.col("na") < F.col("nb"))
        .select(
            "block",
            F.levenshtein("na", "nb").cast("long").alias("dist"),
            (F.col("ca") * F.col("cb")).alias("weight"),
        )
        .filter(F.col("dist") <= 3)
    )
    same_pairs = names.filter(F.col("cnt") >= 2).select(
        "block",
        F.lit(0).cast("long").alias("dist"),
        F.expr("cnt * (cnt - 1) DIV 2").alias("weight"),
    )
    return (
        cross_pairs.unionByName(same_pairs)
        .groupBy("block", "dist")
        .agg(F.sum("weight").alias("n_pairs"))
    )


# --- hierarchical ratio-to-report (percent of parent at every level) ---------------


@register(
    "hierarchical_revenue_shares",
    oracle="""
WITH cust AS (
  SELECT c.c_custkey, n.n_name AS nation, r.r_name AS region,
         sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev_dec
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2, 3
)
SELECT c_custkey, nation, region,
       CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(rev_dec AS DOUBLE) / CAST(sum(rev_dec) OVER (PARTITION BY nation) AS DOUBLE) AS share_in_nation,
       CAST(sum(rev_dec) OVER (PARTITION BY nation) AS DOUBLE)
         / CAST(sum(rev_dec) OVER (PARTITION BY region) AS DOUBLE) AS nation_share_in_region,
       CAST(sum(rev_dec) OVER (PARTITION BY region) AS DOUBLE)
         / CAST(sum(rev_dec) OVER () AS DOUBLE) AS region_share_of_total
FROM cust
""",
)
def hierarchical_revenue_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent at every level of the geography hierarchy in one
    result: each customer's share of its nation, the nation's share of its
    region, the region's share of the whole — the drill-down report every
    BI layer renders. Extends the flat ratio-to-report
    (orders_share_by_priority) to NESTED grains: all three denominators
    are DECIMAL window sums over the SAME customer-grain aggregate (exact,
    order-free), so every share is one identical IEEE division per row in
    both engines.

    Scale: the fact collapses to customer grain first (|customers| rows);
    the three windows partition by nation / region / nothing over that
    reduced table — Catalyst orders them narrowest-first so the sorts
    reuse work, and none of the windows ever sees a fact-table row. Dims
    broadcast as in the star join."""
    orders = load_table(spark, sf_dir, "orders")
    customer = F.broadcast(load_table(spark, sf_dir, "customer"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    cust = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(
            "c_custkey",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"))
    )
    w_nation = Window.partitionBy("nation")
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    nat_sum = F.sum("rev_dec").over(w_nation)
    reg_sum = F.sum("rev_dec").over(w_region)
    tot_sum = F.sum("rev_dec").over(w_all)
    return cust.select(
        "c_custkey",
        "nation",
        "region",
        F.col("rev_dec").cast("double").alias("revenue"),
        (F.col("rev_dec").cast("double") / nat_sum.cast("double")).alias("share_in_nation"),
        (nat_sum.cast("double") / reg_sum.cast("double")).alias("nation_share_in_region"),
        (reg_sum.cast("double") / tot_sum.cast("double")).alias("region_share_of_total"),
    )


# --- correlated LATERAL subquery (top-N per row) -----------------------------------


@register(
    "lateral_top_lineitems_per_order",
    oracle="""
SELECT o.o_orderkey, l.l_linenumber,
       CAST(l.l_extendedprice AS DOUBLE) AS l_extendedprice
FROM orders o, LATERAL (
  SELECT l_linenumber, l_extendedprice FROM lineitem
  WHERE l_orderkey = o.o_orderkey
  ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
WHERE o.o_orderpriority = '1-URGENT'
""",
)
def lateral_top_lineitems_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — each urgent order pulls its own top-2
    most expensive line items, expressed as the SQL-standard lateral
    correlation (the form ORMs and BI tools emit) rather than the
    hand-rolled window + filter. Catalyst decorrelates the LIMIT-ed
    lateral into exactly that window plan — per-key rank over one
    orderkey-partitioned exchange — so the declarative form costs the
    same as window_topk_orders_per_customer's explicit one; DuckDB runs
    the identical lateral text, pinning cross-engine LATERAL semantics
    (including the deterministic ORDER BY tie-break inside the lateral).

    Scale: the orders filter prunes before the correlation; no per-row
    re-execution survives optimization — the plan is join + window, not
    nested loops."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lat_lineitem")
    return spark.sql(
        """
SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
FROM lat_orders o, LATERAL (
  SELECT l_linenumber, l_extendedprice FROM lat_lineitem
  WHERE l_orderkey = o.o_orderkey
  ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
WHERE o.o_orderpriority = '1-URGENT'
"""
    )


# --- period-over-period revenue report --------------------------------------------


@register(
    "revenue_month_over_month",
    oracle="""
WITH monthly AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec,
         count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT ym,
       CAST(rev_dec AS DOUBLE) AS revenue,
       n_orders,
       CAST(lag(rev_dec) OVER (ORDER BY ym) AS DOUBLE) AS prev_revenue,
       CASE WHEN lag(rev_dec) OVER (ORDER BY ym) IS NOT NULL
            THEN (CAST(rev_dec AS DOUBLE) - CAST(lag(rev_dec) OVER (ORDER BY ym) AS DOUBLE))
                 / CAST(lag(rev_dec) OVER (ORDER BY ym) AS DOUBLE)
       END AS mom_change
FROM monthly
""",
)
def revenue_month_over_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period report: monthly revenue with the previous
    month's value and the MoM growth rate — the KPI delta every BI layer
    computes, done safely: the month key is integer year*100+month (no
    date truncation ambiguity between engines), revenue stays DECIMAL up
    to the division, and the growth rate subtracts/divides two exact-cast
    doubles in one fixed expression. The first month's change is NULL,
    not zero — absence of a comparison is not zero growth.

    Scale: the fact collapses to |months| rows before the single
    unpartitioned lag window touches anything (a global window is only a
    smell on un-aggregated data)."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym")
    ).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("ym")
    prev = F.lag("rev_dec").over(w)
    return monthly.select(
        "ym",
        F.col("rev_dec").cast("double").alias("revenue"),
        "n_orders",
        prev.cast("double").alias("prev_revenue"),
        F.when(
            prev.isNotNull(),
            (F.col("rev_dec").cast("double") - prev.cast("double")) / prev.cast("double"),
        ).alias("mom_change"),
    )


# --- null-safe equality join semantics ---------------------------------------------


@register(
    "null_safe_join_semantics",
    oracle="""
WITH l AS (
  SELECT o_orderkey, NULLIF(o_orderpriority, '5-LOW') AS k FROM orders
),
r AS (
  SELECT NULLIF(o_orderpriority, '5-LOW') AS k, count(*) AS n
  FROM orders GROUP BY 1
)
SELECT
  (SELECT count(*) FROM l JOIN r ON l.k = r.k) AS std_eq_matches,
  (SELECT count(*) FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k) AS null_safe_matches,
  (SELECT count(*) FROM l WHERE k IS NULL) AS null_keys
""",
)
def null_safe_join_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality (`<=>` / IS NOT DISTINCT FROM) vs standard `=`
    in one row: the low-priority class is NULLed out on both sides, so
    standard equality silently DROPS every such order from the join
    (NULL = NULL is UNKNOWN) while the null-safe form matches them to the
    NULL group — the dbt/warehouse merge-key trap that pairs with
    not_in_null_semantics' three-valued filter trap. The verification is
    arithmetic: null_safe - std == null_keys exactly.

    Scale: both joins are |orders| x |priority-groups| broadcast
    equi-joins (Spark plans <=> as a hash join key like any other); the
    counts are 1-row aggregates."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.nullif(F.col("o_orderpriority"), F.lit("5-LOW"))
    l = orders.select("o_orderkey", k.alias("k"))
    r = orders.groupBy(k.alias("rk")).agg(F.count(F.lit(1)).alias("n"))
    std = l.join(F.broadcast(r), l.k == r.rk).count()
    nsafe = l.join(F.broadcast(r), l.k.eqNullSafe(r.rk)).count()
    nulls = l.filter(F.col("k").isNull()).count()
    return spark.createDataFrame(
        [(std, nsafe, nulls)],
        "std_eq_matches bigint, null_safe_matches bigint, null_keys bigint",
    )


# --- join-size prediction identity -------------------------------------------------


@register(
    "join_size_prediction",
    oracle="""
WITH a AS (SELECT o_custkey AS k, count(*) AS ca FROM orders GROUP BY 1),
b AS (SELECT c_custkey AS k, count(*) AS cb FROM customer GROUP BY 1),
pred AS (
  SELECT CAST(sum(ca * cb) AS BIGINT) AS predicted
  FROM a JOIN b ON a.k = b.k
),
act AS (
  SELECT count(*) AS actual
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT p.predicted, a.actual,
       CAST(p.predicted = a.actual AS BIGINT) AS identity_holds
FROM pred p CROSS JOIN act a
""",
)
def join_size_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality prediction from per-key histograms:
    |A join B| = sum over shared keys of count_A(k) * count_B(k) — the
    formula every cost-based optimizer approximates from sampled
    statistics, computed here EXACTLY and pinned against the real join's
    count in the same row (identity_holds must be 1). The operational
    point: the prediction costs two key-grouped counts and a
    |keys|-sized join — run it BEFORE a fact-fact join to know whether
    the output explodes (hot-key quadratic blowup) without paying for the
    join; it is the query-able form of the skew_concentration_report's
    warning.

    Scale: both histogram aggregates are map-side combinable; the
    prediction join carries |distinct keys| rows. The 'actual' leg exists
    only to pin the identity — a production pre-flight would run the
    prediction alone."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    a = orders.groupBy(F.col("o_custkey").alias("k")).agg(F.count(F.lit(1)).alias("ca"))
    b = customer.groupBy(F.col("c_custkey").alias("k")).agg(F.count(F.lit(1)).alias("cb"))
    pred = a.join(b, "k").agg(F.sum(F.col("ca") * F.col("cb")).alias("predicted"))
    act = orders.join(customer, orders.o_custkey == customer.c_custkey).agg(
        F.count(F.lit(1)).alias("actual")
    )
    return (
        pred.crossJoin(act)
        .select(
            "predicted",
            "actual",
            (F.col("predicted") == F.col("actual")).cast("long").alias("identity_holds"),
        )
    )


# --- recursive CTE hierarchy rollup (Spark 4 WITH RECURSIVE) ------------------------


@register(
    "recursive_hierarchy_rollup",
    oracle="""
WITH RECURSIVE anc AS (
  SELECT p_partkey AS leaf, p_partkey AS node,
         CAST(p_retailprice AS DECIMAL(18,2)) AS price, 0 AS depth
  FROM part
  UNION ALL
  SELECT leaf, node // 10, price, depth + 1
  FROM anc WHERE node >= 10
)
SELECT node AS ancestor,
       count(*) AS n_parts,
       CAST(sum(price) AS DOUBLE) AS subtree_value,
       CAST(max(depth) AS BIGINT) AS max_depth
FROM anc GROUP BY node
""",
)
def recursive_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE, SPARK-24497) walking a
    part hierarchy — each part's ancestor chain by repeated key division —
    and rolling subtree value and size up to EVERY ancestor: the
    BOM-explosion / org-chart aggregation that previously required the
    engine's hand-written iterative loops (dedup_clusters' label
    propagation). Data-dependent recursion depth, declarative text, and
    DuckDB executes the equivalent recursion natively, so the traversal
    itself is value-hash checked. The iterative forms remain the scale
    path for huge graphs (recursion materializes the full frontier per
    step); this row pins that the DECLARATIVE surface exists and agrees.

    Scale: each recursion step is a narrow projection+filter over the
    previous frontier (no joins here), depth is log10(maxkey); the final
    rollup is one grouped aggregate."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("rec_part")
    return spark.sql(
        """
WITH RECURSIVE anc AS (
  SELECT p_partkey AS leaf, p_partkey AS node,
         CAST(p_retailprice AS DECIMAL(18,2)) AS price, 0 AS depth
  FROM rec_part
  UNION ALL
  SELECT leaf, node DIV 10, price, depth + 1
  FROM anc WHERE node >= 10
)
SELECT node AS ancestor,
       count(*) AS n_parts,
       CAST(sum(price) AS DOUBLE) AS subtree_value,
       CAST(max(depth) AS BIGINT) AS max_depth
FROM anc GROUP BY node
"""
    )


# --- Spark 4 modern SQL front-end battery -------------------------------------------


@register(
    "sql_modern_surfaces",
    oracle="""
SELECT lower(CASE WHEN l_linenumber % 2 = 0 THEN upper(l_returnflag)
                  ELSE lower(l_returnflag) END) AS flag_ci,
       count(*) AS n,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc_revenue
FROM lineitem
WHERE l_quantity <= 30
GROUP BY 1
""",
)
def sql_modern_surfaces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four Spark 4 SQL front-end surfaces in one hash-checked flow:
    a SQL-defined scalar function (CREATE FUNCTION ... RETURN, carrying
    the engine's DECIMAL discount-revenue idiom), a session VARIABLE as
    the predicate parameter (DECLARE/SET VAR — the SQL-native
    parameterization BI tools emit), case-insensitive COLLATE UTF8_LCASE
    grouping over a deliberately mixed-case label (upper/lower variants
    of the same flag must land in one group), and SQL pipe syntax (|>)
    driving the whole flow. The oracle is the classic-SQL equivalent —
    lower() normalization, inline arithmetic — so the row pins that the
    ergonomic surfaces change NOTHING semantically.

    Scale: identical plan to the classic form — the UDF inlines, the
    variable folds to a pushed literal, collation is a grouping-key
    property; Catalyst compiles all four away."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("msf_lineitem")
    spark.sql(
        """
CREATE OR REPLACE TEMPORARY FUNCTION msf_disc_revenue(p DOUBLE, d DOUBLE)
RETURNS DECIMAL(37,4)
RETURN CAST(p AS DECIMAL(18,2)) * CAST(1 - d AS DECIMAL(18,2))
"""
    )
    spark.sql("DECLARE OR REPLACE VARIABLE msf_qty_cap DOUBLE DEFAULT 30.0")
    return spark.sql(
        """
FROM msf_lineitem
|> WHERE l_quantity <= msf_qty_cap
|> SELECT CASE WHEN l_linenumber % 2 = 0 THEN upper(l_returnflag)
               ELSE lower(l_returnflag) END AS flag,
          l_extendedprice, l_discount
|> AGGREGATE count(*) AS n,
             CAST(sum(msf_disc_revenue(l_extendedprice, l_discount)) AS DOUBLE) AS disc_revenue
   GROUP BY flag COLLATE UTF8_LCASE AS flag_grp
|> SELECT lower(flag_grp) AS flag_ci, n, disc_revenue
"""
    )


# --- SQL table function (parameterized view) ---------------------------------------


@register(
    "sql_table_function_summary",
    oracle="""
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
""",
)
def sql_table_function_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined TABLE function (CREATE FUNCTION ... RETURNS TABLE — the
    parameterized view, Spark 4's SQL UDTF sibling of the scalar SQL UDF
    in sql_modern_surfaces) applied LATERALLY to every user: each key row
    invokes the function with itself as the argument, and Catalyst
    decorrelates the whole construct back to the plain grouped aggregate
    the oracle states — pinning that the reusable-SQL packaging surface
    is free. This is the form warehouse teams publish curated metrics in:
    one governed definition, callable per key, no plan penalty.

    The function filters with null-safe equality (<=>): a NULL key row
    must aggregate the NULL-user group exactly like GROUP BY does — plain
    equality silently returns the empty aggregate for it (r8 adversarial
    sweep: a phantom (NULL, 0, NULL) row).

    Scale: identical plan to GROUP BY user_id — one map-side-combinable
    aggregate; the table function and lateral both compile away."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("tfs_events")
    spark.sql(
        """
CREATE OR REPLACE TEMPORARY FUNCTION tfs_user_summary(u BIGINT)
RETURNS TABLE(n_events BIGINT, total_value DOUBLE)
RETURN SELECT count(*) AS n_events,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
       FROM tfs_events WHERE user_id <=> u
"""
    )
    return spark.sql(
        """
SELECT u.user_id, s.n_events, s.total_value
FROM (SELECT DISTINCT user_id FROM tfs_events) u,
     LATERAL tfs_user_summary(u.user_id) s
"""
    )
