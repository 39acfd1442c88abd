"""Serving-layer queries over the movement-aggregate table: the reference's
REST API ``GET /v1/users/{user_id}/movements/{timestamp}?reverse&count&limit``
(functions.js:14-15,156,312,351) decomposed into its relational operators
(SURVEY.md §2.2):

- Q1 keyed equi-filter (one user)
- Q2 sort-key range scan (window_start > cursor / <= now)
- Q3 order toggle (asc/desc)
- Q4 projection switch (counts vs raw movs)
- Q5 limit / top-k by recency
- Q6 incremental cursor resume
- A3 scalar sum over the scan result (functions.js:171-175)

All of these compile to a single Parquet scan with pushed filters + pruned
columns + TakeOrderedAndProject — exactly the physical shape a 100 TB serving
table wants (partition pruning on a date-partitioned lake comes free from the
same predicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .movements import movement_aggregates

# Fixed parameters for the oracle-checked instantiations (the API is
# parameterized; the correctness harness needs deterministic literals).
DEFAULT_USER = 7
CURSOR = "2024-01-16 00:00:00"  # mid-range of the fixture's Jan-2024 event time
NOW = "2024-02-01 00:00:00"  # "query time" pinned after all fixture data


def range_scan(
    agg: DataFrame,
    user_id: int,
    after: str | None = None,
    upto: str | None = None,
    descending: bool = False,
    limit: int | None = None,
    project_movs: bool = False,
) -> DataFrame:
    """The full serving API: Q1+Q2+Q3+Q4+Q5 composed.

    ``after`` is the exclusive forward cursor (functions.js:156,168),
    ``upto`` the inclusive reverse bound (functions.js:309-312,349-351).
    """
    out = agg.filter(F.col("user_id") == F.lit(user_id))
    if after is not None:
        out = out.filter(F.col("window_start") > F.lit(after).cast("timestamp"))
    if upto is not None:
        out = out.filter(F.col("window_start") <= F.lit(upto).cast("timestamp"))
    order = F.col("window_start").desc() if descending else F.col("window_start").asc()
    out = out.orderBy(order)
    if limit is not None:
        out = out.limit(limit)
    cols = ["user_id", "window_start"] + (["movs"] if project_movs else ["cnt"])
    return out.select(*cols)


def poll_sum(agg: DataFrame, user_id: int, after: str) -> DataFrame:
    """A3: the client's running total over one poll's result rows
    (functions.js:171-175) — sum of counts past the cursor."""
    return (
        agg.filter(
            (F.col("user_id") == F.lit(user_id))
            & (F.col("window_start") > F.lit(after).cast("timestamp"))
        )
        .agg(F.sum("cnt").cast("long").alias("total_events"))
    )


def cursor_bootstrap(agg: DataFrame, user_id: int, now: str) -> DataFrame:
    """Q6 bootstrap (functions.js:317-323): newest existing window <= now,
    i.e. the initial value of last_evaluated_key."""
    return (
        agg.filter(
            (F.col("user_id") == F.lit(user_id))
            & (F.col("window_start") <= F.lit(now).cast("timestamp"))
        )
        .agg(F.max("window_start").alias("last_evaluated_key"))
    )


def last_n_windows(agg: DataFrame, n: int = 10) -> DataFrame:
    """W2 for every user at once: each user's n most-recent windows via a
    ranking window function (row_number <= n), the scalable form of the
    client's evict-oldest retention (functions.js:177-181)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("window_start").desc())
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select("user_id", "window_start", "cnt", F.col("rn").cast("long").alias("rn"))
    )


def events_aggregates(events: DataFrame) -> DataFrame:
    """Convenience: the serving table built straight from the events fixture."""
    return movement_aggregates(events)
