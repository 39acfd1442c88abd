"""Flagship end-to-end query (driver smoke check): the reference's whole
analytics surface composed into one plan — per-user 1 s tumbling-window
aggregation (A1/A2/W1), last-10-window retention per user (W2), movement
flattening + LOCF sentinel imputation (W3), and the grouped heatmap rollup
(A4) — i.e. E2+E3 of SURVEY.md §3 for every user at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..io import SMOKE_SF_DIR, load_table
from .heatmap import flatten_movs, locf_positions
from .movements import movement_aggregates


def flagship(spark: SparkSession, sf_dir: str = SMOKE_SF_DIR, n_windows: int = 10) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    agg = movement_aggregates(events)

    # W2: each user's 10 most-recent windows (ranking window, not a client loop).
    w = Window.partitionBy("user_id").orderBy(F.col("window_start").desc())
    recent = (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_windows)
        .select("user_id", "window_start", "cnt", "movs")
    )

    # E3: flatten + LOCF + grouped per-position counts, per user.
    imputed = locf_positions(flatten_movs(recent))
    return (
        imputed.groupBy("user_id", "x", "y")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("user_id", "x", "y")
    )
