"""SparkSession factory with scale-oriented defaults.

Local tests run on ``local[N]`` but every setting here is chosen so the same
plans hold on a multi-executor cluster at 100 TB:

- AQE on (runtime re-planning: coalesce shuffle partitions, skew-join split,
  dynamic broadcast conversion).
- UTC session timezone so event-time window semantics are deployment-stable
  and match the DuckDB oracle's naive timestamps.
- Arrow enabled for any pandas-UDF path (vectorized Python boundary).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def default_shuffle_partitions(cores: int) -> int:
    """Static shuffle-partition default: cores // 4, floored at 4, overridable
    via ``$SPARK_GRAFT_SHUFFLE_PARTITIONS`` (clusters set it to match data
    volume, or pass ``shuffle_partitions`` explicitly).

    Why below the core count (r14 measurement, guide §2.2/§1.2): at fixture
    scale every shuffle moves single-digit MB, so reduce-task count is pure
    dispatch overhead — the driver's own 8-core bench beat its 32-core bench
    by 23% (VERDICT r13), and a same-session alternating A/B at 32 cores
    measured 32 -> 8 static partitions as -16% over an 18-query sample
    (iterative loops largest: pagerank 11.4 -> 8.5 s, LPA 8.3 -> 7.4,
    dedup_rate_by_source 3.2 -> 2.7; worst loss tpch_q1 +15%). AQE can only
    COALESCE below the static number, never split above it (except skew),
    so the static value is the parallelism CAP per shuffle: compute-heavy
    stages keep full-core fan-out through spread()/fan_out() (which use
    defaultParallelism = all cores, unchanged), and a 100 TB deployment
    must size this to data volume (100 MB - 1 GB per partition), not
    inherit the fixture-scale default — hence the env override and the
    explicit parameter."""
    env = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    if env:
        return int(env)
    return max(cores // 4, 4)


def get_spark(
    app_name: str = "kinesis-demo-spark",
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the session.

    ``shuffle_partitions`` defaults to ``default_shuffle_partitions`` (cores
    derived, env-overridable — see its docstring for the r14 measurement);
    AQE still coalesces below it by bytes.
    ``extra_confs`` lets a harness set startup-only confs (e.g. the serving
    loop's FAIR scheduler) — ignored if a session already exists in-process.
    """
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or default_shuffle_partitions(cores)),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Let the planner pick shuffled-hash over sort-merge when its size
        # conditions hold, and let AQE rewrite SMJ->SHJ at runtime when every
        # post-shuffle partition is under the threshold: SHJ skips both
        # sides' sorts. Measured same-session min-of-3 at sf0.1 (r13):
        # join_orders_lineitem_priority 4.16->3.31 s, tpch_q9 2.77->2.57,
        # dedup_ngram_jaccard 1.87->1.74, never worse beyond noise. Values
        # are join-strategy-independent (oracle-checked). At cluster scale
        # the 64 MB per-partition build bound is what makes SHJ safe — the
        # AQE advisory size keeps post-shuffle partitions near that bound;
        # SHJ spills in Spark 3.3+ rather than OOMing if estimates are off.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        # local mode hosts the driver AND all 32 executor threads in ONE JVM:
        # an 8g heap put the 60-query bench under old-gen GC churn (measured:
        # mid-bench queries 3-4x their fresh-session warm time, serving p95
        # blowing the 2 s budget). 32g restores executor-like headroom; on a
        # real cluster this knob is per-executor memory, not driver.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Fixture timestamp columns must surface as UTC instants whatever
        # physical type a fixture generation uses: TIMESTAMP(NANOS) scans as
        # int64 (io.load_table converts), naive TIMESTAMP(MICROS) scans as
        # TIMESTAMP_LTZ directly rather than TIMESTAMP_NTZ.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
