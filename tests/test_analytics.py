"""Bounds for the sketch-based aggregates the oracle can't hash-check."""

from __future__ import annotations

from kinesis_demo_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_approx_percentile_error_bounded(spark):
    rows = all_queries()["approx_percentiles_value"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        # accuracy=10000 -> rank error <= n/10000; at fixture n the sketch
        # should land within 1% of the exact median's magnitude
        assert abs(r.approx_median - r.exact_median) <= max(0.01 * abs(r.exact_median), 0.5)


def test_approx_distinct_error_bounded(spark):
    row = all_queries()["approx_distinct_parts"](spark, SF).collect()[0]
    assert abs(row.approx_parts - row.exact_parts) <= 0.05 * row.exact_parts


def test_cms_estimate_is_an_upper_bound_on_exact_counts(spark):
    from kinesis_demo_spark.queries.analytics import heavy_hitters_cms
    from pyspark.sql import functions as F

    from .conftest import SF_SMOKE

    df = heavy_hitters_cms(spark, SF_SMOKE)
    assert df.filter(F.col("cms_est") < F.col("exact_cnt")).count() == 0  # collisions only inflate
    assert df.count() > 0
