"""Registry entry proving the streaming pipeline computes exactly the batch
answer: the fixture stream drained through the Structured Streaming windowed
aggregate (streaming/pipeline.py) is value-hash compared against the plain
batch SQL over the same table. This is the batch/streaming differential the
test strategy calls for (SURVEY.md §5.4), wired into the driver's oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..streaming.pipeline import run_complete_to_memory


@register(
    "streaming_window_counts",
    oracle="""
SELECT user_id,
       date_trunc('second', ts) AS window_start,
       count(*) AS cnt,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs a real Structured Streaming job (file source -> 1 s tumbling
    window agg -> memory sink, availableNow trigger) and returns the drained
    result. Incremental execution, identical answer to the batch oracle."""
    return run_complete_to_memory(spark, sf_dir)
