"""Vectorized-Python UDF surface coverage: the two Arrow-batched shapes not
already exercised elsewhere (mapInPandas → multimodal, applyInPandasWithState
→ sessions):

- scalar ``@pandas_udf``: per-row vectorized transform (pandas str ops),
  batched over Arrow — the 10-100x-over-row-Python path for logic Spark
  expressions can't state cleanly.
- grouped ``applyInPandas``: one pandas DataFrame per group — the escape
  hatch for per-group algorithms (model fits, custom rollups). The kernel
  here uses integer-exact arithmetic (microseconds, cents) so even the
  Python path is value-hash checked against SQL.

Scale: both run executor-side on Arrow batches. applyInPandas materializes
EACH GROUP in one worker's memory — fine for per-user groups, the documented
wrong tool for whale groups (use salted/windowed forms instead;
operators/salting.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf

from ..io import load_table, spread
from ..registry import register


# NOTE: the @pandas_udf wrap happens inside the query function, not at module
# level — Python workers import this module to unpickle the grouped kernel,
# and the decorator's DDL type parsing needs an active session (absent in
# workers).
def _norm_text_kernel(s: pd.Series) -> pd.Series:
    return s.str.lower().str.replace(r" +", " ", regex=True).str.strip()


@register(
    "pandas_udf_text_normalize",
    oracle="""
WITH pre AS (
  -- U+0130 pinned to the FULL Unicode lowercase mapping (i + combining dot
  -- above) BEFORE lower(): Python str.lower and Spark's JVM lower both
  -- produce the 2-codepoint form while DuckDB's lower drops the dot — the
  -- one known simple-vs-full case-mapping divergence (r8 unicode sweep)
  SELECT doc_id, replace(text, chr(304), chr(105) || chr(775)) AS text
  FROM documents
)
SELECT doc_id,
       trim(regexp_replace(lower(text), ' +', ' ', 'g')) AS norm_text,
       CAST(length(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS BIGINT) AS norm_len
FROM pre
""",
)
def pandas_udf_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-vectorized) text normalization, hash-checked
    against the equivalent SQL — proving the Python batch path is lossless."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    norm = pandas_udf(_norm_text_kernel, "string")(F.col("text"))
    return docs.select(
        "doc_id", norm.alias("norm_text"), F.length(norm).cast("long").alias("norm_len")
    )


def _user_stats_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    ts_us = pdf["ts"].astype("int64") // 1000
    # NULL values arrive as NaN; astype("int64") on NaN is a hard crash and
    # the SQL oracle's sum() skips NULLs — drop them, and return NULL (not
    # 0.0) for an all-NULL group, exactly like sum() does (found by the r8
    # adversarial-fixture sweep). A NULL group key likewise surfaces as NaN
    # and must go back as None, not a NaN coerced to bigint.
    vals = pdf["value"].dropna()
    cents = (vals * 100).round().astype("int64")
    uid = pdf["user_id"].iloc[0]
    return pd.DataFrame(
        {
            "user_id": [None if pd.isna(uid) else int(uid)],
            "n_events": [len(pdf)],
            "span_us": [int(ts_us.max() - ts_us.min())],
            "sum_value": [None if vals.empty else cents.sum() / 100.0],
        }
    )


@register(
    "grouped_pandas_user_stats",
    oracle="""
SELECT user_id,
       count(*) AS n_events,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY user_id
""",
)
def grouped_pandas_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInPandas rollup with integer-exact kernel arithmetic
    (microsecond spans, cent sums) — identical to the SQL oracle despite
    running in Python."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").applyInPandas(
        _user_stats_kernel,
        "user_id bigint, n_events bigint, span_us bigint, sum_value double",
    )


# --- mapInArrow ---------------------------------------------------------------------


def _arrow_norm_batches(batches):
    """pyarrow-level kernel: per-vector L2 norm computed with numpy over the
    Arrow buffers — no pandas conversion, no per-row ``as_py()`` (the whole
    batch is viewed as one 2-D float array). Fold order matches dot_fold:
    ascending dimension — ``cumsum(axis=1)[:, -1]`` is a strictly sequential
    left-to-right IEEE fold PER ROW (each partial depends on the previous),
    unlike ``np.add.reduce``/``np.sum``, which use pairwise summation for
    float64 and diverge from the oracle's list_reduce in the last ulp."""
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        vec_ids = batch.column("vec_id")
        emb = batch.column("embedding")
        if hasattr(emb, "offsets"):  # ListArray: variable-length offsets
            off = np.asarray(emb.offsets, dtype="int64")
            lens = np.diff(off)
            vals = np.asarray(emb.values, dtype="float64")
        else:  # FixedSizeListArray: implicit stride
            dim = emb.type.list_size
            off = np.arange(len(emb) + 1, dtype="int64") * dim
            lens = np.full(len(emb), dim, dtype="int64")
            vals = np.asarray(emb.values, dtype="float64")
        if lens.size and lens.min() == lens.max() and lens[0] > 0:
            sq = (vals[off[0] : off[-1]].reshape(len(lens), lens[0])) ** 2
            norms = np.sqrt(sq.cumsum(axis=1)[:, -1])
        else:  # ragged / empty rows: per-row slices of the same buffer
            sq_all = vals**2
            norms = np.array(
                [
                    float(np.sqrt(sq_all[a:b].cumsum()[-1])) if b > a else 0.0
                    for a, b in zip(off[:-1], off[1:])
                ]
            )
        yield pa.RecordBatch.from_arrays(
            [vec_ids, pa.array(norms, type=pa.float64())], names=["vec_id", "nrm"]
        )


@register(
    "map_in_arrow_vector_norms",
    oracle=f"""
SELECT vec_id, sqrt(list_reduce(list_transform(range(1, len(embedding)+1),
       i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (x,y) -> x + y)) AS nrm
FROM embeddings
""",
)
def map_in_arrow_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fifth and last Python-vectorization surface: ``mapInArrow`` —
    raw pyarrow RecordBatches in and out, skipping even the pandas
    conversion the other shapes pay. Kernel computes per-vector L2 norms
    with ``cumsum`` (``np.add.accumulate``), a strictly sequential
    left-to-right IEEE fold identical to the JVM-side ``dot_fold`` and the
    DuckDB oracle's ``list_reduce`` — so even this Python path is
    value-hash exact (``np.add.reduce``/``np.sum`` would NOT be: numpy
    uses pairwise summation there). Per-batch streaming, zero shuffles."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    return emb.mapInArrow(_arrow_norm_batches, schema="vec_id long, nrm double")


# --- Python UDTF (table function) — the sixth Python surface -----------------------


class _SentenceSplitUDTF:
    """Arrow-optimized Python UDTF: one input doc row -> one output row per
    sentence. Defined module-level so executors can unpickle it; registered
    per-session inside the query function."""

    def eval(self, doc_id, text):  # noqa: ANN001 — UDTF protocol signature
        if text is None:
            return
        for idx, sent in enumerate(text.split(". ")):
            yield doc_id, idx + 1, sent, len(sent.split(" "))


@register(
    "udtf_sentence_split",
    oracle="""
SELECT doc_id,
       CAST(s.i AS BIGINT) AS sent_idx,
       s.sent AS sentence,
       CAST(len(string_split(s.sent, ' ')) AS BIGINT) AS n_words
FROM documents,
     LATERAL (
       SELECT unnest(string_split(text, '. ')) AS sent,
              generate_subscripts(string_split(text, '. '), 1) AS i
     ) s
""",
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 4 ``udtf``) exploding each
    document into indexed sentences — the sixth and last Python execution
    surface (after pandas_udf, applyInPandas, applyInPandasWithState,
    mapInPandas, mapInArrow), value-hash checked like the rest: the split is
    plain ``str.split('. ')``, mirrored by DuckDB ``string_split``, so the
    Python table function is provably lossless.

    Scale: UDTFs stream row batches through the Python worker like any
    Arrow surface — per-row fan-out, no state, no shuffle; the lateral
    expansion happens executor-side so the plan stays a narrow map. (The
    pure-SQL equivalent is posexplode(split(...)) — the operator exists to
    pin the UDTF surface itself, the escape hatch for table-generating
    logic Spark expressions cannot state.)"""
    from pyspark.sql.functions import udtf

    sentence_split = udtf(
        _SentenceSplitUDTF,
        returnType="doc_id bigint, sent_idx bigint, sentence string, n_words bigint",
        useArrow=True,  # ArrowEvalPythonUDTF, not row-pickled BatchEvalPythonUDTF
    )
    spark.udtf.register("sentence_split_udtf", sentence_split)
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT f.doc_id, f.sent_idx, f.sentence, f.n_words "
        "FROM _udtf_docs d, LATERAL sentence_split_udtf(d.doc_id, d.text) f"
    )
