"""Local mirror of the driver's correctness gate: run each registered PySpark
query and its DuckDB oracle SQL on the same parquet fixtures and compare
row count, column names, and an order-insensitive *bit-exact* value hash.

Driver-faithful canonicalization (round-3 lesson): the driver materializes
both results as pandas frames, sorts columns by name, row-sorts via
``sort_values``, then value-hashes with a dtype-sensitive per-row hash
(``pd.util.hash_pandas_object``). That makes two failure modes visible that a
tolerant row-compare masks:

- dtype drift: DuckDB HUGEINT lands in pandas as float64, so ``1.0`` vs
  Spark's int64 ``1`` hash-mismatches even though ``==`` holds (the r3
  ``sessionize_events`` red row);
- unhashable cells: array-typed output columns raise
  ``unhashable type: 'list'`` inside the hash (the r3
  ``agg_collect_set_event_types`` red row).

This harness reproduces both on the pre-fix code, so below-cap queries meet
the same bar as driver-checked ones. There is deliberately NO float-tolerance
path: every oracled query must be engineered for cross-engine bit-exactness
(ordered folds, decimal sums, integer-exact bit extraction — see
cross-engine-parity notes in the query docstrings).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Column-sort, normalize timestamp unit/tz (both engines emit equal
    instants at different physical units — us vs ns — which is representation,
    not value), then row-sort. Everything else keeps its dtype so int/float
    drift stays visible."""
    import datetime as _dt

    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if isinstance(pdf[c].dtype, pd.DatetimeTZDtype):
            pdf[c] = pdf[c].dt.tz_convert("UTC").dt.tz_localize(None)
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[ns]")
        elif pdf[c].dtype == object:
            # Spark DATE arrives as object-of-datetime.date while DuckDB DATE
            # arrives as datetime64[ns]; the driver treats these as equal
            # (scalar_extended_battery was green in r3 with two DATE columns),
            # so both sides normalize to datetime64[ns].
            nonnull = pdf[c].dropna()
            if len(nonnull) and all(
                type(v) is _dt.date for v in nonnull
            ):
                pdf[c] = pd.to_datetime(pdf[c])
    if len(pdf.columns):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    return pdf


def _row_hashes(pdf: pd.DataFrame) -> np.ndarray:
    return pd.util.hash_pandas_object(pdf, index=False).to_numpy()


def compare(spark_df, con, sql: str, name: str = "?") -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    return compare_counted(spark_df, con, sql, name)[0]


def compare_counted(spark_df, con, sql: str, name: str = "?") -> tuple[list[str], int]:
    """compare() plus the Spark-side row count, so callers can flag a
    vacuous ok-with-0-rows match (VERDICT r10 #1: a hash match over nothing
    proves nothing — every gate must see emptiness, not just agreement)."""
    problems: list[str]
    problems, n_rows = _compare_impl(spark_df, con, sql, name)
    return problems, n_rows


def _compare_impl(spark_df, con, sql: str, name: str) -> tuple[list[str], int]:
    from kinesis_demo_spark.io import release_persisted

    problems: list[str] = []
    try:
        spark_pdf = spark_df.toPandas()
    finally:
        release_persisted()  # drop this query's tracked caches (see io.py)
    oracle_pdf = con.execute(sql).df()

    n_rows = len(spark_pdf)
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"{name}: columns differ spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return problems, n_rows
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(
            f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
        )

    try:
        s = _canon_pdf(spark_pdf)
        o = _canon_pdf(oracle_pdf)
        hs = _row_hashes(s)
        ho = _row_hashes(o)
    except TypeError as e:  # the driver's `unhashable type: 'list'` mode
        problems.append(f"{name}: harness error: {e}")
        return problems, n_rows

    if len(hs) == len(ho):
        bad = np.nonzero(hs != ho)[0]
        for i in bad[:3]:
            problems.append(
                f"{name}: row {i} mismatch\n  spark ={s.iloc[i].to_dict()} "
                f"dtypes={dict(s.dtypes.astype(str))}\n  oracle={o.iloc[i].to_dict()} "
                f"dtypes={dict(o.dtypes.astype(str))}"
            )
        if len(bad) > 3:
            problems.append(f"{name}: ... {len(bad)} mismatched rows total")
    return problems, n_rows
