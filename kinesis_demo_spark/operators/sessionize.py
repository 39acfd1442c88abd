"""Gap-based sessionization — the canonical custom stateful operator
(SURVEY.md §2.4 territory: the reference's cursor/window logic generalized to
sessions). Two implementations sharing one spec:

- ``batch_sessionize``: lag + running-sum window functions — one shuffle on
  user_id, in-partition sort, linear scan. The exact distributed shape for
  100 TB backfills.
- ``streaming_sessionize``: ``applyInPandasWithState`` over a keyed stream —
  per-user state carries the open session across micro-batches; closed
  sessions emit as soon as the gap that closes them is seen. This is the
  operator Spark's built-ins can't express (session windows with custom
  aggregates and emission policy), hence the Arrow-batched stateful UDF.

Money-exact invariant: per-session value sums are accumulated in integer
cents (the fixture's ``value`` has 2 decimals), so batch (DECIMAL sums),
streaming (int64 cents), and the DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

SESSION_GAP_MS = 24 * 3600 * 1000  # events are sparse (median per-user gap ~7 h)

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
        # Nullable: a session whose values were all NULL sums to NULL (SQL
        # sum() semantics); declaring False would let Catalyst fold a
        # downstream `sum_value IS NULL` to false and lets strict Arrow
        # conversions reject the row.
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)

# Open-session state: epoch-us bounds + counts + cents accumulator + a
# dropped-row counter (rows predating the open session, non-strict mode) +
# the count of NON-NULL values folded in (nv) — sum_value must come back
# NULL, exactly like SQL sum(), when a session saw only NULL values, and
# NULL values arrive in the kernel as NaN (astype on NaN is a hard crash,
# found by the r8 adversarial-fixture sweep).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), False),
        T.StructField("end_us", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("cents", T.LongType(), False),
        T.StructField("dropped", T.LongType(), False),
        T.StructField("nv", T.LongType(), False),
    ]
)


def batch_sessionize(events: DataFrame, gap_ms: int = SESSION_GAP_MS) -> DataFrame:
    """Sessions = maximal runs of per-user events with inter-event gap <=
    gap_ms. Returns one row per session with count and exact decimal sum."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
    new_session = F.when(gap.isNull() | (gap > gap_ms), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_session = events.select(
        "user_id", "ts", "event_id", "value", F.sum(new_session).over(run).alias("session_id")
    )
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


def _make_sessionize_group(strict: bool):
    """Build the stateful kernel with the chosen late-data policy baked in
    (applyInPandasWithState takes a fixed-arity function, so the flag is a
    closure, not a column)."""

    def _sessionize_group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        """Stateful kernel: fold this batch's events (ts-sorted) into the open
        session; emit every session closed by a gap, keep the trailing open
        one in state for the next micro-batch."""
        (user_id,) = key
        if state.exists:
            start_us, end_us, n, cents, dropped, nv = state.get
        else:
            start_us = end_us = -1
            n = cents = dropped = nv = 0

        closed: list[tuple] = []
        # A group's rows can arrive as MULTIPLE Arrow chunks per micro-batch,
        # in no guaranteed order — gather the whole batch, sort once, fold.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
            nonnull = pdf["value"].notna()
            ev_cents = (pdf["value"].fillna(0.0) * 100).round().astype("int64")
            for t_us, c, has_v in zip(ts_us, ev_cents, nonnull):
                if n == 0:
                    start_us, end_us, n, cents = t_us, t_us, 1, int(c)
                    nv = int(has_v)
                elif t_us < start_us:
                    # Cross-micro-batch contract: the source must deliver
                    # each key's events watermark-ordered ACROSS batches
                    # (in-batch disorder is handled by the sort above). An
                    # event older than the open session's start would have
                    # belonged to an earlier — possibly already-emitted —
                    # session; silently folding it in diverges from
                    # batch_sessionize. Default policy matches watermark
                    # late-data semantics: DROP the row and count it in
                    # state, so a data-quality glitch can't take down the
                    # pipeline; strict=True turns the drop into a loud
                    # failure for sources that guarantee ordering.
                    if strict:
                        raise ValueError(
                            f"streaming_sessionize: out-of-order event for "
                            f"user {user_id} at {t_us}us predates the open "
                            f"session start {start_us}us — the input stream "
                            f"must be watermark-ordered per key across "
                            f"micro-batches"
                        )
                    dropped += 1
                    continue
                # gap compared in whole milliseconds exactly like the batch/
                # oracle side (unix_millis/epoch_ms floor each timestamp to
                # ms BEFORE subtracting — floor(a)-floor(b) != floor(a-b)
                # for sub-ms components)
                elif (t_us // 1000) - (end_us // 1000) > SESSION_GAP_MS:
                    closed.append(
                        (user_id, start_us, end_us, n,
                         cents / 100.0 if nv else None)
                    )
                    start_us, end_us, n, cents = t_us, t_us, 1, int(c)
                    nv = int(has_v)
                else:
                    # max() guards the in-session late arrival (t_us < end_us
                    # but >= start_us): the session's end never moves back.
                    end_us, n, cents = max(end_us, t_us), n + 1, cents + int(c)
                    nv += int(has_v)

        state.update(
            (int(start_us), int(end_us), int(n), int(cents), int(dropped), int(nv))
        )
        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    return _sessionize_group


def streaming_sessionize(events: DataFrame, strict: bool = False) -> DataFrame:
    """Keyed stream -> per-user open-session state -> closed-session rows.
    State is O(1) per user (six longs) — bounded regardless of stream
    length; sessions emit exactly once, when the closing gap arrives.

    ``strict=False`` (default): a cross-batch out-of-order event older than
    the open session's start is dropped and counted in state — watermark
    late-data semantics, a glitch row can't fail the query. ``strict=True``:
    the same row raises, for sources contractually watermark-ordered per key.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _make_sessionize_group(strict),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
