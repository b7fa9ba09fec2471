"""Sessionization: gap-based event sessions, three execution shapes.

1. ``sessionize_batch`` — gaps-and-islands over window functions. Exactly
   reproducible in ANSI SQL, so it carries the DuckDB oracle
   (queries_catalog_ext.st2_sessionize).
2. ``sessionize_session_window`` — Spark's native ``session_window``
   aggregation; identical grouping, and the same plan runs under
   ``readStream`` + watermark (state GC'd by Spark).
3. ``sessionize_stateful_stream`` — applyInPandasWithState: the custom
   stateful escape hatch for session logic the declarative form can't
   express (per-session custom accumulators, early emission policies).
   Sessions close either when a later event for the user exceeds the gap or
   when the event-time watermark passes session_end + gap (timeout path).

Scale notes: all three shuffle once on user_id. The stateful variant's
memory is bounded by open sessions (one small tuple per user), and the
watermark timeout guarantees state is dropped for idle users.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, StructType

DEC = DecimalType(18, 2)
DEFAULT_GAP = "30 minutes"


def gap_to_us(gap: str) -> int:
    qty, unit = gap.split()
    per = {"seconds": 1, "second": 1, "minutes": 60, "minute": 60, "hours": 3600, "hour": 3600}
    return int(qty) * per[unit] * 1_000_000


def _ts_as_timestamp(df: DataFrame, ts_col: str) -> DataFrame:
    """NTZ-proof the event-time column (no-op when already TIMESTAMP).

    Callers may hand a DataFrame read straight from timezone-less parquet
    (TIMESTAMP_NTZ under Spark 4's default inference), which unix_micros,
    watermarks, and session_window reject. Session TZ is UTC, so the cast
    is a relabel, not a value change. See sources/tables.normalize_ntz.
    """
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def sessionize_batch(
    events: DataFrame,
    gap: str = DEFAULT_GAP,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(user_id, session_start_us, n_events, sum_value) per gap-session.

    Gap compare is integer microseconds (``unix_micros``) so the DuckDB twin
    (``epoch_us``) is bit-identical; a session breaks when the inter-event
    gap is >= the threshold.
    """
    events = _ts_as_timestamp(events, ts_col)
    gap_us = gap_to_us(gap)
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    new_s = F.when(prev.isNull() | ((us - prev) >= gap_us), 1).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col, order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("_new", new_s)
        .withColumn("_sid", F.sum("_new").over(run))
        .groupBy(user_col, "_sid")
        .agg(
            F.min(us).alias("session_start_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(user_col, "session_start_us", "n_events", "sum_value")
    )


def sessionize_session_window(
    events: DataFrame,
    gap: str = DEFAULT_GAP,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Native session_window grouping — the declarative/streaming-ready twin
    of sessionize_batch (same sessions; Spark manages merge + state GC)."""
    events = _ts_as_timestamp(events, ts_col)
    src = (
        events.withWatermark(ts_col, watermark)
        if watermark and events.isStreaming
        else events
    )
    return (
        src.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            user_col,
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint, sum_value double"
)
SESSION_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint, total double"


def sessionize_stateful_stream(
    events: DataFrame,
    gap: str = DEFAULT_GAP,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful sessionizer over applyInPandasWithState.

    Input must be a STREAMING DataFrame with columns
    (user_id, ts timestamp, value double-castable). Emits one row per CLOSED
    session; open sessions close via event-time timeout once the watermark
    passes last_event + gap.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_to_us(gap)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            closed.append((user_id, start_us, last_us, n, total))
            state.remove()
        else:
            cur = state.get if state.exists else None
            rows = pd.concat(list(pdfs), ignore_index=True)
            # normalize to ns first: Arrow may hand pandas datetime64[us]
            rows["_us"] = rows["ts"].astype("datetime64[ns]").astype("int64") // 1000
            rows = rows.sort_values(["_us", "event_id"] if "event_id" in rows else "_us")
            for us, val in zip(rows["_us"], rows["value"].astype(float)):
                if cur is None:
                    cur = (int(us), int(us), 1, val)
                elif us - cur[1] >= gap_us:
                    closed.append((user_id, *cur))
                    cur = (int(us), int(us), 1, val)
                else:
                    cur = (cur[0], int(us), cur[2] + 1, cur[3] + val)
            if cur is not None:
                state.update(cur)
                # close via timeout when the watermark passes last + gap
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_us", "session_end_us", "n_events", "sum_value"],
        )

    return (
        _ts_as_timestamp(events, "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
