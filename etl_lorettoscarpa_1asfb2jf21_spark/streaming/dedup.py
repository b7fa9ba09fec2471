"""Watermarked streaming deduplication (X1 semantics on unbounded input).

The batch engine dedups with groupBy/anti-join (operators.dedup,
operators.upsert); on a stream that state would grow forever. Spark's
``dropDuplicatesWithinWatermark`` keeps per-key state only for the
watermark horizon: duplicates that arrive within the horizon — the
delivery-retry / at-least-once-source case — are dropped regardless of
micro-batch boundaries, and state for keys older than the watermark is
GC'd, so memory stays bounded at any input rate.

On batch DataFrames the same function degrades to plain dropDuplicates
(``dropDuplicatesWithinWatermark`` is streaming-only), so one function
serves both tiers of a lambda-free pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """One row per ``keys`` among rows within the watermark horizon.

    Emits the first-seen row per key immediately (append mode safe);
    subsequent duplicates inside the horizon are dropped.
    """
    if not events.isStreaming:
        # batch twin: the horizon is the whole (bounded) input
        return events.dropDuplicates(list(keys))
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def emit_anchored_dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    order_cols: list[str],
    horizon_us: int,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming EMIT-ANCHORED dedup — the stateful twin of
    ``operators.dedup.emit_anchored_dedup`` (st5's batch contract): keep
    an event iff its timestamp is more than ``horizon_us`` after the
    last EMITTED event of the same key, with the anchor carried across
    micro-batches in keyed state (``applyInPandasWithState``).

    Parity with the batch operator is exact when events arrive in
    event-time order per key (micro-batch boundaries don't matter: the
    anchor survives in state) — proven against the same data in
    tests/test_streaming.py. Out-of-order arrivals WITHIN a micro-batch
    are handled (rows are sorted by ``order_cols`` before the walk);
    across micro-batches they follow the watermark contract, like every
    stateful operator here.

    State is one bigint (the anchor) per key, evicted via event-time
    timeout once the watermark passes anchor + horizon. Eviction is
    semantics-preserving for non-late data: any event after that point
    has ``ts - anchor > horizon_us`` and would be kept with or without
    the state entry.

    Input columns: ``key_cols`` + a TIMESTAMP ``ts_col`` + ``order_cols``
    (tie-break; usually ts + a unique id). Output = the kept rows, input
    schema.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = events.schema
    cols = [f.name for f in out_schema.fields]

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed anchor + horizon: any future event is a
            # keep regardless — the entry is dead weight, drop it
            state.remove()
            yield pd.DataFrame(columns=cols)
            return
        anchor = state.get[0] if state.exists else None
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows["_us"] = (
            rows[ts_col].astype("datetime64[ns]").astype("int64") // 1000
        )
        order = ["_us" if c == ts_col else c for c in order_cols]
        rows = rows.sort_values(order, kind="mergesort").reset_index(drop=True)
        keep = []
        for i, us in enumerate(rows["_us"]):
            us = int(us)
            if anchor is None or us - anchor > horizon_us:
                anchor = us
                keep.append(i)
        state.update((anchor,))
        # timeout must sit beyond the current watermark (old replayed
        # batches can have anchor + horizon already in the past)
        state.setTimeoutTimestamp(
            max((anchor + horizon_us) // 1000, state.getCurrentWatermarkMs() + 1)
        )
        yield rows.loc[keep, cols]

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*key_cols)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="anchor_us bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
