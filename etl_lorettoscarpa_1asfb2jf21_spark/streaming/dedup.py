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
