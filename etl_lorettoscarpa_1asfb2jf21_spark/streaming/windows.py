"""Watermarked windowed aggregation over event streams.

Batch twin: queries_catalog_ext.st1_tumbling_window — the same groupBy
(window, event_type) plan; here under readStream with a watermark so state
for closed windows is dropped (bounded memory at 100 TB/day event rates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

DEC = DecimalType(18, 2)


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` given) window counts + sums.

    Works on both batch and streaming DataFrames; on a stream the watermark
    bounds late data and lets Spark GC window state.
    """
    from .sessions import _ts_as_timestamp

    events = _ts_as_timestamp(events, ts_col)
    win = (
        F.window(ts_col, window_duration, slide)
        if slide
        else F.window(ts_col, window_duration)
    )
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
