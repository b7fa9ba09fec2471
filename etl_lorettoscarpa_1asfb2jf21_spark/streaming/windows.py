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


def windowed_hll_registers(
    events: DataFrame,
    value_col: str = "user_id",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    slide: str | None = None,
) -> DataFrame:
    """Streaming distinct-count sketch: per tumbling window, the HLL
    register table (operators/sketches) — ONE stateful aggregation
    (groupBy(window, register) -> max(rho)), so it runs under any Spark
    streaming mode without the chained-stateful-aggregation restriction.
    State per open window is bounded by m=512 registers no matter the
    event rate; the watermark GCs closed windows. Registers are the
    artifact you persist — estimates are the read-time fold
    (sketches.hll_estimate_from_registers), and max() re-merges shards,
    restatements, or adjacent windows for free.

    ``slide`` (e.g. "1 hour" with a "2 hours" duration) switches to
    OVERLAPPING sliding windows: each event lands in
    duration/slide windows, state stays <= m registers per OPEN window,
    and the per-window register tables remain the mergeable artifact —
    sliding is just tumbling with duration/slide-fold row duplication
    ahead of the same single stateful max.

    Batch twin: queries_catalog_extras.sk3_windowed_hll (full DuckDB
    oracle; sliding form sk7_sliding_hll); stream/batch parity is
    tested in tests/test_streaming.py.
    """
    from ..operators.sketches import hll_register_exprs
    from .sessions import _ts_as_timestamp

    events = _ts_as_timestamp(events, ts_col)
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    idx, rho = hll_register_exprs(value_col)
    win = (
        F.window(ts_col, window_duration, slide)
        if slide
        else F.window(ts_col, window_duration)
    )
    return (
        src.select(win.alias("w"), idx, rho)
        .groupBy(
            F.col("w"), F.col("_hll_idx")
        )
        .agg(F.max("_hll_rho").alias("_mj"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "_hll_idx",
            "_mj",
        )
    )


def windowed_cms_counters(
    events: DataFrame,
    value_col: str = "user_id",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming frequency sketch: per tumbling window, the Count-Min
    counter table (operators/sketches: d=4 seeded-hash rows x w=256
    buckets) — ONE stateful aggregation (groupBy(window, row, bucket)
    -> count), so per-window state is bounded by d·w = 1024 cells no
    matter the event rate, and the watermark GCs closed windows.
    Counters are the persisted artifact: addition re-merges shards,
    restatements, or adjacent windows into coarser ones (the CMS
    mergeability property — exact, not approximate: the merged table
    IS the table a direct build over the union produces).

    Batch twin: queries_catalog_extras.sk6_windowed_cms_merge (full
    DuckDB oracle); stream/batch parity in tests/test_streaming.py.
    """
    from ..operators.sketches import CMS_DEPTH, cms_bucket_expr
    from .sessions import _ts_as_timestamp

    events = _ts_as_timestamp(events, ts_col)
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("_row"),
                cms_bucket_expr(value_col, j).alias("_bucket"),
            )
            for j in range(CMS_DEPTH)
        ]
    )
    return (
        src.select(F.window(ts_col, window_duration).alias("w"), rows.alias("_rbs"))
        .select("w", F.explode("_rbs").alias("_rb"))
        .groupBy("w", F.col("_rb._row").alias("_row"), F.col("_rb._bucket").alias("_bucket"))
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "_row",
            "_bucket",
            "_cnt",
        )
    )
