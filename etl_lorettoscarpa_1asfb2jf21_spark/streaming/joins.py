"""Stream-stream equi-join with an event-time interval bound.

Both sides carry watermarks and the join condition carries a time-range
predicate, so Spark can bound the join state it buffers per side: a left
row can only ever match right rows within ``within`` of its timestamp, and
once the watermark passes that horizon the row's state is dropped. Without
the range predicate a stream-stream join would have to buffer both streams
forever.

The same plan runs on batch DataFrames (a plain range-condition join), so
batch/stream parity is testable row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing ``key`` with right_ts in [left_ts, left_ts+within].

    Column names must be disjoint apart from ``key`` (rename upstream);
    ``left_ts``/``right_ts`` name the two event-time columns.
    """
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how).drop(r[key])


def enrich_stream_static(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left_outer",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static dimension enrichment: join a stream against a batch
    dimension table, stateless on the stream side.

    Spark re-plans the static side per micro-batch (so a dim refreshed on
    disk is picked up without restarting the query) and keeps NO join state
    — unlike stream-stream joins there is nothing to watermark. With
    ``broadcast_dim`` the dim ships to executors once per micro-batch and
    the stream side never shuffles: the per-batch cost at any scale is
    O(batch rows), which is what makes this the right shape for attaching
    reference data to a 100 TB/day event firehose.

    Same call works on batch inputs (plain broadcast join) for parity tests.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=key, how=how)
