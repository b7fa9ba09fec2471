"""Range (interval) join: points matched to [lo, hi) intervals.

Two execution shapes, chosen by the caller:

* broadcast (``cell_width=None``) — when the interval side is small
  (banding tables, rate cards): broadcast nested-loop with the range
  predicate. Cost: |points| × |intervals| predicate evaluations, zero
  shuffle of the point side. The right default for dimension-sized
  interval tables.

* grid-bucketed (``cell_width`` set) — when BOTH sides are large: map each
  interval to the grid cells it covers (explode) and each point to its
  cell, equi-join on the cell id, then verify the exact range predicate.
  Turns the non-equi join into a hash join; interval replication factor is
  ceil(span / cell_width), so pick cell_width near the median interval
  span. This is the standard big-big range-join rewrite (same trick query
  engines apply internally).

Both shapes return identical rows (equality-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    cell_width: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows where lo <= point < hi."""
    pred = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    if cell_width is None:
        return points.join(F.broadcast(intervals), pred, how)
    if how != "inner":
        raise ValueError("grid-bucketed interval_join supports inner joins only")

    cw = float(cell_width)
    iv = intervals.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / cw).cast("long"),
                # hi is exclusive: a hi exactly on a cell boundary does not
                # reach into the next cell
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / cw
                ).cast("long"),
            )
        ),
    )
    pt = points.withColumn("_cell", F.floor(F.col(point_col) / cw).cast("long"))
    return pt.join(iv, ["_cell"]).filter(pred).drop("_cell")
