"""As-of join: match each left row to the latest right row at-or-before it.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do). The naive theta-join
(`l.ts >= r.ts` + window max) explodes quadratically per key. This is the
scalable merge-asof shape:

  union both sides tagged → one shuffle+sort on (key, ts) →
  last_value(right attrs IGNORE NULLS) over the ordered per-key window →
  keep left rows.

Cost at any scale: ONE exchange of |L|+|R| rows and a per-partition sort —
the same price as a sort-merge join, with no row multiplication. Skewed
keys land in AQE's lap like any other sort shuffle.

Semantics: direction='backward' (the common one): for each left row, the
right row with the greatest right_ts <= left_ts (per key). Ties on ts: the
right row wins (sorted first), matching DuckDB ASOF JOIN (>=).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of-backward join. Returns every left row plus, for each of
    ``right_cols`` (default: all non-key, non-ts right columns), the value
    from the latest right row with right_ts <= left_ts; NULL when no right
    row precedes the left row.
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*on, right_ts)]
    carried = [f"{c}{suffix}" for c in right_cols]

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts after right on ts ties (>=)
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(a) for c, a in zip(right_cols, carried)],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l_tagged.schema["_lrow"].dataType
        ).alias("_lrow"),
        *[F.col(c).alias(a) for c, a in zip(right_cols, carried)],
    )

    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged).select(
        "_side",
        "_lrow",
        *[F.last(a, ignorenulls=True).over(w).alias(a) for a in carried],
    )
    out = merged.filter(F.col("_side") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns], *carried
    )
    return out
