"""Surrogate-key generation (SURVEY.md §2 K1).

Parity target: ``SERIAL PRIMARY KEY`` on all six warehouse tables
(initdb/01_schema.sql:14,22,30,42,54,67). Spark has no sequences; two
strategies, chosen by the caller:

* ``dense`` (default) — row_number() over an ORDER BY of the natural key.
  Deterministic and dense, but a global sort: the window has no PARTITION BY,
  so Spark plans a single-partition sort. Fine for dimension tables (small by
  definition); never use for a 100 TB fact — the reference itself only needs
  fact ids for the unique-hash constraint, which we satisfy with id_hash.
* ``sparse`` — monotonically_increasing_id(): fully parallel, unique,
  non-dense. Use when density doesn't matter.

Appends offset by max(existing id) to keep ids stable across batches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_surrogate_key(
    df: DataFrame,
    id_col: str,
    order_by: Sequence[str],
    strategy: str = "dense",
    offset: int = 0,
) -> DataFrame:
    """Attach an integer surrogate key column named ``id_col``."""
    if strategy == "sparse":
        key = F.monotonically_increasing_id() + F.lit(offset)
    elif strategy == "dense":
        w = Window.orderBy(*[F.col(c) for c in order_by])
        key = F.row_number().over(w) + F.lit(offset)
    else:
        raise ValueError(f"unknown surrogate strategy: {strategy!r}")
    return df.withColumn(id_col, key.cast("int"))


def next_offset(existing: DataFrame | None, id_col: str) -> int:
    """max(existing id), 0 when table empty/absent — append-time id base."""
    if existing is None:
        return 0
    row = existing.agg(F.max(F.col(id_col)).alias("m")).collect()[0]
    return int(row["m"] or 0)
