"""Streaming SCD Type-2 dimension maintenance: dimension snapshots arrive
as a stream; each micro-batch merges into a persisted history table via
operators.scd.scd2_merge (foreachBatch).

Delivery contract: foreachBatch is at-least-once — scd2_merge is a no-op
for a replayed identical snapshot (attribute hashes equal → nothing closes,
nothing inserts), so the net effect is exactly-once, the same
replay-convergence argument as the gold sink (streaming/ingest.py).

Scale: each merge shuffles once on the natural key; the history table is
re-read per batch (on a lakehouse this is one MERGE against Delta/Iceberg;
plain parquet keeps the engine dependency-free here, with the same
single-writer caveat as every sink in this repo).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.scd import scd2_init, scd2_merge


def start_scd2_sink(
    snapshots: DataFrame,
    dim_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    attr_cols: list[str],
    date_col: str = "snapshot_date",
) -> StreamingQuery:
    """Maintain a Type-2 dimension from a stream of dated snapshots.

    ``snapshots`` rows carry key + attr columns plus ``date_col`` (the
    snapshot's effective date as a 'yyyy-MM-dd' string). A micro-batch may
    span several snapshot dates; they apply in ascending date order so
    history is well-formed regardless of how files batch together.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        dates = [
            r["d"]
            for r in batch_df.select(
                F.col(date_col).cast("string").alias("d")
            ).distinct().orderBy("d").collect()
        ]
        for d in dates:
            snap = batch_df.filter(F.col(date_col).cast("string") == d).select(
                *key_cols, *attr_cols
            )
            if os.path.isdir(dim_path):
                current = spark.read.parquet(dim_path)
                merged = scd2_merge(current, snap, key_cols, attr_cols, d)
            else:
                merged = scd2_init(snap, d)
            # materialize before overwrite: never read and rewrite the same
            # files inside one plan
            merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
                dim_path
            )

    return (
        snapshots.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
