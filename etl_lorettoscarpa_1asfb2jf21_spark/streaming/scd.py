"""Streaming SCD Type-2 dimension maintenance: dimension snapshots arrive
as a stream; each micro-batch merges into a persisted history table via
operators.scd.scd2_merge (foreachBatch).

Delivery contract: foreachBatch is at-least-once — replays converge to
exactly-once net effect via two mechanisms: (a) a replayed identical
snapshot merges as a no-op (attribute hashes equal → nothing closes,
nothing inserts), and (b) a monotonicity guard drops any snapshot strictly
older than the dimension's newest version, so replaying a multi-date batch
cannot re-apply an early date on top of later history. The same guard
defines the out-of-order policy: snapshot files arriving after a newer
date has been applied are skipped.

Scale: each merge shuffles once on the natural key; the history table is
re-read per batch (on a lakehouse this is one MERGE against Delta/Iceberg;
plain parquet keeps the engine dependency-free here, with the same
single-writer caveat as every sink in this repo).
"""

from __future__ import annotations

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

    def read_dim(spark) -> DataFrame | None:
        # probe via Spark, not os.path: dim_path may be hdfs://, s3a://, …
        # where a driver-local isdir() is always False and would silently
        # re-initialize (wipe) the history every batch
        try:
            return spark.read.parquet(dim_path)
        except Exception:  # noqa: BLE001 — any unreadable/absent table → bootstrap
            return None

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df.persist()  # read once: isEmpty + dates + one filter per date
        try:
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
                current = read_dim(spark)
                if current is None:
                    merged = scd2_init(snap, d)
                else:
                    # Monotonicity guard — the replay-safety core: snapshots
                    # strictly older than the dimension's newest version are
                    # dropped. An at-least-once replay of a multi-date batch
                    # would otherwise re-apply d1 on top of d2's history
                    # (closing rows with valid_to < valid_from); with the
                    # guard, replayed older dates skip and the newest date
                    # re-merges as an identical-snapshot no-op. Late-arriving
                    # out-of-order snapshot files are dropped by the same
                    # rule (documented: snapshots apply in date order).
                    newest = current.agg(
                        F.max(F.col("valid_from").cast("string")).alias("m")
                    ).collect()[0]["m"]
                    if newest is not None and d < newest:
                        continue
                    merged = scd2_merge(current, snap, key_cols, attr_cols, d)
                # materialize before overwrite: never read and rewrite the
                # same files inside one plan
                merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
                    dim_path
                )
        finally:
            batch_df.unpersist()

    return (
        snapshots.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
