"""Streaming incremental view maintenance: CDC change rows arrive as a
stream; each micro-batch folds (SUM, COUNT) deltas into a persisted
materialized rollup via foreachBatch — the streaming twin of the batch
`ivm1_incremental_rollup` query (whose recompute oracle proves the delta
algebra).

Delivery contract: foreachBatch is at-least-once, and delta application is
NOT naturally idempotent (re-adding a delta double-counts — unlike the
SCD2 sink's no-op re-merge). Exactly-once net effect therefore comes from
a BATCH LEDGER: every applied micro-batch appends its batch_id to a
sibling `<view>_applied` table, and a replayed batch_id is skipped before
any arithmetic. This is the standard idempotent-foreachBatch pattern for
non-idempotent merges (the plain-parquet equivalent of Delta's
txnAppId/txnVersion commit metadata).

Scale: the delta aggregation touches only the micro-batch; the merge
reads ONLY the key-hash buckets (`_kb` partitions, same layout as
streaming/scd.py) the batch touches, and dynamic partition overwrite
rewrites only those. Fully-deleted groups persist as n_rows=0 TOMBSTONES
(dynamic overwrite cannot emit an empty partition, so dropping the row
would strand the old file); `read_rollup` filters them and a bucket's
next live rewrite physically drops them. Single-writer-per-table, like
every sink in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .scd import key_bucket_expr

DEFAULT_KEY_BUCKETS = 64


def read_rollup(spark, view_path: str) -> DataFrame:
    """The logical view: live groups only (tombstones + layout col dropped)."""
    return spark.read.parquet(view_path).filter(F.col("n_rows") > 0).drop("_kb")


def apply_cdc_batch(
    batch_df: DataFrame,
    batch_id: int,
    view_path: str,
    key_cols: list[str],
    qty_col: str = "qty",
    op_col: str = "op",
    n_buckets: int = DEFAULT_KEY_BUCKETS,
) -> None:
    """Fold one CDC batch (op ∈ {'I','D'}; updates arrive as D+I pairs,
    standard CDC) into the persisted rollup. Safe to call again with the
    same ``batch_id`` — the ledger makes the replay a no-op."""
    from ._commit import _hadoop_exists, is_committed

    spark = batch_df.sparkSession
    ledger_path = view_path + "_applied"

    if is_committed(spark, ledger_path, batch_id):
        return  # at-least-once replay → exactly-once net effect

    sign = F.when(F.col(op_col) == "D", F.lit(-1)).otherwise(F.lit(1))
    delta = (
        batch_df.select(
            *key_cols,
            (sign * F.col(qty_col)).alias("_dq"),
            sign.alias("_dn"),
        )
        .groupBy(*key_cols)
        .agg(F.sum("_dq").alias("_dq"), F.sum("_dn").alias("_dn"))
    )
    bucket = key_bucket_expr(key_cols, n_buckets)

    # explicit absence probe, not a blanket except: a TRANSIENT read
    # failure here must fail the micro-batch (retry), because treating it
    # as bootstrap would dynamic-overwrite merged buckets with delta-only
    # values — silent state loss (the advisor's splits.py finding, same
    # class)
    cur = spark.read.parquet(view_path) if _hadoop_exists(spark, view_path) else None

    if cur is None:
        merged = delta.select(
            *key_cols,
            F.col("_dq").alias("sum_qty"),
            F.col("_dn").alias("n_rows"),
        ).withColumn("_kb", bucket)
    else:
        # merge reads ONLY the buckets the delta touches — the rest of the
        # table is neither scanned (partition pruning) nor rewritten
        # (dynamic overwrite replaces just the partitions written below)
        touched = [
            r["_kb"]
            for r in delta.withColumn("_kb", bucket).select("_kb").distinct().collect()
        ]
        cur_touched = cur.filter(F.col("_kb").isin(touched)).drop("_kb")
        merged = (
            cur_touched.join(delta, key_cols, "full_outer")
            .select(
                *key_cols,
                (
                    F.coalesce(F.col("sum_qty"), F.lit(0.0))
                    + F.coalesce(F.col("_dq"), F.lit(0.0))
                ).alias("sum_qty"),
                (
                    F.coalesce(F.col("n_rows"), F.lit(0))
                    + F.coalesce(F.col("_dn"), F.lit(0))
                ).alias("n_rows"),
            )
            .withColumn("_kb", bucket)
        )

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.localCheckpoint(eager=True).write.mode("overwrite").partitionBy(
            "_kb"
        ).parquet(view_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    # commit the ledger entry LAST: a crash between view write and ledger
    # append replays the batch, and the replay re-merges against the
    # already-updated buckets... which would double-count. Order matters
    # the other way: ledger FIRST would instead DROP the batch on a crash
    # before the view write. Neither plain-parquet order is atomic; the
    # ledger-last choice surfaces duplicates (detectable: n_rows drifts
    # from source counts) rather than silent data loss, and a table
    # format with transactional commit (Delta txnAppId) removes the gap
    # entirely. Documented trade-off, single-writer assumption as ever.
    spark.createDataFrame([(int(batch_id),)], "batch_id long").write.mode(
        "append"
    ).parquet(ledger_path)


def start_incremental_rollup_sink(
    changes: DataFrame,
    view_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    qty_col: str = "qty",
    op_col: str = "op",
    n_buckets: int = DEFAULT_KEY_BUCKETS,
) -> StreamingQuery:
    """Maintain a materialized (SUM, COUNT) rollup from a CDC stream."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_cdc_batch(
            batch_df, batch_id, view_path, key_cols, qty_col, op_col, n_buckets
        )

    return (
        changes.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
