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

Scale: each merge shuffles once on the natural key, and the dimension is
hash-bucketed on that key into ``_kb`` partitions so a merge touches ONLY
the partitions containing snapshot keys: unaffected buckets are neither
read (partition pruning on the ``_kb`` filter) nor rewritten (dynamic
partition overwrite replaces just the partitions present in the written
DataFrame). A small daily snapshot against a huge dimension therefore
rewrites O(|snapshot| / |dim| · n_buckets) partitions instead of the whole
table — the plain-parquet equivalent of a Delta/Iceberg keyed MERGE, with
the same single-writer caveat as every sink in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.scd import scd2_init, scd2_merge

DEFAULT_KEY_BUCKETS = 64


def key_bucket_expr(key_cols: list[str], n_buckets: int) -> F.Column:
    """Deterministic hash bucket of the natural key (engine-internal —
    xxhash64 is stable across Spark runs, never compared across engines)."""
    parts = [F.coalesce(F.col(k).cast("string"), F.lit("\x00")) for k in key_cols]
    return F.pmod(F.xxhash64(*parts), F.lit(n_buckets))


def start_scd2_sink(
    snapshots: DataFrame,
    dim_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    attr_cols: list[str],
    date_col: str = "snapshot_date",
    n_buckets: int = DEFAULT_KEY_BUCKETS,
) -> StreamingQuery:
    """Maintain a Type-2 dimension from a stream of dated snapshots.

    ``snapshots`` rows carry key + attr columns plus ``date_col`` (the
    snapshot's effective date as a 'yyyy-MM-dd' string). A micro-batch may
    span several snapshot dates; they apply in ascending date order so
    history is well-formed regardless of how files batch together.

    The persisted dimension carries one extra partition column ``_kb``
    (hash bucket of the natural key, ``n_buckets`` must stay constant for
    the table's lifetime); readers that want the logical schema drop it.
    """

    def read_dim(spark) -> DataFrame | None:
        # explicit Hadoop-FS absence probe (scheme-aware: hdfs://, s3a://,
        # …), not a blanket except: a TRANSIENT read failure must fail the
        # micro-batch (retry) — treating it as bootstrap would
        # re-initialize (wipe) the history
        from ._commit import _hadoop_exists

        if not _hadoop_exists(spark, dim_path):
            return None
        return spark.read.parquet(dim_path)

    def write_partitioned(spark, merged: DataFrame) -> None:
        # materialize before overwrite (never read and rewrite the same
        # files inside one plan), then dynamic-overwrite: only partitions
        # present in ``merged`` are replaced, the rest keep their files
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.localCheckpoint(eager=True).write.mode("overwrite").partitionBy(
                "_kb"
            ).parquet(dim_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

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
                bucket = key_bucket_expr(key_cols, n_buckets)
                current = read_dim(spark)
                if current is None:
                    merged = scd2_init(snap, d).withColumn("_kb", bucket)
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
                    # Column-pruned scan: only valid_from is read.
                    newest = current.agg(
                        F.max(F.col("valid_from").cast("string")).alias("m")
                    ).collect()[0]["m"]
                    if newest is not None and d < newest:
                        continue
                    # merge ONLY the buckets the snapshot touches: the
                    # isin filter prunes every other partition at scan time,
                    # and the dynamic overwrite below leaves them on disk
                    affected = sorted(
                        r["b"]
                        for r in snap.select(bucket.alias("b")).distinct().collect()
                    )
                    cur_aff = current.filter(F.col("_kb").isin(affected)).drop("_kb")
                    merged = scd2_merge(
                        cur_aff, snap, key_cols, attr_cols, d
                    ).withColumn("_kb", bucket)
                write_partitioned(spark, merged)
        finally:
            batch_df.unpersist()

    return (
        snapshots.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
