"""Streaming cluster-stable train/val split assignment: document batches
arrive as a stream; every batch is near-dup-probed against the already
assigned corpus, and a new document that joins an EXISTING near-dup
cluster INHERITS that cluster's split — the incremental twin of the
batch `tp18_leakage_safe_split` query. This is the property a training
pipeline actually needs online: once a document is in train, a near
duplicate arriving next week must never land in val.

Mechanics per micro-batch (foreachBatch; the batch-scoped commit
protocol of streaming/_commit.py — outputs stage under batch_id
partitions, the ledger row appended LAST is the commit point, and every
state read is ledger-gated, so an at-least-once replay can neither
self-match its own partial writes nor silently re-bootstrap on a
transient read error):

1. WITHIN-BATCH clustering: banded-minhash pairs + the star
   connected-components engine (the same ladder the batch query runs).
2. CROSS probe: the batch's band buckets equi-join the PERSISTED bucket
   index (operators.dedup.incremental_neardup's asymmetric shape — the
   index is an appended parquet artifact, never re-derived from text),
   exact-Jaccard-verified against the persisted shingle sets.
3. INHERIT: a batch component matching any assigned document adopts the
   MINIMUM matched cluster_id (deterministic under any batch order);
   unmatched components mint their own cluster_id = min member doc_id.
   The split is the same draw the batch query uses —
   md5('split|'||cluster_id) % 10 < 8 — a pure function of cluster_id,
   so inheriting the cluster IS inheriting the split; no stored split
   can ever disagree with its cluster's draw.

Contract notes: a batch document bridging TWO existing clusters adopts
the minimum — the clusters are NOT retroactively merged, because merging
would flip the split of already-served documents (the stability the
operator exists to provide). The bridge is visible to offline audit: a
full-corpus tp18 recompute reveals any drift. Single-writer per state
directory, as every sink in this repo.

Scale: per round = one scan of the batch (signatures + shingles), one
(band, bucket)-keyed probe of the persisted index (batch side
broadcasts), one CC over the BATCH's edges only, three appends. Nothing
ever re-pairs the corpus against itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.hashing import md5_long60

TRAIN_MOD = 10
TRAIN_KEEP = 8  # md5(cluster) % 10 < 8 → train (the tp18 draw)


def _split_expr(cluster_col: str):
    draw = md5_long60(
        F.concat(F.lit("split|"), F.col(cluster_col).cast("string"))
    ) % TRAIN_MOD
    return F.when(draw < TRAIN_KEEP, F.lit("train")).otherwise(F.lit("val"))


def read_split_assignments(spark: SparkSession, base_path: str) -> DataFrame:
    """(doc_id, cluster_id, split) for every document assigned so far —
    COMMITTED batches only (the ledger is the commit point; an in-flight
    or crashed batch's staged rows are partition-pruned away)."""
    from ._commit import committed_ids, read_committed

    out = read_committed(
        spark, f"{base_path}/assign", committed_ids(spark, f"{base_path}/_applied")
    )
    if out is None:
        raise FileNotFoundError(f"no committed split assignments at {base_path}")
    return out


def apply_split_batch(
    batch_df: DataFrame,
    batch_id: int,
    base_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 6,
    jaccard_threshold: float = 0.7,
) -> None:
    """Assign one arriving batch to leakage-safe splits (see module doc).
    Safe to call again with the same ``batch_id`` — ledger no-op."""
    from ..operators.dedup import (
        _hashed_ngrams_from_norm,
        _lsh_band_buckets,
        _spread_normalized,
        minhash_lsh_pairs,
        minhash_signature,
    )
    from ..operators.graph import duplicate_clusters

    from ._commit import commit_batch, committed_ids, read_committed, stage_write

    spark = batch_df.sparkSession
    ledger_path = f"{base_path}/_applied"
    committed = committed_ids(spark, ledger_path)
    if int(batch_id) in set(committed):
        return  # at-least-once replay → exactly-once net effect

    batch_df = batch_df.select(id_col, text_col).localCheckpoint(eager=True)
    rows_per_band = num_hashes // bands

    # 1. within-batch components (the batch ladder on the batch only)
    pairs = minhash_lsh_pairs(
        batch_df,
        text_col,
        id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_size=shingle_size,
        jaccard_threshold=jaccard_threshold,
    ).select("id_a", "id_b")
    comp = duplicate_clusters(batch_df, pairs, id_col).select(
        F.col(id_col), F.col("cluster_id").alias("_batch_root")
    )

    # 2. asymmetric probe of the persisted index
    sig = minhash_signature(
        batch_df, text_col, id_col, num_hashes, shingle_size, portable=False
    )
    new_b = _lsh_band_buckets(sig, id_col, bands, rows_per_band, portable=False)
    new_sh = _spread_normalized(batch_df, text_col, keep=[id_col]).select(
        F.col(id_col).alias("_sid"),
        _hashed_ngrams_from_norm(shingle_size, portable=False).alias("_shs"),
    )
    # COMMITTED state only: an uncommitted replay of this very batch (a
    # crash between the stage writes and the ledger row) must not
    # self-match Jaccard-1.0 and re-assign its own docs a second
    # conflicting cluster; and a TRANSIENT state-read failure raises out
    # of the micro-batch (retry) instead of silently re-bootstrapping —
    # both via the ledger-gated reader (_commit module doc).
    idx_b = read_committed(spark, f"{base_path}/buckets", committed)
    idx_sh = read_committed(spark, f"{base_path}/shingles", committed)
    assigned = read_committed(spark, f"{base_path}/assign", committed)
    if idx_b is not None:
        cand = (
            idx_b.join(
                F.broadcast(
                    new_b.select(F.col("_id").alias("new_id"), "band", "bucket")
                ),
                ["band", "bucket"],
            )
            .select(F.col("_id").alias("index_id"), "new_id")
            .distinct()
        )
        matches = (
            cand.join(
                F.broadcast(
                    new_sh.select(
                        F.col("_sid").alias("new_id"), F.col("_shs").alias("_shs_n")
                    )
                ),
                "new_id",
            )
            .join(
                idx_sh.select(
                    F.col("_sid").alias("index_id"), F.col("_shs").alias("_shs_i")
                ),
                "index_id",
            )
            .filter(
                F.size(F.array_intersect("_shs_n", "_shs_i")).cast("double")
                / F.size(F.array_union("_shs_n", "_shs_i")).cast("double")
                >= jaccard_threshold
            )
            .select("new_id", "index_id")
        )
        # 3. component-level inheritance: min matched EXISTING cluster
        inherited = (
            matches.join(
                assigned.select(
                    F.col("doc_id").alias("index_id"),
                    F.col("cluster_id").alias("_idx_cluster"),
                ),
                "index_id",
            )
            .join(
                F.broadcast(comp.select(F.col(id_col).alias("new_id"), "_batch_root")),
                "new_id",
            )
            .groupBy("_batch_root")
            .agg(F.min("_idx_cluster").alias("_inherit"))
        )
        final = comp.join(F.broadcast(inherited), "_batch_root", "left").select(
            F.col(id_col),
            F.coalesce("_inherit", "_batch_root").alias("cluster_id"),
        )
    else:
        final = comp.select(F.col(id_col), F.col("_batch_root").alias("cluster_id"))

    out = final.withColumn("split", _split_expr("cluster_id")).localCheckpoint(
        eager=True
    )
    # stage all three outputs under this batch's partition, THEN commit:
    # the ledger row is what makes them visible (crash anywhere before it
    # = clean replay; overwrite staging wipes partial leftovers)
    stage_write(out, f"{base_path}/assign", batch_id)
    stage_write(new_b, f"{base_path}/buckets", batch_id)
    stage_write(new_sh, f"{base_path}/shingles", batch_id)
    commit_batch(spark, ledger_path, batch_id)


def start_cluster_split_sink(
    docs: DataFrame,
    base_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> StreamingQuery:
    """Maintain the leakage-safe split assignment from a document stream."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_split_batch(
            batch_df, batch_id, base_path, text_col=text_col, id_col=id_col, **kwargs
        )

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
