"""Streaming quality-weighted sampling: document batches arrive as a
stream; each micro-batch is scored with a FROZEN trained classifier (the
weights x3_classifier_train produces) and kept with probability
proportional to its score — the streaming twin of the batch
`tp17_quality_weighted_sample` query (whose DuckDB oracle proves the
score/draw/keep algebra).

The keep decision is a PURE FUNCTION of (doc, weights): score is the
same zero-shuffle bucket fold the batch scorer runs, the draw is the
deterministic per-doc md5, so the union of per-batch decisions over ANY
partition of the corpus into micro-batches equals the one-shot batch
result row-for-row (pinned by tests/test_streaming_curation.py). That is
the CCNet/DCLM serving shape: train once offline, score every arriving
shard with the frozen model.

Delivery contract: foreachBatch is at-least-once; exactly-once net
effect uses the batch-scoped commit protocol of streaming/_commit.py —
decisions stage under a batch_id partition, the ledger row appended
LAST is the commit point, and ``read_sample_decisions`` serves only
committed batches, so a crash between the data write and the ledger row
can never surface duplicate doc_id rows.

Scale: per batch = one whole-stage-codegen projection (tokenize → hash →
fold the 4097-int weight literal → md5 draw) over the batch rows only;
no state beyond the ledger, no shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.hashing import md5_long60


def _score_and_draw(
    batch_df: DataFrame, weights: list[int], den: int, gain: int
) -> DataFrame:
    from ..queries_catalog_quality import _x3t_bucket_arr_expr, _x3t_score_col

    draw = md5_long60(
        F.concat(F.lit("samp|"), F.col("doc_id").cast("string"))
    ) % den
    p_num = F.least(
        F.lit(den), F.greatest(F.col("score"), F.lit(0)) * gain
    )
    return (
        batch_df.select("doc_id", _x3t_bucket_arr_expr().alias("_bd"))
        .select("doc_id", _x3t_score_col(weights).alias("score"))
        .withColumn("draw", draw.cast("long"))
        .withColumn("p_num", p_num.cast("long"))
        .withColumn("kept", F.col("draw") < F.col("p_num"))
    )


def apply_sample_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_path: str,
    weights: list[int],
    den: int = 1000,
    gain: int = 25,
) -> None:
    """Score + sample one arriving batch under the frozen ``weights`` and
    append the decisions (doc_id, score, draw, p_num, kept) to
    ``out_path``. Replay-safe via the batch ledger."""
    from ._commit import commit_batch, is_committed, stage_write

    spark = batch_df.sparkSession
    ledger_path = out_path + "_applied"
    if is_committed(spark, ledger_path, batch_id):
        return  # at-least-once replay → exactly-once net effect
    stage_write(_score_and_draw(batch_df, weights, den, gain), out_path, batch_id)
    commit_batch(spark, ledger_path, batch_id)


def read_sample_decisions(spark, out_path: str) -> DataFrame:
    """The decision table (doc_id, score, draw, p_num, kept) —
    COMMITTED batches only."""
    from ._commit import committed_ids, read_committed

    out = read_committed(spark, out_path, committed_ids(spark, out_path + "_applied"))
    if out is None:
        raise FileNotFoundError(f"no committed sample decisions at {out_path}")
    return out


def start_quality_sample_sink(
    docs: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    weights: list[int],
    den: int = 1000,
    gain: int = 25,
) -> StreamingQuery:
    """Maintain the sampled-corpus decision table from a document stream."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_sample_batch(batch_df, batch_id, out_path, weights, den, gain)

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
