"""Batch-scoped commit protocol for foreachBatch sinks.

foreachBatch is AT-LEAST-ONCE: a micro-batch that crashes after some of
its appends replays in full, so an append-then-ledger sink has two
failure modes (advisor round-11):

* partial-state replay — the replay probes state that already contains
  the batch's own rows (self-matches, duplicate/conflicting outputs);
* silent re-bootstrap — a blanket ``except`` around the state read
  treats a TRANSIENT read failure as "first batch", skipping the
  cross-batch probe entirely.

The protocol here closes both. Each micro-batch STAGES every output
table under ``<table>/batch_id=<id>`` with mode("overwrite") — a replay
of an uncommitted batch first wipes its own partial leftovers — and the
ledger row for the batch_id, appended strictly LAST, is the commit
point. Readers take the committed id list from the ledger and filter
``batch_id`` to it (a partition-column filter, so Spark PRUNES
uncommitted directories at planning time — they are never even
footer-read). A crash between any two stage writes is therefore
invisible: the net effect of any number of replays is exactly one
committed batch.

``committed_ids`` distinguishes ABSENT (ledger path does not exist →
bootstrap, returns []) from UNREADABLE (exception propagates → the
micro-batch fails and the stream retries) via an explicit Hadoop
FileSystem existence probe, never a blanket except.

At 100 TB the ledger stays tiny (one int per micro-batch) and the
partition-per-batch layout is exactly a lakehouse manifest: O(1) commit,
no rewrite of prior data, compactable offline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hadoop_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def committed_ids(spark: SparkSession, ledger_path: str) -> list[int]:
    """Batch ids recorded in the ledger; [] when the ledger does not
    exist yet (bootstrap). Any OTHER read failure raises — a transient
    FS error must retry the micro-batch, not silently re-bootstrap."""
    if not _hadoop_exists(spark, ledger_path):
        return []
    return [
        int(r["batch_id"]) for r in spark.read.parquet(ledger_path).collect()
    ]


def is_committed(spark: SparkSession, ledger_path: str, batch_id: int) -> bool:
    return int(batch_id) in set(committed_ids(spark, ledger_path))


def stage_write(df: DataFrame, table_path: str, batch_id: int) -> None:
    """Stage one table's batch output under its batch_id partition.
    Overwrite (not append) so an uncommitted replay self-cleans."""
    df.write.mode("overwrite").parquet(f"{table_path}/batch_id={int(batch_id)}")


def read_committed(
    spark: SparkSession, table_path: str, ids: list[int]
) -> DataFrame | None:
    """The table restricted to committed batches; None when nothing is
    committed (bootstrap) — never a partial read of an in-flight batch."""
    if not ids or not _hadoop_exists(spark, table_path):
        return None
    df = spark.read.parquet(table_path)
    return df.filter(F.col("batch_id").isin([int(i) for i in ids])).drop(
        "batch_id"
    )


def commit_batch(spark: SparkSession, ledger_path: str, batch_id: int) -> None:
    """The commit point: append the ledger row AFTER every stage_write."""
    spark.createDataFrame([(int(batch_id),)], "batch_id long").write.mode(
        "append"
    ).parquet(ledger_path)
