"""Small-file compaction for parquet datasets.

Streaming sinks and fine-grained partition writes (streaming/ingest.py,
plans/gold.py) produce many files far below the optimal scan unit; at
100 TB the resulting file-listing and task-scheduling overhead dominates
reads (a 128 MB-target scan over 4 KB files is ~30,000x more tasks than
needed). Compaction rewrites a dataset into ceil(bytes / target) files.

Design notes for scale:
  * File sizing is computed from the filesystem's content summary (one
    namenode call, recursive) — never by counting rows through a scan.
  * The rewrite is one shuffle-free coalesce when shrinking file count
    (the common case), falling back to a round-robin repartition when the
    dataset is skewed across input files (coalesce merges co-located
    splits, so pathological layouts can leave fat/thin outputs;
    ``force_even=True`` pays the shuffle for even output sizes).
  * Output goes to a new directory, then readers are repointed — parquet
    directories are immutable-by-convention here (no transactional table
    format in this container; with Delta/Iceberg this operator becomes
    OPTIMIZE / rewrite_data_files).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dataset_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` (recursive), via the Hadoop FS API —
    metadata-only, no data scan."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(jpath).getLength()


def plan_target_files(total_bytes: int, target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Number of output files so each lands near ``target_file_bytes``."""
    return max(1, math.ceil(total_bytes / target_file_bytes))


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    force_even: bool = False,
) -> int:
    """Rewrite the parquet dataset at ``src_path`` into ``dst_path`` with
    ~``target_file_bytes`` files. Returns the planned file count.

    ``force_even=False`` (default) uses coalesce — zero shuffle, each
    output task concatenates input splits. ``force_even=True`` uses a
    round-robin repartition — one shuffle, byte-even outputs.
    """
    n = plan_target_files(dataset_bytes(spark, src_path), target_file_bytes)
    df: DataFrame = spark.read.parquet(src_path)
    out = df.repartition(n) if force_even else df.coalesce(n)
    out.write.mode("overwrite").parquet(dst_path)
    return n
