"""Partition-shaping helpers for CPU-bound operators.

Spark sizes scan partitions by *bytes* (spark.sql.files.maxPartitionBytes),
which is right for I/O-bound plans but wrong for operators whose cost is
dominated by per-row compute on small inputs: a 1 MB documents file arrives
as ONE split, and every downstream broadcast join stays in that single-task
stage — pairwise n-gram intersections, minhash signatures, or hyperplane
projections then run on one core of the cluster.

``spread`` fixes the shape: round-robin repartition up to a multiple of the
cluster parallelism, but only when the plan is currently *below* that width —
on a real multi-TB input the scan already has thousands of splits and spread
is a no-op (no extra shuffle at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 2, min_partitions: int | None = None) -> DataFrame:
    """Widen ``df`` to >= defaultParallelism*factor partitions for CPU-heavy
    downstream work; identity when the plan is already at least that wide."""
    sc = df.sparkSession.sparkContext
    target = min_partitions if min_partitions is not None else sc.defaultParallelism * factor
    if target <= 1:
        return df
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
