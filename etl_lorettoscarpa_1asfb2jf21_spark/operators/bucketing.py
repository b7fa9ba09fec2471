"""Bucketed-table co-location: shuffle-free joins for repeated big-big keys.

At 100 TB the dominant cost of a fact-fact join (orders x lineitem,
events x events) is shuffling both sides on the key for every query. Hash
bucketing pays that shuffle ONCE at write time: both tables are stored
pre-hash-partitioned (and optionally sorted) on the join key into the same
number of buckets, and every subsequent join on that key reads aligned
buckets directly — the plan keeps its SortMergeJoin but loses both
ShuffleExchange nodes, which is the whole shuffle cost of the query.

Catalyst handles this automatically once the tables carry bucket metadata;
these helpers just standardize the write path and make the invariant
testable (tests/test_bucketing.py asserts the exchange-free plan).

When to bucket (the scale judgment call): tables joined repeatedly on the
same key by many queries — fact tables against each other or against a
too-big-to-broadcast dimension. Not worth it for one-off joins (one
shuffle either way) or keys with heavy skew (bucket sizes inherit the
skew; salt instead — operators.skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and sorted, for merge-join readiness)
    by ``keys`` into ``buckets`` buckets as a catalog table.

    Both sides of a future join must use the SAME bucket count (or an
    integer multiple, with ``spark.sql.bucketing.coalesceBucketsInJoin``)
    and the same keys for the exchange to be elided. ``path`` makes the
    table external (data at an explicit location instead of the session
    warehouse dir — needed when the working directory isn't writable).

    The repartition below aligns the write shuffle with the bucket hash
    (both Murmur3 pmod ``buckets``), so each bucket is one file per input
    partitioning — minimal small files without a second pass.
    """
    writer = df.repartition(buckets, *keys).write.mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, keys: list[str]
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys.

    Plain ``join`` — the shuffle elision comes from the tables' bucket
    metadata, not from anything special here. Exists so pipelines name the
    intent and tests can assert the plan shape in one place.
    """
    return spark.table(left_table).join(spark.table(right_table), keys)
