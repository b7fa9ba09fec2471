"""SparkSession factory.

Replaces the reference's SQLAlchemy engine factory (app/db.py:10-30) — the
"connection" here is a SparkSession with scale-oriented defaults:

* AQE on (runtime re-plan, skew-join handling, partition coalescing) so the
  same code runs on local[32] test data and a 1000-executor cluster.
* Arrow enabled for any Pandas-UDF escape hatches.
* shuffle.partitions kept modest locally; on a real cluster AQE coalesces
  from a high initial number, so we set the *initial* number via env.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_spark(
    app_name: str = "etl-lorettoscarpa-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    On a cluster, ``master`` comes from spark-submit; locally defaults to
    ``local[$SPARK_GRAFT_CPUS]``.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{DEFAULT_CPUS}]")

    sp = shuffle_partitions if shuffle_partitions is not None else DEFAULT_SHUFFLE_PARTITIONS
    conf = {
        "spark.sql.shuffle.partitions": str(sp),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # exact decimal arithmetic must not silently lose precision
        "spark.sql.ansi.enabled": "false",
        "spark.sql.session.timeZone": "UTC",
        # timezone-less parquet timestamps must load as TIMESTAMP, not
        # TIMESTAMP_NTZ (unix_micros/watermarks reject NTZ); belt-and-braces
        # beside the load-boundary cast in sources/tables.normalize_ntz,
        # which also covers externally-built sessions (the driver's).
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
