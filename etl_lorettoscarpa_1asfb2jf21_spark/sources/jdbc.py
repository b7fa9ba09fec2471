"""JDBC source/sink parity with the reference's Postgres connection.

Parity targets:
* ``app/db.py:10-30`` — engine factory from env vars ``DB_USER``,
  ``DB_PASSWORD``, ``DB_HOST``, ``DB_PORT``, ``DB_NAME`` (same names, same
  defaults). SQLAlchemy's ``pool_pre_ping`` has no Spark analogue — the
  JDBC datasource opens fresh connections per task.
* ``app/etl.py:16`` — ``to_sql(..., if_exists="replace")`` → overwrite.
* ``app/etl.py:39`` — ``to_sql(..., if_exists="append")`` → append.
* ``app/etl.py:138`` — ``pd.read_sql("SELECT * FROM …")`` → ``read_jdbc``,
  but lazy and partitioned instead of a full driver materialization.

Scale notes: a naive ``spark.read.jdbc(table)`` reads through ONE
connection on one executor. ``read_jdbc`` accepts the standard
``partition_column/num_partitions`` split so the scan fans out across the
cluster; writes coalesce to a bounded connection count so a 1000-task
write doesn't open 1000 server connections.

The container ships no JDBC driver jar, so everything network-touching is
exercised behind a skip-if-no-driver marker (tests/test_jdbc.py); URL and
option construction is tested unconditionally.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def jdbc_url_from_env(env: dict[str, str] | None = None) -> str:
    """Postgres JDBC URL from the reference's env-var contract
    (app/db.py:20-26; same variable names and defaults)."""
    e = os.environ if env is None else env
    host = e.get("DB_HOST", "localhost")
    port = e.get("DB_PORT", "5432")
    db_name = e.get("DB_NAME", "loretto_dw")
    return f"jdbc:postgresql://{host}:{port}/{db_name}"


def jdbc_properties(env: dict[str, str] | None = None) -> dict[str, str]:
    e = os.environ if env is None else env
    return {
        "user": e.get("DB_USER", "postgres"),
        "password": e.get("DB_PASSWORD", "postgres"),
        "driver": "org.postgresql.Driver",
    }


def read_jdbc(
    spark: SparkSession,
    table: str,
    url: str | None = None,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """Lazy JDBC table scan (S2 twin of app/etl.py:138).

    With ``partition_column`` (a numeric column, e.g. the SERIAL pk) the
    read issues ``num_partitions`` range-bounded queries in parallel;
    without it, a single-connection read (fine for dimension-sized
    tables, never for facts).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url or jdbc_url_from_env())
        .option("dbtable", table)
    )
    for k, v in (properties or jdbc_properties()).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read needs lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    table: str,
    mode: str = "overwrite",
    url: str | None = None,
    properties: dict[str, str] | None = None,
    max_connections: int = 8,
    batch_size: int = 10_000,
) -> None:
    """JDBC table sink (S3/S4 twin of app/etl.py:16,39).

    ``mode="overwrite"`` reproduces ``if_exists="replace"`` (drop and
    recreate), ``mode="append"`` reproduces ``if_exists="append"``.
    The upsert-ignore sink (S5, ON CONFLICT DO NOTHING) stays an
    anti-join + append — operators/upsert.py — exactly as for the parquet
    warehouse.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    writer = (
        df.coalesce(max_connections)
        .write.format("jdbc")
        .option("url", url or jdbc_url_from_env())
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or jdbc_properties()).items():
        writer = writer.option(k, v)
    writer.save()


def has_jdbc_driver(spark: SparkSession, driver: str = "org.postgresql.Driver") -> bool:
    """True when the driver class is loadable in the JVM — gate for tests
    and for callers that want a graceful parquet fallback."""
    try:
        spark._jvm.java.lang.Class.forName(driver)  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001 — ClassNotFound surfaces as Py4JError
        return False
