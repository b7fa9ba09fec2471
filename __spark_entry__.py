"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship star rollup at sf0.001;
``queries()`` maps every implemented SURVEY.md §2 operator to a callable
(spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the DuckDB-equivalent
ANSI SQL for each (omitted only for hash-based approximate ops, which get
the driver's rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_lorettoscarpa_1asfb2jf21_spark import queries_catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from etl_lorettoscarpa_1asfb2jf21_spark.plans.flagship import flagship_star_rollup

    return flagship_star_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return queries_catalog.QUERIES


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() entry."""
    return queries_catalog.ORACLE_SQL
