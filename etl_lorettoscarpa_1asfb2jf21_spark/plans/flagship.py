"""Flagship analytical query (SURVEY.md §2 A3 + J4).

The reference's star schema exists to serve Metabase rollups
(docker-compose.yml:17-29); no query text ships with it, so SURVEY.md
defines the flagship: a 5-way star join → monthly rollup with exact decimal
sums. Phrased over the driver's TPC-H-ish testdata:

    lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region
      → groupBy (region, nation, year, month) → sum(revenue)

Scale notes: region/nation/customer are broadcast (AQE picks this up from
size estimates; we hint the two tiny dims explicitly). The only shuffle is
the final partial+final hash aggregate on the group keys. Decimal(18,2)
arithmetic keeps sums exact and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ..sources.tables import load_table

DEC = DecimalType(18, 2)


def flagship_star_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly gross revenue by region and nation."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    # Per-row product stays exact decimal (scale 4); the sum is therefore
    # addition-order independent. Final cast to double only for output
    # (oracle-comparable pandas dtype), never mid-computation.
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )

    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").cast("long").alias("ano"),
            F.month("o_orderdate").cast("long").alias("mes"),
        )
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
