"""Bucketed co-located join: the write-once-shuffle pays for every later
join — asserted on the physical plan (no ShuffleExchange on either side)."""

from __future__ import annotations

import pytest

from etl_lorettoscarpa_1asfb2jf21_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from etl_lorettoscarpa_1asfb2jf21_spark.sources.tables import load_table

from test_plans import plan_of


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, sf_small, no_broadcast):
    # managed tables land in the session's spark-warehouse dir; DROP TABLE
    # in the finally removes the files (managed-table semantics)
    o = load_table(spark, sf_small, "orders").select("o_custkey", "o_orderkey")
    c = load_table(spark, sf_small, "customer").select(
        "c_custkey", "c_mktsegment"
    ).withColumnRenamed("c_custkey", "o_custkey")
    try:
        write_bucketed(o, "b_orders", ["o_custkey"], buckets=4)
        write_bucketed(c, "b_customer", ["o_custkey"], buckets=4)

        joined = bucketed_join(spark, "b_orders", "b_customer", ["o_custkey"])
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"

        # and it computes the right thing
        naive = (
            o.join(c, "o_custkey").count()
        )
        assert joined.count() == naive
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_unbucketed_same_join_does_shuffle(spark, sf_small, no_broadcast):
    """Control: the identical join without bucket metadata shuffles both
    sides — the delta IS the bucketing win."""
    o = load_table(spark, sf_small, "orders").select("o_custkey", "o_orderkey")
    c = load_table(spark, sf_small, "customer").select(
        "c_custkey", "c_mktsegment"
    ).withColumnRenamed("c_custkey", "o_custkey")
    plan = plan_of(o.join(c, "o_custkey"))
    assert "Exchange" in plan
