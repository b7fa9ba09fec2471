"""Portable sketch operators (operators/sketches.py): estimator quality
and the structural properties the 100 TB story rests on."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_lorettoscarpa_1asfb2jf21_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_M,
    cms_counters,
    cms_estimate,
    hll_distinct,
)


def test_hll_estimate_within_error_bound(spark):
    """Relative error stays within 4 standard errors (1.04/sqrt(m)) of
    the exact distinct count across cardinalities spanning the
    linear-counting and raw-estimator regimes."""
    se = 1.04 / (HLL_M**0.5)
    for n in (50, 500, 5_000, 50_000):
        df = spark.range(n).select(
            F.lit("g").alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v")
        )
        est = hll_distinct(df, "v", ["g"]).collect()[0]["hll_est"]
        assert abs(est - n) / n <= 4 * se, (n, est)


def test_hll_is_insensitive_to_duplication(spark):
    """The mergeable-summary property: duplicating every row must not
    move the estimate at all (registers are max-aggregated)."""
    base = spark.range(2_000).select(
        F.lit("g").alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    est1 = hll_distinct(base, "v", ["g"]).collect()[0]["hll_est"]
    est2 = hll_distinct(base.union(base).union(base), "v", ["g"]).collect()[0][
        "hll_est"
    ]
    assert est1 == est2


def test_cms_overestimates_and_is_bounded(spark):
    """est >= true count for EVERY candidate (structural), and the
    counter table never exceeds depth x width cells."""
    df = spark.range(20_000).select((F.col("id") % 700).alias("k"))
    counters = cms_counters(df, "k")
    assert counters.count() <= CMS_DEPTH * CMS_WIDTH
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    cand = exact.orderBy(F.col("n").desc(), "k").limit(30)
    est = cms_estimate(counters, cand.select("k"), "k")
    joined = cand.join(est, "k").collect()
    assert len(joined) == 30
    assert all(r["cms_est"] >= r["n"] for r in joined)


def test_cms_absent_candidate_estimates_not_dropped(spark):
    """A candidate absent from the sketched data must still come back
    with an estimate (its min runs over coalesced-0 cells, so it can be
    0 — the correct CMS answer) instead of being silently dropped by an
    inner join when one of its (row, bucket) cells was never touched."""
    df = spark.range(50).select((F.col("id") % 5).alias("k"))
    counters = cms_counters(df, "k")
    # ids 1000..1004 never appear in the data; with only 5 live keys the
    # 4x256 counter table is almost empty, so their cells are untouched
    cand = spark.range(1000, 1005).select(F.col("id").alias("k"))
    rows = cms_estimate(counters, cand, "k").collect()
    assert len(rows) == 5
    assert all(r["cms_est"] == 0 for r in rows)


def test_sk_queries_native_plans(spark, sf_medium):
    """Both sketch queries stay fully JVM-side and HLL's shuffle is
    register-bounded: the aggregate above the scan groups by the
    register index, never by the raw value."""
    from etl_lorettoscarpa_1asfb2jf21_spark.queries_catalog_extras import QUERIES

    for name in ("sk1_hll_distinct", "sk2_cms_heavy_hitters"):
        df = QUERIES[name](spark, sf_medium)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "BatchEvalPython" not in plan and "Python" not in plan, name
    sk2 = QUERIES["sk2_cms_heavy_hitters"](spark, sf_medium)
    plan2 = sk2._sc._jvm.PythonSQLUtils.explainString(
        sk2._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan2  # top-20 without a global sort


def test_a8_matches_duckdb_quantile_disc(spark, sf_medium):
    """Pin a8's histogram-walk quantile definition against DuckDB's
    builtin quantile_disc: smallest element whose cumulative count
    reaches ceil(q*n)."""
    import duckdb

    from etl_lorettoscarpa_1asfb2jf21_spark.queries_catalog_extras import QUERIES

    got = {
        r["l_returnflag"]: (r["p50_cents"], r["p90_cents"], r["p99_cents"])
        for r in QUERIES["a8_scalable_quantiles"](spark, sf_medium).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_medium}/lineitem.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            """
            SELECT l_returnflag,
                   quantile_disc(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                      * 100 AS BIGINT), 0.5),
                   quantile_disc(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                      * 100 AS BIGINT), 0.9),
                   quantile_disc(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                      * 100 AS BIGINT), 0.99)
            FROM lineitem GROUP BY 1
            """
        ).fetchall()
    }
    assert got == want
