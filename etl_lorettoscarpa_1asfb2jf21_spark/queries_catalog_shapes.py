"""TPC-H canonical query shapes, round 2 of breadth: Q2/Q4/Q5/Q12/Q14/Q16/
Q17/Q18/Q19/Q22 patterns adapted to the driver testdata schema (no partsupp
table; no l_shipmode/commitdate columns — each shape keeps its defining plan
pattern on the columns that exist).

Why these shapes matter at 100 TB (each docstring carries specifics):
min-per-group join-back, date-bounded EXISTS semi-join, cycle-closing star
join (customer nation == supplier nation), conditional aggregation, NOT-IN
anti-join + COUNT(DISTINCT), correlated per-group threshold, HAVING-driven
IN subquery, disjunctive multi-AND pushdown, global-scalar anti-join.

Same contract as queries_catalog: QUERIES[name] = (spark, sf_dir) -> DF,
ORACLE_SQL[name] = the DuckDB twin. Exact-arithmetic policy: every
aggregate threshold comparison is rewritten into integer/DECIMAL
cross-multiplication (no double AVG in a predicate — double accumulation
order would make the two engines disagree on boundary rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from .sources.tables import load_table

DEC = DecimalType(18, 2)

QUERIES: dict = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _revenue() -> F.Column:
    return F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


# =====================================================================
# Q2 shape — min-per-group subquery + join-back
# =====================================================================

@query(
    "q2_min_per_group",
    """
    SELECT r_name AS region_name, s_name AS supplier_name,
           CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE s_acctbal = (
      SELECT min(s2.s_acctbal)
      FROM supplier s2
      JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      WHERE n2.n_regionkey = r.r_regionkey
    )
    """,
)
def q2_min_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-region minimum, joined back to recover the full
    qualifying rows (correlated-min subquery decorrelated into agg + join).

    Scale: the per-group agg is a partial/final hash aggregate over the
    grouping key (5 regions) — the re-join broadcasts the tiny min-table,
    so the big side is scanned once with no extra shuffle.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    enriched = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    )
    # re-key the agg output so the join-back condition references distinct
    # attributes (same-lineage column names would collapse to trivially-true)
    mins = enriched.groupBy(
        F.col("r_regionkey").alias("min_regionkey")
    ).agg(F.min("s_acctbal").alias("min_bal"))
    return (
        enriched.join(
            F.broadcast(mins),
            (F.col("r_regionkey") == F.col("min_regionkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select(
            F.col("r_name").alias("region_name"),
            F.col("s_name").alias("supplier_name"),
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
        )
    )


# =====================================================================
# Q4 shape — date-bounded EXISTS semi-join + priority count
# =====================================================================

@query(
    "q4_priority_exists",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: quarter-bounded orders with EXISTS(lineitem shipped
    after order date), counted per priority. (Reference has no commitdate/
    receiptdate; the defining pattern — date-window + correlated EXISTS with
    an extra non-equi conjunct + group-count — is intact.)

    Scale: left-semi hash join on l_orderkey with the non-equi conjunct
    evaluated inside the join; the date window prunes orders at the scan.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bounded = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    return (
        bounded.join(
            li,
            (bounded["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > bounded["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# =====================================================================
# Q5 shape — cycle-closing 6-way star join (local supplier revenue)
# =====================================================================

@query(
    "q5_local_supplier_revenue",
    f"""
    SELECT n_name AS nation_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where the supplier and customer share a
    nation — the join graph has a cycle (customer.nation == supplier.nation),
    which defeats naive star-join planning.

    Scale: lineitem⋈orders⋈customer carries c_nationkey down to the
    supplier join as an extra equi-conjunct (one hash key, no extra
    shuffle); nation/region broadcast; region filter prunes before the agg.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    bounded = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    return (
        li.join(bounded, li["l_orderkey"] == bounded["o_orderkey"])
        .join(c, bounded["o_custkey"] == c["c_custkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n["n_regionkey"] == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


# =====================================================================
# Q12 shape — conditional aggregation (CASE WHEN inside SUM)
# =====================================================================

@query(
    "q12_conditional_agg",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: pivot-style conditional counts (CASE inside SUM)
    after an orders⋈lineitem join. (No l_shipmode column; l_returnflag keys
    the group and o_orderpriority drives the conditional.)

    Scale: the conditional is evaluated map-side inside the partial
    aggregate — only 3 groups × 2 longs cross the final exchange.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
        )
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# =====================================================================
# Q14 shape — conditional-aggregate ratio (promo revenue share)
# =====================================================================

@query(
    "q14_promo_share",
    f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                      THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
                / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS promo_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1997-03-01' AND l_shipdate < DATE '1997-04-01'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — two conditional decimal sums, one
    terminal double division (both sums exact, so the quotient is the same
    IEEE double on both engines).

    Scale: month filter prunes lineitem at the scan; part is the build
    side of a broadcast join at real-world dimension sizes.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = _revenue()
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date"))
        )
        .join(p, li["l_partkey"] == p["p_partkey"])
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo_rev).cast("double")
                / F.sum(rev).cast("double")
            )
            .cast("double")
            .alias("promo_pct")
        )
    )


# =====================================================================
# Q16 shape — NOT IN anti-join + COUNT(DISTINCT)
# =====================================================================

@query(
    "q16_supplier_count",
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, size), with a
    NOT IN exclusion list realized as a broadcast anti-join.

    Scale: the exclusion subquery is tiny → broadcast left-anti (no
    shuffle); COUNT(DISTINCT) expands to a two-level aggregate —
    de-dup on (brand, size, suppkey), then count — both hash-based.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    excluded = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(excluded), li["l_suppkey"] == excluded["s_suppkey"], "left_anti")
        .join(
            p.filter(
                (F.col("p_type") != "PROMO")
                & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
            ),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# =====================================================================
# Q17 shape — correlated per-group threshold (exact-arithmetic rewrite)
# =====================================================================

@query(
    "q17_below_avg_qty",
    """
    WITH per_part AS (
      SELECT l_partkey,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN per_part ON per_part.l_partkey = lineitem.l_partkey
    WHERE p_type = 'SMALL'
      AND CAST(5 * l_quantity AS DECIMAL(18,2)) * n < qty_sum
    """,
)
def q17_below_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from small-quantity line items (quantity below
    20% of the part's average). The correlated AVG subquery is decorrelated
    into a per-part aggregate re-joined to lineitem, and the predicate
    ``qty < 0.2 * avg`` is cross-multiplied to ``5*qty*n < sum`` so both
    engines compare exact decimals (double AVG would be accumulation-order
    dependent at the boundary).

    Scale: the correlated stat is per-part, so restricting lineitem to
    SMALL parts *first* (broadcast semi-join on the filtered dimension)
    keeps every line of each qualifying part while pruning ~5/6 of the
    aggregate's input — the per-part agg then runs over the small slice
    and broadcasts back, leaving no wide exchange in the plan at this
    selectivity (AQE falls back to a shuffled join if the qualifying-part
    set outgrows the broadcast threshold).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    small = p.filter(F.col("p_type") == "SMALL").select("p_partkey")
    li_small = li.join(
        F.broadcast(small), li["l_partkey"] == small["p_partkey"], "left_semi"
    )
    per_part = li_small.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast(DEC)).alias("qty_sum"),
    )
    return (
        li_small.join(F.broadcast(per_part), li_small["l_partkey"] == per_part["pp_partkey"])
        .filter(
            (F.lit(5) * F.col("l_quantity")).cast(DEC) * F.col("n")
            < F.col("qty_sum")
        )
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


# =====================================================================
# Q18 shape — HAVING-driven IN subquery (large-volume orders)
# =====================================================================

@query(
    "q18_large_orders",
    """
    SELECT c_name, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c_name, o_orderkey, o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders whose total quantity exceeds 250
    (~p99 of the corpus) — an aggregate-filtered IN subquery realized as a
    left-semi join on the HAVING result.

    Scale: the HAVING aggregate and the outer join both hash on
    l_orderkey/o_orderkey; the qualifying-key set is small (top ~1%), so
    AQE converts the semi join to broadcast at runtime.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty_sum"))
        .filter(F.col("qty_sum") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .join(li, F.col("o_orderkey") == li["l_orderkey"])
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )


# =====================================================================
# Q19 shape — disjunction of conjunctive range predicates
# =====================================================================

@query(
    "q19_disjunctive_filter",
    f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs predicate spanning both join sides. Catalyst
    extracts the common per-side conjuncts (brand/size from part, quantity
    from lineitem) and pushes them below the join as a disjunctive filter,
    so both scans prune before the hash join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(p, li["l_partkey"] == p["p_partkey"])
    arm = lambda brand, size_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, size_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return joined.filter(
        arm("Brand#12", 15, 1, 11) | arm("Brand#23", 25, 10, 20) | arm("Brand#34", 35, 20, 30)
    ).agg(F.sum(_revenue()).cast("double").alias("revenue"))


# =====================================================================
# Q22 shape — global-scalar threshold + NOT EXISTS anti-join
# =====================================================================

@query(
    "q22_idle_customers",
    """
    WITH bal AS (
      SELECT COUNT(*) AS n, SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey AS nation_key,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, bal
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * bal.n > bal.s
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderdate >= DATE '2001-01-01'
      )
    GROUP BY c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no *recent*
    orders (none since 2001 — every customer has some order in this corpus,
    so the date bound keeps the anti-join discriminating), grouped by
    nation. The global AVG threshold is cross-multiplied (``bal * n > sum``)
    for exact-decimal comparison, and NOT EXISTS is a left-anti join.

    Scale: the scalar (n, s) aggregate is one row → broadcast into the
    filter (a literal at plan time via crossJoin of a 1-row DF); the
    anti-join hashes on custkey.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c_acctbal").cast(DEC)).alias("s"),
    )
    recent = o.filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("date"))
    return (
        c.crossJoin(F.broadcast(bal))
        .filter(F.col("c_acctbal").cast(DEC) * F.col("n") > F.col("s"))
        .join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("nation_key"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
    )


# =====================================================================
# Q21 shape — multi-EXISTS self-join (sole late supplier per order)
# =====================================================================

@query(
    "q21_sole_late_supplier",
    """
    WITH flagged AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
      FROM flagged GROUP BY 1
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM flagged
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE late AND n_supp > 1 AND n_late = 1
    GROUP BY s_name
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: for finalized multi-supplier orders, count the line
    items of the *only* supplier that shipped late (>90 days after order).
    The canonical form is EXISTS(other supplier) AND NOT EXISTS(other late
    supplier) — decorrelated here into one per-order aggregate
    (distinct-supplier and distinct-late-supplier counts) re-joined to the
    flagged lines, replacing two correlated self-joins of the largest table
    with one aggregate sharing the l_orderkey hash partitioning.

    Scale: flagged is computed once and feeds both the aggregate and the
    final join — same key, so AQE reuses the exchange; supplier broadcasts.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    flagged = (
        li.join(
            o.filter(F.col("o_orderstatus") == "F"),
            li["l_orderkey"] == o["o_orderkey"],
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
            ).alias("late"),
        )
    )
    per_order = flagged.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    return (
        flagged.join(per_order, flagged["l_orderkey"] == per_order["po_orderkey"])
        .filter(F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# =====================================================================
# W5 — interval RANGE frame window (trailing 30-day sum)
# =====================================================================

@query(
    "w5_range_frame",
    """
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_30d
    FROM orders
    """,
)
def w5_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: value-based RANGE frame — each order's trailing-30-day spend per
    customer (2 592 000 s window over the epoch of the order date). RANGE
    frames include same-timestamp peers on both engines, and the frame sum
    is exact decimal, so the result is order-insensitive and deterministic.

    Scale: one shuffle on o_custkey + per-partition sort on the order
    timestamp; the frame is evaluated with a sliding two-pointer pass, no
    per-row rescan. Skewed customers are bounded by their own history.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2_592_000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("trailing_30d"),
    )


# =====================================================================
# Q7 shape — bilateral nation-pair volume (two dim roles, one fact scan)
# =====================================================================

@query(
    "q7_nation_volume",
    f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           EXTRACT(YEAR FROM l_shipdate) AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE ((cn.n_name = 'NATION_10' AND sn.n_name = 'NATION_9')
        OR (cn.n_name = 'NATION_9' AND sn.n_name = 'NATION_10'))
      AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year (names are the testdata's synthetic NATION_k) — the same
    dimension (nation) joins twice under different roles (customer side,
    supplier side), with a symmetric pair predicate across both roles.

    Scale: both nation copies broadcast; the pair predicate can't push
    below either single join (it spans both roles) but Catalyst applies it
    immediately after the second nation join, before the aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    pair = (
        (F.col("cust_nation") == "NATION_10") & (F.col("supp_nation") == "NATION_9")
    ) | ((F.col("cust_nation") == "NATION_9") & (F.col("supp_nation") == "NATION_10"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
        )
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
        .filter(pair)
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("volume"))
    )


# =====================================================================
# Q8 shape — market-share ratio (conditional agg over a wide join)
# =====================================================================

@query(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_9'
                              THEN volume ELSE 0 END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             {_REV_SQL} AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'AMERICA'
    ) t
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of regional revenue per year — the
    defining pattern is a conditional aggregate *ratio* over a join where
    nation appears in two roles and the region filter applies to the
    customer role only. Both sums are exact decimals; the share divides
    once in double (identical IEEE result on both engines).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = _revenue()
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "AMERICA")),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_9", vol).otherwise(
                    F.lit(0).cast(DEC)
                )).cast("double")
                / F.sum(vol).cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


# =====================================================================
# Q10 shape — returned-item ranking (wide group-by + top-n)
# =====================================================================

@query(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, n_name AS nation_name,
           CAST(revenue AS DOUBLE) AS revenue
    FROM (
      SELECT c_custkey, c_name, n_name,
             SUM({_REV_SQL}) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
      GROUP BY c_custkey, c_name, n_name
    ) t
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in a quarter —
    selective fact filters, a wide (multi-attribute) group key, then top-n.
    Deterministic tiebreak on c_custkey so LIMIT 20 is stable cross-engine.

    Scale: the quarter + returnflag predicates push to the lineitem/orders
    scans; the top-20 compiles to TakeOrderedAndProject (per-partition heap
    + single merge), never a global sort.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-07-01").cast("date"))
                & (F.col("o_orderdate") < F.lit("1996-10-01").cast("date"))
            ),
            li["l_orderkey"] == o["o_orderkey"],
        )
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(20)
    )


# =====================================================================
# Q15 shape — global-max join-back (top revenue supplier via "view")
# =====================================================================

@query(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({_REV_SQL}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the maximum quarterly revenue — an
    aggregate feeding both a global-max scalar and the join-back that
    recovers the achieving rows (the 'CREATE VIEW revenue' pattern).
    Exact-decimal revenue makes the equality comparison safe; ties return
    every achieving supplier on both engines.

    Scale: the revenue aggregate is computed once and reused for both
    consumers (cache/exchange reuse); the scalar max crossJoin-broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("supplier_no") == s["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


# =====================================================================
# Q9 / Q11 / Q20 shapes — over a DERIVED partsupp
# =====================================================================
#
# The driver testdata ships no partsupp table, so the three TPC-H shapes
# defined over it derive one deterministically from part × supplier:
#
#   partsupp := {(p, s) : (p_partkey + s_suppkey) % 25 == 0}   (~4 supp/part)
#   ps_supplycost_cents := (p_partkey*37 + s_suppkey*61) % 90000 + 10000
#   ps_availqty         := (p_partkey*5  + s_suppkey*13) % 9999 + 1
#
# Pure integer arithmetic → both engines build the identical table, so the
# queries are fully oracle-checked. The membership predicate is rewritten
# as a COMPUTED-KEY EQUI JOIN (s_suppkey % 25 == (25 - p_partkey % 25) % 25)
# so the derivation is a broadcast hash join, never a nested loop — at
# 100 TB the same shape holds (supplier is the broadcast side).

_PS_SQL = """
      SELECT p_partkey AS ps_partkey, s_suppkey AS ps_suppkey, p_name,
             (p_partkey * 37 + s_suppkey * 61) % 90000 + 10000 AS ps_supplycost_cents,
             (p_partkey * 5 + s_suppkey * 13) % 9999 + 1 AS ps_availqty
      FROM part JOIN supplier ON (p_partkey + s_suppkey) % 25 = 0
"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    pk = F.col("p_partkey").cast("long")
    sk = F.col("s_suppkey").cast("long")
    return (
        p.withColumn("_m", (F.lit(25) - pk % 25) % 25)
        .join(F.broadcast(s.withColumn("_m", sk % 25)), "_m")
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.col("s_suppkey").alias("ps_suppkey"),
            "p_name",
            ((pk * 37 + sk * 61) % 90000 + 10000).alias("ps_supplycost_cents"),
            ((pk * 5 + sk * 13) % 9999 + 1).alias("ps_availqty"),
        )
    )


# supplycost in exact currency: cents × 0.01 as a DECIMAL product (scale
# addition, no division — division scale rules differ between engines)
_COST_SQL = "CAST(ps_supplycost_cents AS DECIMAL(18,0)) * CAST(0.01 AS DECIMAL(3,2))"


def _cost_dec() -> F.Column:
    return F.col("ps_supplycost_cents").cast(DecimalType(18, 0)) * F.lit("0.01").cast(
        DecimalType(3, 2)
    )


@query(
    "q9_product_profit",
    f"""
    WITH partsupp AS ({_PS_SQL})
    SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
           CAST(SUM({_REV_SQL}
                    - {_COST_SQL} * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_profit
    FROM lineitem
    JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit (revenue − supplycost·qty) by supplier nation and
    order year, for parts matching a name pattern.

    Scale: partsupp (derived; filtered on p_name before the fact join) and
    supplier/nation broadcast; the only big-side shuffle is the final
    (nation, year) aggregation — lineitem joins all hash/broadcast on its
    own keys. Exact DECIMAL profit; cast to DOUBLE once at the end.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ps = _derived_partsupp(spark, sf_dir).filter(F.col("p_name").like("%gear%"))
    profit = _revenue() - _cost_dec() * F.col("l_quantity").cast(DEC)
    return (
        li.join(
            F.broadcast(ps),
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@query(
    "q11_important_stock",
    f"""
    WITH partsupp AS ({_PS_SQL}),
    filtered AS (
      SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS value_cents
      FROM partsupp JOIN supplier ON s_suppkey = ps_suppkey
      WHERE s_nationkey < 5
    )
    SELECT ps_partkey, CAST(SUM(value_cents) AS BIGINT) AS value_cents
    FROM filtered
    GROUP BY ps_partkey
    HAVING SUM(value_cents) * 10000 > (SELECT SUM(value_cents) FROM filtered) * 5
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose stock value (supplycost × availqty, summed
    over a nation subset's suppliers) exceeds a fraction of the total.

    The fraction test is integer cross-multiplication
    (sum·10000 > total·5 ⟺ sum > total·0.0005) — exact on both engines,
    no double accumulation in the predicate. Scale: per-part partial/final
    hash agg; the global total is one scalar broadcast back over the
    per-part sums (same reuse-shape as q15/q22).
    """
    s = load_table(spark, sf_dir, "supplier")
    ps = _derived_partsupp(spark, sf_dir)
    filtered = (
        ps.join(
            F.broadcast(s.filter(F.col("s_nationkey") < 5).select("s_suppkey")),
            F.col("s_suppkey") == F.col("ps_suppkey"),
        )
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("value_cents"),
        )
    )
    per_part = filtered.groupBy("ps_partkey").agg(
        F.sum("value_cents").alias("value_cents")
    )
    total = filtered.agg(F.sum("value_cents").alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 10000 > F.col("_total") * 5)
        .select("ps_partkey", "value_cents")
    )


@query(
    "q20_part_promotion",
    f"""
    WITH partsupp AS ({_PS_SQL}),
    shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM partsupp
    JOIN shipped  ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN supplier ON s_suppkey = ps_suppkey
    WHERE p_name LIKE '%bolt%'
      AND CAST(2 * ps_availqty AS DECIMAL(18,2)) > qty
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers holding excess stock (availqty > half the
    quantity they shipped of that part in a year) for parts matching a
    name pattern — the nested-IN chain decorrelated into joins.

    The threshold is cross-multiplied (2·availqty > qty) in exact DECIMAL.
    Scale: 'shipped' is the only fact aggregation (one shuffle on the
    (partkey, suppkey) composite); partsupp and supplier broadcast onto
    it; DISTINCT collapses to the tiny supplier grain at the end.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    ps = _derived_partsupp(spark, sf_dir).filter(F.col("p_name").like("%bolt%"))
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
    )
    return (
        shipped.join(
            F.broadcast(ps),
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("ps_suppkey"))
        .filter((F.lit(2) * F.col("ps_availqty")).cast(DEC) > F.col("qty"))
        .select("s_suppkey", "s_name")
        .distinct()
    )
