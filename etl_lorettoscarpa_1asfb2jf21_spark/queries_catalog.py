"""Named query catalog: SURVEY.md §2 operator → (Spark callable, DuckDB oracle).

Each QUERIES[name] is ``(spark, sf_dir) -> DataFrame``; ORACLE_SQL[name] is
the ANSI-SQL twin DuckDB runs on the same parquet (views pre-registered by
the driver). Column names/aliases match exactly on both sides — the driver
sorts columns by name before hashing values.

Aggregates use exact Decimal arithmetic (cast inputs to DECIMAL(18,2) before
SUM) so Spark and DuckDB produce bit-identical results regardless of
addition order — double sums would be order-dependent.

Output-dtype policy (so both engines land on identical pandas values):
  * final numeric aggregates are CAST(... AS DOUBLE) on both sides —
    DuckDB's fetchdf converts DECIMAL to float64 while Spark yields Decimal
    objects, which some comparators treat as unequal;
  * dates/timestamps in output are ISO strings on both sides;
  * integer outputs are BIGINT on both sides (Spark year()/row_number()
    are 32-bit, DuckDB EXTRACT/ROW_NUMBER are 64-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from .functions.hashing import canonical_key
from .plans.flagship import flagship_star_rollup
from .sources.tables import load_table

DEC = DecimalType(18, 2)

QUERIES: dict = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable under ``name``."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# =====================================================================
# Flagship (A3 + J4): 5-way star join → monthly decimal rollup
# =====================================================================

query(
    "flagship_star_rollup",
    """
    SELECT r_name AS region_name, n_name AS nation_name,
           EXTRACT(YEAR FROM o_orderdate) AS ano,
           EXTRACT(MONTH FROM o_orderdate) AS mes,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY 1, 2, 3, 4
    """,
)(flagship_star_rollup)


_FLAGSHIP_ANSI = """
    SELECT n_name AS nation_name, o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name, o_orderpriority
"""


@query("sql1_ansi_passthrough", _FLAGSHIP_ANSI)
def sql1_ansi_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface: the IDENTICAL ANSI text runs through spark.sql() here
    and through DuckDB as its own oracle — full parse→analyze→optimize→
    execute parity on the dialect intersection (registered temp views)."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_FLAGSHIP_ANSI)


# =====================================================================
# Projection / filter / predicates (P1-P8)
# =====================================================================

@query(
    "p1_projection",
    "SELECT c_custkey, c_name, c_mktsegment FROM customer",
)
def p1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: column pruning — scan must read only 3 of 5 columns."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "p2_filter_notnull",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice AS total
    FROM orders
    WHERE o_orderstatus IS NOT NULL AND o_totalprice > 100000
    """,
)
def p2_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: IS NOT NULL + comparison filter, pushed into the parquet scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isNotNull() & (F.col("o_totalprice") > 100000)
    ).select("o_orderkey", "o_orderstatus", F.col("o_totalprice").alias("total"))


@query(
    "p4_blank_to_null",
    """
    SELECT doc_id,
           CASE WHEN regexp_matches(source, '^[\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\x{1680}\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]*$') THEN NULL ELSE source END AS source_norm
    FROM documents
    """,
)
def p4_blank_to_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: ''/whitespace-only → NULL normalization (app/app.py:35-36)."""
    from .operators.validate import blank_to_null

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", blank_to_null("source").alias("source_norm"))


@query(
    "p5_any_null_rows",
    """
    SELECT event_id, user_id, event_type
    FROM events
    WHERE event_type IS NULL OR props IS NULL
    """,
)
def p5_any_null_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: row-wise any-null mask over a column subset."""
    from .operators.validate import any_null_mask

    e = load_table(spark, sf_dir, "events")
    return e.filter(any_null_mask(["event_type", "props"])).select(
        "event_id", "user_id", "event_type"
    )


@query(
    "p6_null_field_report",
    """
    WITH t AS (
      SELECT event_id,
             NULLIF(event_type, 'error') AS et,
             CASE WHEN value < 5 THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id,
           concat_ws(',',
              CASE WHEN et IS NULL THEN 'et' END,
              CASE WHEN v IS NULL THEN 'v' END
           ) AS null_fields
    FROM t
    WHERE et IS NULL OR v IS NULL
    """,
)
def p6_null_field_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: quarantine rows with the per-field null report (app/app.py:41-59).

    The driver testdata carries no actual NULLs, so the report runs over
    deterministically derived nullable columns (error event_type, low value)
    — the operator logic (any-null mask + per-field name array) is identical
    to the reference's validation gate. The report column is emitted as a
    comma-joined STRING (not array<string>): the driver's pandas
    canonicalizer cannot sort/hash list cells, and both engines' concat
    skips NULLs in the declared column order, so the string forms agree
    byte-for-byte.
    """
    from .operators.validate import any_null_mask, null_fields_expr

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("event_type"))
        .alias("et"),
        F.when(F.col("value") < 5, None).otherwise(F.col("value")).alias("v"),
    )
    return e.filter(any_null_mask(["et", "v"])).select(
        "event_id",
        F.array_join(null_fields_expr(["et", "v"]), ",").alias("null_fields"),
    )


@query(
    "p7_null_fill",
    """
    SELECT event_id, COALESCE(event_type, 'unknown') AS event_type_filled
    FROM events
    """,
)
def p7_null_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: fillna default value (app/app.py:65)."""
    e = load_table(spark, sf_dir, "events")
    return e.na.fill({"event_type": "unknown"}).select(
        "event_id", F.col("event_type").alias("event_type_filled")
    )


# =====================================================================
# Distinct / dedup (D1-D4)
# =====================================================================

@query("d1_distinct_single", "SELECT DISTINCT c_mktsegment FROM customer")
def d1_distinct_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/D2: single-column distinct (hash aggregate)."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@query(
    "d2_distinct_multi",
    """
    SELECT DISTINCT EXTRACT(YEAR FROM o_orderdate) AS ano,
                    EXTRACT(MONTH FROM o_orderdate) AS mes
    FROM orders
    """,
)
def d2_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 over a computed key — the dim_tempo distinct (app/etl.py:27)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.year("o_orderdate").cast("long").alias("ano"),
        F.month("o_orderdate").cast("long").alias("mes"),
    ).distinct()


@query(
    "d3_dedup_by_key",
    """
    SELECT l_orderkey, l_linenumber
    FROM (SELECT l_orderkey, l_linenumber,
                 ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
          FROM lineitem)
    WHERE rn = 1
    """,
)
def d3_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: key-scoped dedup — first row per key by a deterministic order."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber")
    )


@query(
    "d4_content_hash",
    """
    SELECT p_partkey,
           md5(concat_ws('-', lower(regexp_replace(p_name, '^[\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\x{1680}\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]+|[\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\x{1680}\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]+$', '', 'g')),
                         lower(regexp_replace(p_brand, '^[\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\x{1680}\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]+|[\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\x{1680}\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]+$', '', 'g')),
                         lower(regexp_replace(p_type, '^[\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\x{1680}\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]+|[\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\x{1680}\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]+$', '', 'g')))) AS id_hash
    FROM part
    """,
)
def d4_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4/F1-F3: MD5 content identity over a canonicalized business key."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.md5(canonical_key(["p_name", "p_brand", "p_type"])).alias("id_hash"),
    )


# =====================================================================
# Joins (J1-J5)
# =====================================================================

@query(
    "j1_equi_join",
    """
    SELECT o_orderkey, c_name, o_totalprice AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'O'
    """,
)
def j1_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: single-key inner equi join (FK resolution)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select("o_orderkey", "c_name", F.col("o_totalprice").alias("total"))
    )


@query(
    "j2_composite_join",
    """
    SELECT l.l_orderkey, l.l_linenumber, g.n_lines
    FROM lineitem l
    JOIN (SELECT l_partkey, l_suppkey, COUNT(*) AS n_lines
          FROM lineitem GROUP BY 1, 2) g
      ON l.l_partkey = g.l_partkey AND l.l_suppkey = g.l_suppkey
    WHERE g.n_lines > 1
    """,
)
def j2_composite_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: composite-key (2-column) equi join semantics.

    Expressed as a count-over-window on the composite key: one shuffle of
    lineitem instead of the naive aggregate-then-self-join's two. Same
    result set as the oracle's join formulation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey", "l_suppkey")
    return (
        li.withColumn("n_lines", F.count(F.lit(1)).over(w))
        .filter(F.col("n_lines") > 1)
        .select("l_orderkey", "l_linenumber", "n_lines")
    )


@query(
    "j3_computed_key_join",
    """
    SELECT o_orderkey, t.ano, t.mes, t.n_orders
    FROM orders o
    JOIN (SELECT EXTRACT(YEAR FROM o_orderdate) AS ano,
                 EXTRACT(MONTH FROM o_orderdate) AS mes,
                 COUNT(*) AS n_orders
          FROM orders GROUP BY 1, 2) t
      ON t.ano = EXTRACT(YEAR FROM o.o_orderdate)
     AND t.mes = EXTRACT(MONTH FROM o.o_orderdate)
    """,
)
def j3_computed_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: join on keys computed by date-parse+extract on the probe side
    (the fact→dim_tempo pattern, app/etl.py:127-128)."""
    o = load_table(spark, sf_dir, "orders")
    t = o.groupBy(
        F.year("o_orderdate").cast("long").alias("ano"),
        F.month("o_orderdate").cast("long").alias("mes"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    return o.join(
        F.broadcast(t),
        (t["ano"] == F.year(o["o_orderdate"])) & (t["mes"] == F.month(o["o_orderdate"])),
    ).select("o_orderkey", "ano", "mes", "n_orders")


@query(
    "j4_star_join",
    """
    SELECT n_name AS nation_name, o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IS NOT NULL
    GROUP BY 1, 2
    """,
)
def j4_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: 5-way star join chain with dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .filter(F.col("r_name").isNotNull())
        .groupBy(F.col("n_name").alias("nation_name"), "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        )
    )


@query(
    "j5_anti_join",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j5_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: left-anti join — the ON CONFLICT DO NOTHING mechanism."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        on="c_custkey",
        how="left_anti",
    ).select("c_custkey", "c_name")


@query(
    "j6_semi_join",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def j6_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: left-semi join (EXISTS) — the dual of the J5 anti-join; probe side
    never duplicates, build side prunes to the filter before the shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), on="c_custkey", how="left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS VARCHAR) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1996-03-15'
      AND l_shipdate  > DATE '1996-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> star join -> agg -> top-n.
    Filters reach all three scans; the limit compiles to TakeOrdered."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("date")
    )
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q6_filtered_agg",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)
def q6_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate; every predicate pushes to
    the parquet reader and the whole plan is one codegen stage."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC))
            .cast("double")
            .alias("revenue")
        )
    )


# =====================================================================
# Aggregations (A1-A3)
# =====================================================================

@query("a1_count", "SELECT COUNT(*) AS n FROM lineitem")
def a1_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: total row count."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@query(
    "a3_grouped_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY 1, 2
    """,
)
def a3_grouped_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: TPC-H Q1-style grouped aggregation with exact decimal sums."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# =====================================================================
# Scalar functions (F4-F13)
# =====================================================================

@query(
    "f4_f6_brl_decimal",
    """
    SELECT p_partkey,
           CAST(CAST(replace(replace(brl, '.', ''), ',', '.') AS DECIMAL(15,2)) AS DOUBLE) AS valor
    FROM (SELECT p_partkey,
                 replace(replace(replace(CAST(CAST(p_retailprice AS DECIMAL(15,2)) AS VARCHAR),
                         '.', '#'), ',', '.'), '#', ',') AS brl
          FROM part)
    """,
)
def f4_f6_brl_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4-F6: Brazilian money-string round-trip — synthesize "1234,56"-style
    strings from part.p_retailprice, then parse with the engine's native
    locale pipeline back to exact Decimal."""
    from .functions.locale import parse_brl_decimal

    p = load_table(spark, sf_dir, "part")
    brl = F.translate(
        F.col("p_retailprice").cast(DecimalType(15, 2)).cast("string"), ".,", ",."
    )
    return p.select("p_partkey", parse_brl_decimal(brl).cast("double").alias("valor"))


@query(
    "f8_f13_date_derivation",
    """
    SELECT DISTINCT
           strftime(o_orderdate, '%m/%Y') AS data_str,
           EXTRACT(YEAR FROM o_orderdate) AS ano,
           EXTRACT(MONTH FROM o_orderdate) AS mes,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS data_inicio,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS data_fim
    FROM orders
    """,
)
def f8_f13_date_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8-F13 (ex-semana, checked separately): MM/yyyy format+parse round
    trip, year/month extraction, month boundaries. Dates emitted as ISO
    strings (output-dtype policy)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.date_format("o_orderdate", "MM/yyyy").alias("data_str"),
        F.year("o_orderdate").cast("long").alias("ano"),
        F.month("o_orderdate").cast("long").alias("mes"),
        F.trunc("o_orderdate", "month").cast("string").alias("data_inicio"),
        F.last_day("o_orderdate").cast("string").alias("data_fim"),
    ).distinct()


@query(
    "f11_iso_week",
    """
    SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d, week(o_orderdate) AS semana
    FROM orders
    GROUP BY 1, 2
    """,
)
def f11_iso_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: ISO-8601 week number (pandas isocalendar().week parity)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.to_date("o_orderdate").cast("string").alias("d"),
        F.weekofyear("o_orderdate").cast("long").alias("semana"),
    ).distinct()


# =====================================================================
# Surrogate keys (K1)
# =====================================================================

@query(
    "k1_surrogate_keys",
    """
    SELECT ROW_NUMBER() OVER (ORDER BY c_mktsegment) AS id_segmento,
           c_mktsegment AS nome_segmento
    FROM (SELECT DISTINCT c_mktsegment FROM customer)
    """,
)
def k1_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1: SERIAL → dense deterministic row_number surrogate keys."""
    from .operators.surrogate import with_surrogate_key

    seg = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("nome_segmento"))
        .distinct()
    )
    return with_surrogate_key(seg, "id_segmento", ["nome_segmento"]).select(
        F.col("id_segmento").cast("long"), "nome_segmento"
    )


# =====================================================================
# Source/sink rows exercised as driver queries (S1, S3, S4, P3, P8) —
# previously unit-test-only; round-tripping inside the query gives each
# row a CORRECTNESS entry without needing driver-side fixtures.
# =====================================================================


def _scratch_dir(name: str) -> str:
    """Per-process scratch under the system temp dir (the engine's own
    shuffle/scratch space lives there too). PID-scoped so a concurrent
    bench + gate run can't clobber each other's round-trip files."""
    import os
    import tempfile

    return os.path.join(tempfile.gettempdir(), f"spark_graft_{name}_{os.getpid()}")


@query(
    "s1_csv_brl_roundtrip",
    """
    SELECT p_partkey, CAST(CAST(p_retailprice AS DECIMAL(15,2)) AS DOUBLE) AS price
    FROM part
    """,
)
def s1_csv_brl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 + F4-F7 as one driver-checkable round-trip: render part prices as
    Brazilian-locale strings ("1.234,56"), write a real CSV, re-read it with
    the reference dialect reader (sources/csv_locale.py, app/app.py:22
    parity), and parse back through the locale pipeline to DECIMAL(15,2).
    Lossless by construction (prices are 2-dp money), so the oracle is a
    plain decimal cast of the source column.
    """
    from .functions.locale import parse_brl_decimal
    from .sources.csv_locale import read_lancamentos_csv

    p = load_table(spark, sf_dir, "part")
    # "1,234.56" (format_number) → "1.234,56" (swap separators)
    brl = F.translate(F.format_number(F.col("p_retailprice"), 2), ",.", ".,")
    out = _scratch_dir("s1_csv")
    p.select(F.col("p_partkey"), brl.alias("Valor")).write.mode(
        "overwrite"
    ).option("header", True).csv(out)
    back = read_lancamentos_csv(spark, out)
    return back.select(
        F.col("p_partkey").cast("long"),
        parse_brl_decimal("Valor").cast("double").alias("price"),
    )


@query(
    "s3_s4_sink_roundtrip",
    """
    SELECT n_nationkey AS k, n_name AS nome, 'nation' AS src FROM nation
    UNION ALL
    SELECT r_regionkey AS k, r_name AS nome, 'region' AS src FROM region
    """,
)
def s3_s4_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 (overwrite sink, app/etl.py:16) + S4 (append sink, app/etl.py:39)
    as one driver-checkable round-trip: overwrite a parquet sink with one
    batch, append a second, read the sink back. The overwrite-first shape
    makes repeated driver runs idempotent — exactly the reference's
    replace-then-append staging contract."""
    out = _scratch_dir("s3_s4_sink")
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"),
        F.col("n_name").alias("nome"),
        F.lit("nation").alias("src"),
    )
    region = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("k"),
        F.col("r_name").alias("nome"),
        F.lit("region").alias("src"),
    )
    nation.write.mode("overwrite").parquet(out)  # S3: drop-and-recreate
    region.write.mode("append").parquet(out)  # S4: append
    return spark.read.parquet(out)


@query(
    "p3_dropna",
    """
    WITH t AS (
      SELECT event_id,
             NULLIF(event_type, 'error') AS et,
             CASE WHEN value < 5 THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id, et, v FROM t
    WHERE et IS NOT NULL AND v IS NOT NULL
    """,
)
def p3_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: na.drop over a column subset (app/etl.py:26). The testdata
    carries no physical NULLs, so nullability is derived the same way as
    p6_null_field_report; the operator under test is ``DataFrame.na.drop``
    itself."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("event_type"))
        .alias("et"),
        F.when(F.col("value") < 5, None).otherwise(F.col("value")).alias("v"),
    )
    return e.na.drop(subset=["et", "v"])


@query("p8_schema_check", "SELECT 'data_criacao' AS missing_col")
def p8_schema_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: required-column presence check (app/app.py:28-31) surfaced as a
    query: report which of the reference-style required columns the
    documents table lacks. Driver-side and cheap by design — the check
    reads only the schema, never data."""
    from .operators.validate import missing_columns

    d = load_table(spark, sf_dir, "documents")
    required = ["doc_id", "text", "lang", "source", "data_criacao"]
    missing = missing_columns(d, required)
    return spark.createDataFrame([(m,) for m in missing], "missing_col string")


@query(
    "s5_orc_roundtrip",
    """
    SELECT n_nationkey AS k, n_name AS nome FROM nation
    """,
)
def s5_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-row format breadth: ORC sink + scan round-trip. Columnar like
    parquet (striped, predicate-pushdown-capable); the engine treats the
    format as a scan/sink property, not a semantic one — same lazy plan
    shape as the parquet path."""
    out = _scratch_dir("s5_orc")
    load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"), F.col("n_name").alias("nome")
    ).write.mode("overwrite").orc(out)
    return spark.read.orc(out)


@query(
    "s6_jsonl_roundtrip",
    """
    SELECT r_regionkey AS k, r_name AS nome FROM region
    """,
)
def s6_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-row format breadth: JSON-lines sink + schema-on-read scan
    round-trip (the interchange format of most corpus pipelines). The
    read declares an explicit schema — schema inference over JSON is a
    full extra pass at 100 TB and is the first thing to delete from a
    production job."""
    out = _scratch_dir("s6_jsonl")
    load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("k"), F.col("r_name").alias("nome")
    ).write.mode("overwrite").json(out)
    return spark.read.schema("k long, nome string").json(out)


@query(
    "s8_partitioned_gold_roundtrip",
    """
    SELECT EXTRACT(YEAR FROM o_orderdate) AS ano,
           EXTRACT(MONTH FROM o_orderdate) AS mes,
           o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
    GROUP BY 1, 2, 3
    """,
)
def s8_partitioned_gold_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 at gold-layout fidelity, driver-checkable: write a fact rollup
    PARTITIONED BY (ano, mes) — the reference's dim_tempo-grained fact
    layout (initdb/01_schema.sql:54-59) as a physical layout — then read
    it back with a partition-key filter. The year filter prunes to 12 of
    ~84 month directories on read (PartitionFilters; the same mechanism
    tests/test_star_pipeline.py asserts for the real gold fact), so the
    oracle-checked result ALSO proves the partitioned round-trip preserved
    values exactly.

    Scale: one shuffle for the rollup; the write fans out one file per
    (ano, mes) directory; a month-scoped consumer reads one directory of a
    100 TB fact, never the table.
    """
    out = _scratch_dir("s8_gold")
    o = load_table(spark, sf_dir, "orders")
    rollup = o.groupBy(
        F.year("o_orderdate").cast("long").alias("ano"),
        F.month("o_orderdate").cast("long").alias("mes"),
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
    )
    rollup.write.mode("overwrite").partitionBy("ano", "mes").parquet(out)
    back = spark.read.parquet(out).filter(F.col("ano") == 1995)
    return back.select(
        F.col("ano").cast("long"),
        F.col("mes").cast("long"),
        "o_orderpriority",
        "n_orders",
        "total",
    )


@query(
    "s7_csv_quarantine",
    """
    SELECT CAST(3 AS BIGINT) AS n_good, CAST(2 AS BIGINT) AS n_quarantined
    """,
)
def s7_csv_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 hardened path as a driver query: a CSV with physically malformed
    rows (wrong field count, unterminated quote) lands them in the
    quarantine side with the raw line preserved, while well-formed rows
    parse — the unattended-ingest contract of
    read_lancamentos_csv_with_quarantine. The oracle pins the exact
    good/quarantined split for the fixed malformed input below.

    The driver-local file write stands in for the reference's uploaded
    file (app/app.py:17-19); on a cluster the upload already lives on
    shared storage and only the spark.read path below runs.
    """
    import os

    from .sources.csv_locale import read_lancamentos_csv_with_quarantine

    out = _scratch_dir("s7_csv_quarantine")
    os.makedirs(out, exist_ok=True)
    header = "Descricao,Tipo,Grupo,Categoria,Classificacao,Data,Valor"
    rows = [
        'aluguel,Despesa,Casa,Aluguel,Fixa,03/2024,"1.500,00"',   # good
        'salario,Receita,Trabalho,CLT,Fixa,03/2024,"12.000,00"',  # good
        "mercado,Despesa,Casa",                                   # too few fields
        'luz,Despesa,Casa,Energia,Fixa,03/2024,"200,00",extra',   # too many fields
        'agua,Despesa,Casa,Agua,Fixa,03/2024,"80,00"',            # good
    ]
    with open(os.path.join(out, "upload.csv"), "w") as f:
        f.write(header + "\n" + "\n".join(rows) + "\n")
    good, quarantine = read_lancamentos_csv_with_quarantine(
        spark, os.path.join(out, "upload.csv")
    )
    return good.agg(F.count(F.lit(1)).alias("n_good")).crossJoin(
        quarantine.agg(F.count(F.lit(1)).alias("n_quarantined"))
    )


# ---------------------------------------------------------------------
# Extension catalogs merge in at import time: X1-X4 + engine breadth,
# TPC-H canonical shapes, training-data pipeline ops.
from . import queries_catalog_curation as _cur  # noqa: E402
from . import queries_catalog_ext as _ext  # noqa: E402
from . import queries_catalog_extras as _extras  # noqa: E402
from . import queries_catalog_pipeline as _pipe  # noqa: E402
from . import queries_catalog_quality as _qual  # noqa: E402
from . import queries_catalog_shapes as _shapes  # noqa: E402

QUERIES.update(_ext.QUERIES)
ORACLE_SQL.update(_ext.ORACLE_SQL)
QUERIES.update(_shapes.QUERIES)
ORACLE_SQL.update(_shapes.ORACLE_SQL)
QUERIES.update(_pipe.QUERIES)
ORACLE_SQL.update(_pipe.ORACLE_SQL)
QUERIES.update(_extras.QUERIES)
ORACLE_SQL.update(_extras.ORACLE_SQL)
QUERIES.update(_cur.QUERIES)
ORACLE_SQL.update(_cur.ORACLE_SQL)
QUERIES.update(_qual.QUERIES)
ORACLE_SQL.update(_qual.ORACLE_SQL)

# ---------------------------------------------------------------------
# Registration-order invariant: every fully-oracle-checked query precedes
# every rows-only one.  The driver samples the FIRST 50 entries of
# ``queries()`` for CORRECTNESS_r{N}.json; keeping rows-only entries
# (hash-based approximate ops whose exact values are engine-specific) at
# the tail guarantees the sampled window carries a DuckDB oracle twin for
# each query.  Relative order within each group is preserved.
# tests/test_catalog.py asserts this structurally.
QUERIES = {
    **{k: v for k, v in QUERIES.items() if k in ORACLE_SQL},
    **{k: v for k, v in QUERIES.items() if k not in ORACLE_SQL},
}
