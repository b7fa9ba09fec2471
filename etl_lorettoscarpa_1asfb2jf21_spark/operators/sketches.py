"""Portable approximate-aggregate sketches: HyperLogLog distinct count
and Count-Min heavy-hitter estimation.

Spark ships `approx_count_distinct` (HLL++) and `count_min_sketch`, but
their register layouts are engine-internal — nothing else can verify
them. These implementations take the engine's signature approach
instead: the sketch is built from ENGINE-PORTABLE primitives
(functions/hashing.md5_long60 — the same 60-bit md5 prefix the MinHash
and SimHash family uses) with integer-deterministic register math, so a
DuckDB twin rebuilds the identical sketch and the estimates hash-match
exactly. You get the standard sketch error bounds AND a differential
correctness gate on the estimator itself.

Scale notes (the reason sketches exist at 100 TB):

* HLL: one map-side pass computes (register index, rho) per row; the
  shuffle carries at most m=2^p rows PER GROUP (512 here) regardless of
  input size — partial aggregation collapses everything else map-side.
  Merging shards/windows = max() over registers, the classic
  mergeable-summary property.
* CMS: the counter table is d*w cells (4x256 = 1024 rows) built by one
  hash-aggregation; estimates for any candidate set are a broadcast
  join against those cells. Counters are mergeable by addition.

All expressions are native (no UDF of any kind): md5, conv, bin,
shiftright, and the estimator arithmetic all run inside whole-stage
codegen. Double arithmetic appears only in the final per-group
estimator expression, computed from exact integers in one fixed
formula — IEEE multiplication/division is exactly rounded, so both
engines produce the identical double, and outputs are rounded to
integers regardless.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long60

# ---------------------------------------------------------------- HLL

HLL_P = 9
HLL_M = 1 << HLL_P  # 512 registers
_WBITS = 60 - HLL_P  # md5_long60 yields 60 hash bits; p index bits
# Standard bias constant alpha_m = 0.7213 / (1 + 1.079/m) for m >= 128,
# embedded as an exact double literal on both engines.
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_SCALE = 1 << (_WBITS + 1)  # 2^52: makes every 2^-rho term an exact int


def hll_register_exprs(value: Column | str) -> tuple[Column, Column]:
    """(register index, rho) for one value — the map-side pass. The
    value is hashed as its STRING form (matching the SQL twin's
    CAST(v AS VARCHAR)); index/width split is pure bit arithmetic on
    the non-negative 60-bit hash."""
    v = F.col(value) if isinstance(value, str) else value
    h = md5_long60(v.cast("string"))
    idx = h.bitwiseAND(F.lit(HLL_M - 1))
    w = F.shiftright(h, HLL_P)
    # rho = leading zeros of w in its (60-p)-bit field, + 1.
    # bit length via length(bin(w)) — w=0 means all zeros: rho = wbits+1.
    rho = F.when(w == 0, F.lit(_WBITS + 1)).otherwise(
        F.lit(_WBITS + 1) - F.length(F.bin(w))
    )
    return idx.alias("_hll_idx"), rho.alias("_hll_rho")


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group register table (<= m rows per group): the mergeable
    sketch artifact. max() over ``_mj`` merges shards/windows — and is
    a single streaming-supported stateful aggregation, which is what
    streaming/windows.windowed_hll_registers builds on."""
    idx, rho = hll_register_exprs(value_col)
    return (
        df.select(*group_cols, idx, rho)
        .groupBy(*group_cols, "_hll_idx")
        .agg(F.max("_hll_rho").alias("_mj"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Fold a register table (group cols + _hll_idx + _mj) to per-group
    estimates — the read-time step; registers are what you store."""
    per_group = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("registers_used"),
        F.sum(
            F.expr(f"shiftright(cast({_SCALE} as bigint), cast(_mj as int))")
        ).alias("_s_present"),
    )
    s_total = F.col("_s_present") + (F.lit(HLL_M) - F.col("registers_used")) * F.lit(
        _SCALE
    )
    est_raw = F.lit(HLL_ALPHA * HLL_M * HLL_M * _SCALE) / s_total
    zeros = F.lit(HLL_M) - F.col("registers_used")
    est = F.when(
        (zeros > 0) & (est_raw <= F.lit(2.5 * HLL_M)),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(est_raw)
    return per_group.select(
        *group_cols,
        F.col("registers_used").cast("long").alias("registers_used"),
        F.round(est).cast("long").alias("hll_est"),
    )


def hll_distinct(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group HLL distinct-count estimate, integer-deterministic.

    Output: group cols + ``registers_used`` (non-zero registers),
    ``hll_est`` (rounded estimate, BIGINT). The harmonic mean is
    computed as the exact integer S = sum(2^52 >> rho_j) over all m
    registers (absent registers contribute 2^52), bounded by
    m * 2^51 = 2^60 — no overflow, no float accumulation; the final
    estimate alpha * m^2 * 2^52 / S is one exactly-rounded double op
    chain. Small-range linear counting applies below 2.5m, as in the
    original Flajolet et al. formulation."""
    return hll_estimate_from_registers(
        hll_registers(df, value_col, group_cols), group_cols
    )


def hll_reg_sql(table_expr: str, value_sql: str, group_sql: list[str]) -> str:
    """SQL CTE body producing the per-group register table
    ({groups}, idx, mj) — the shared head of every HLL oracle."""
    g = ", ".join(group_sql)
    return f"""
      SELECT {g}, idx, MAX(rho) AS mj FROM (
        SELECT {g}, h % {HLL_M} AS idx,
               CASE WHEN h // {HLL_M} = 0 THEN {_WBITS + 1}
                    ELSE {_WBITS + 1} - length(bin(h // {HLL_M})) END AS rho
        FROM (
          SELECT {g},
                 ('0x' || substr(md5(CAST({value_sql} AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM {table_expr}
        )
      ) GROUP BY {g}, idx
    """


def hll_est_sql(registers_used: str, s_present: str) -> str:
    """The estimator as a SQL expression over (registers_used,
    s_present) — identical formula to hll_estimate_from_registers."""
    s_total = f"({s_present} + ({HLL_M} - {registers_used}) * {_SCALE}::BIGINT)"
    raw = f"{HLL_ALPHA * HLL_M * HLL_M * _SCALE!r} / {s_total}"
    return f"""CAST(ROUND(
             CASE WHEN ({HLL_M} - {registers_used}) > 0 AND {raw} <= {2.5 * HLL_M!r}
                  THEN {float(HLL_M)!r}
                       * LN({float(HLL_M)!r} / ({HLL_M} - {registers_used}))
                  ELSE {raw}
             END) AS BIGINT)"""


def hll_oracle_sql(
    table_expr: str, value_sql: str, group_sql: list[str]
) -> str:
    """The DuckDB twin of hll_distinct over the same table/expressions."""
    g = ", ".join(group_sql)
    return f"""
    WITH regmax AS (
      {hll_reg_sql(table_expr, value_sql, group_sql)}
    ), grouped AS (
      SELECT {g}, COUNT(*) AS registers_used,
             SUM(({_SCALE}::BIGINT) >> mj) AS s_present
      FROM regmax GROUP BY {g}
    )
    SELECT {g},
           CAST(registers_used AS BIGINT) AS registers_used,
           {hll_est_sql("registers_used", "s_present")} AS hll_est
    FROM grouped
    """


# ---------------------------------------------------------------- CMS

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_bucket_expr(value: Column | str, row: int) -> Column:
    """Row-j bucket of a value: portable seeded 60-bit hash mod width."""
    v = F.col(value) if isinstance(value, str) else value
    return md5_long60(F.concat(F.lit(f"cms{row}:"), v.cast("string"))) % F.lit(
        CMS_WIDTH
    )


def cms_counters(df: DataFrame, value_col: str) -> DataFrame:
    """The d x w counter table (at most 1024 rows) from one pass:
    explode the d row-hashes per input row, hash-aggregate counts."""
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("_row"), cms_bucket_expr(value_col, j).alias("_bucket")
            )
            for j in range(CMS_DEPTH)
        ]
    )
    return (
        df.select(F.explode(rows).alias("_rb"))
        .select("_rb._row", "_rb._bucket")
        .groupBy("_row", "_bucket")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )


def cms_estimate(
    counters: DataFrame, candidates: DataFrame, value_col: str
) -> DataFrame:
    """Point estimates for a (small, broadcastable) candidate set:
    min over the d row counters — the classic CMS upper bound
    (est >= true count always; error <= 2N/w with prob 1 - 2^-d).

    Probes LEFT-join the counter table: a (row, bucket) cell that was
    never incremented (possible only for candidates absent from the
    sketched data) counts as 0, so an out-of-data candidate estimates
    0 instead of being dropped or estimated from its nonzero cells
    only."""
    probes = candidates.select(
        value_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("_row"),
                        cms_bucket_expr(value_col, j).alias("_bucket"),
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("_rb"),
    ).select(value_col, "_rb._row", "_rb._bucket")
    return (
        probes.join(F.broadcast(counters), ["_row", "_bucket"], "left")
        .groupBy(value_col)
        .agg(
            F.min(F.coalesce(F.col("_cnt"), F.lit(0)))
            .cast("long")
            .alias("cms_est")
        )
    )


# -------------------------------------------------------------- Bloom

BLOOM_BITS = 1024  # filter width in bits
_BLOOM_WORD_BITS = 32  # bits packed per int64 word — shifts stay < 2^31,
# so ``1 << (p % 32)`` is identical in Spark and DuckDB (no sign-bit or
# BIGINT-overflow divergence at bit 63)
BLOOM_WORDS = BLOOM_BITS // _BLOOM_WORD_BITS
BLOOM_HASH_SALTS = ("b1|", "b2|")  # k=2 hash functions


def bloom_position_expr(value: Column | str, salt: str) -> Column:
    """Bit position in [0, BLOOM_BITS) for one hash function: the
    engine-portable 60-bit md5 prefix of ``salt || value`` mod the filter
    width. DuckDB twin:
    ``('0x' || substr(md5('<salt>' || CAST(v AS VARCHAR)), 1, 15))::BIGINT
    % 1024``."""
    c = F.col(value) if isinstance(value, str) else value
    return md5_long60(F.concat(F.lit(salt), c.cast("string"))) % BLOOM_BITS


def bloom_build_words(build: DataFrame, value_col: str) -> DataFrame:
    """Build the Bloom filter as a (``_w`` word index, ``_word`` int64
    bit-OR) table of at most BLOOM_WORDS rows — the mergeable-summary
    form (filters over shards union by bit_or per word).

    One map pass over the build side emits k positions per value; the
    shuffle after partial aggregation carries at most BLOOM_WORDS rows
    per partition regardless of build cardinality."""
    pos = build.select(
        F.explode(
            F.array(
                *[bloom_position_expr(value_col, s) for s in BLOOM_HASH_SALTS]
            )
        ).alias("_p")
    )
    mask = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(_p % {_BLOOM_WORD_BITS} AS INT))"
    )
    return (
        pos.groupBy(F.expr(f"_p div {_BLOOM_WORD_BITS}").alias("_w"))
        .agg(F.bit_or(mask).alias("_word"))
    )


def bloom_probe(
    probe: DataFrame, value_col: str, words: DataFrame, flag: str = "bloom_pass"
) -> DataFrame:
    """Mark each probe row with ``flag`` = true iff every hash position's
    bit is set in the filter — the map-side semi-join reduction: the big
    side is never shuffled, each bit test is one broadcast join against
    the ≤BLOOM_WORDS-row word table. False positives are possible (the
    caller exact-verifies survivors); false negatives are not."""
    out = probe
    conds = []
    for i, s in enumerate(BLOOM_HASH_SALTS):
        p = f"_bp{i}"
        out = out.withColumn(p, bloom_position_expr(value_col, s)).join(
            F.broadcast(
                words.select(
                    F.col("_w").alias(f"_w{i}"), F.col("_word").alias(f"_word{i}")
                )
            ),
            F.expr(f"{p} div {_BLOOM_WORD_BITS}") == F.col(f"_w{i}"),
            "left",
        )
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({p} % {_BLOOM_WORD_BITS} AS INT))"
        )
        conds.append(
            F.col(f"_word{i}").isNotNull()
            & (F.col(f"_word{i}").bitwiseAND(mask) != 0)
        )
    mask = conds[0]
    for c in conds[1:]:
        mask = mask & c
    drop = [f"_bp{i}" for i in range(len(BLOOM_HASH_SALTS))]
    drop += [f"_w{i}" for i in range(len(BLOOM_HASH_SALTS))]
    drop += [f"_word{i}" for i in range(len(BLOOM_HASH_SALTS))]
    return out.withColumn(flag, mask).drop(*drop)
