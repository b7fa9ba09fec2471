"""Content-hash row identity (SURVEY.md §2 D4, F1-F3).

Parity target: reference app/utils.py:16-25 (gerar_hash) — MD5 over the
lowercased/trimmed business key joined with "-". The reference does this with
a row-at-a-time pandas apply; here it is a single native expression
(md5(concat_ws(...))) that byte-matches hashlib.md5 output, verified in
tests/test_functions.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .strings import py_strip

# Business-key columns in the exact order the reference joins them
# (app/utils.py:17-23): Tipo, Grupo, Categoria, Data, Descricao, Valor.
BUSINESS_KEY = ["Tipo", "Grupo", "Categoria", "Data", "Descricao"]


def canonical_key(cols: Sequence[Column | str], sep: str = "-") -> Column:
    """lower(trim(c)) for each part, joined with ``sep``.

    NULL parts are treated as empty string (concat_ws skips nulls, which
    would shift fields; coalesce pins each slot).
    """
    parts = []
    for c in cols:
        col = F.col(c) if isinstance(c, str) else c
        parts.append(F.coalesce(F.lower(py_strip(col.cast("string"))), F.lit("")))
    return F.concat_ws(sep, *parts)


def md5_long60(col: Column | str) -> Column:
    """Engine-portable 60-bit hash: first 15 md5 hex chars as a bigint.

    DuckDB computes the identical value with
    ``('0x' || substr(md5(c), 1, 15))::BIGINT``, which makes any
    hash-partitioned / hash-signed operator built on it (MinHash bins,
    SimHash bit votes, band buckets) exactly mirrorable in an ANSI-SQL
    oracle — unlike ``xxhash64``, whose seeded XXH64 exists only in Spark.
    ~2-3× slower per call than xxhash64, so hot paths keep xxhash64 and the
    oracle-checked catalog queries opt in via ``portable=True``.
    Value range [0, 2^60): always non-negative, so ``pmod``/``%`` and
    decimal string renderings agree across engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def md5_pair120(col: Column | str) -> Column:
    """Engine-portable 120-bit hash: STRUCT(h1, h2) of md5 hex chars 1-15
    and 16-30, each a non-negative 60-bit BIGINT (one md5 per value; the
    two substrings slice the same digest). DuckDB mirrors it with
    ``{h1: ('0x'||substr(m,1,15))::BIGINT, h2: ('0x'||substr(m,16,15))::BIGINT}``.

    Why it exists: a single 60-bit key is collision-FREE on gate-scale
    corpora but collision-EXPECTED at 100 TB (birthday bound ~2^30 keys;
    a 10^12-gram decontamination pass would merge unrelated grams). At
    120 bits the birthday bound is ~2^60, so P(any collision) over 10^12
    distinct grams is ~4e-13 — collision-safe at the target scale while
    still shuffling 16 fixed bytes instead of ~30-byte gram strings.
    """
    c = F.col(col) if isinstance(col, str) else col
    m = F.md5(c)
    return F.struct(
        F.conv(F.substring(m, 1, 15), 16, 10).cast("bigint").alias("h1"),
        F.conv(F.substring(m, 16, 15), 16, 10).cast("bigint").alias("h2"),
    )


def business_key_hash(
    tipo: str = "Tipo",
    grupo: str = "Grupo",
    categoria: str = "Categoria",
    data: str = "Data",
    descricao: str = "Descricao",
    valor: str = "Valor",
) -> Column:
    """MD5 hex digest byte-compatible with the reference gerar_hash
    (app/utils.py:16-25): lower(trim) on Tipo/Grupo/Categoria/Descrição,
    trim-only on Data, raw str() on Valor, joined with "-".
    """

    def lt(c: str) -> Column:
        # py_strip, not F.trim: the reference strips with Python semantics
        # (tabs/NBSP/unicode spaces), SQL trim only removes ascii space
        return F.coalesce(F.lower(py_strip(F.col(c).cast("string"))), F.lit(""))

    base = F.concat_ws(
        "-",
        lt(tipo),
        lt(grupo),
        lt(categoria),
        F.coalesce(py_strip(F.col(data).cast("string")), F.lit("")),
        lt(descricao),
        F.coalesce(F.col(valor).cast("string"), F.lit("")),
    )
    return F.md5(base)
