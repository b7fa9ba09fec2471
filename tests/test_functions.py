"""Unit tests for the native-expression function library — the reference's
edge semantics (FIXTURES.md §4 micro-fixtures)."""

from __future__ import annotations

import hashlib
from decimal import Decimal

from pyspark.sql import functions as F

from etl_lorettoscarpa_1asfb2jf21_spark.functions.dates import (
    month_string_to_date,
    time_attributes,
)
from etl_lorettoscarpa_1asfb2jf21_spark.functions.hashing import business_key_hash
from etl_lorettoscarpa_1asfb2jf21_spark.functions.locale import (
    normalize_valor,
    parse_brl_decimal,
)
from etl_lorettoscarpa_1asfb2jf21_spark.functions.text import (
    char_ngrams_expr,
    detect_language_expr,
    token_count_expr,
)
from etl_lorettoscarpa_1asfb2jf21_spark.functions.vectors import (
    cosine_similarity_expr,
    dot_expr,
)


# FIXTURES.md §4 valor_cases (reference app/utils.py:5-14)
VALOR_CASES = [
    ("1.234,56", Decimal("1234.56")),
    ("0,99", Decimal("0.99")),
    ("-12,50", Decimal("-12.50")),
    ("1.000.000,00", Decimal("1000000.00")),
    ("0", Decimal("0.00")),
]


def test_parse_brl_decimal(spark):
    df = spark.createDataFrame([(s,) for s, _ in VALOR_CASES], ["v"])
    got = df.select(parse_brl_decimal("v").alias("d")).collect()
    assert [r["d"] for r in got] == [d for _, d in VALOR_CASES]


def test_normalize_valor_null_default(spark):
    df = spark.createDataFrame([(None,), ("5,50",)], "v string")
    got = [r["d"] for r in df.select(normalize_valor("v").alias("d")).collect()]
    assert got == [Decimal("0.00"), Decimal("5.50")]


def _reference_hash(tipo, grupo, categoria, data, descricao, valor) -> str:
    """Line-exact reimplementation of gerar_hash (app/utils.py:16-25):
    lower+strip on Tipo/Grupo/Categoria/Descrição, strip-only on Data,
    raw str() on Valor."""
    base = (
        str(tipo).strip().lower() + "-"
        + str(grupo).strip().lower() + "-"
        + str(categoria).strip().lower() + "-"
        + str(data).strip() + "-"
        + str(descricao).strip().lower() + "-"
        + str(valor)
    )
    return hashlib.md5(base.encode("utf-8")).hexdigest()


def test_business_key_hash_matches_hashlib(spark):
    rows = [
        ("Despesa", "Casa", "Aluguel", "03/2024", "  Aluguel Março ", "1500.00"),
        ("RECEITA", "Salário", "CLT", "01/2024", "pagamento", "-12.50"),
        # Data with letters would be case-sensitive (reference strips only):
        ("t", "g", "c", " Mar/2024 ", "D", "0"),
    ]
    cols = ["Tipo", "Grupo", "Categoria", "Data", "Descricao", "Valor"]
    df = spark.createDataFrame(rows, cols)
    got = [r["h"] for r in df.select(business_key_hash().alias("h")).collect()]
    want = [_reference_hash(*r) for r in rows]
    assert got == want


def test_md5_long60_matches_duckdb(spark):
    """md5_long60 must equal DuckDB's ('0x' || substr(md5(c),1,15))::BIGINT
    — the contract every portable-hash oracle (x1_simhash, x1_minhash_dedup)
    rests on."""
    import duckdb

    from etl_lorettoscarpa_1asfb2jf21_spark.functions.hashing import md5_long60

    vals = ["hello", "", "ação café", "the quick brown fox", "123", "a-b-c"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = [r["h"] for r in df.select(md5_long60("s").alias("h")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [v]
        ).fetchone()[0]
        for v in vals
    ]
    assert got == want
    assert all(0 <= h < (1 << 60) for h in got)


def test_hash_case_whitespace_invariance(spark):
    cols = ["Tipo", "Grupo", "Categoria", "Data", "Descricao", "Valor"]
    a = ("Despesa", "Casa", "Aluguel", "03/2024", "Aluguel", "10.00")
    b = ("  DESPESA ", " casa", "ALUGUEL ", "03/2024", " aluguel", "10.00")
    c = ("Despesa", "Casa", "Aluguel", "03/2024", "Aluguel", "11.00")
    df = spark.createDataFrame([a, b, c], cols)
    h = [r["h"] for r in df.select(business_key_hash().alias("h")).collect()]
    assert h[0] == h[1]  # canonicalization collapses case/whitespace
    assert h[0] != h[2]  # valor participates in identity


# FIXTURES.md §4 data_cases (reference app/etl.py:24-37)
def test_month_parse_and_time_attributes(spark):
    df = spark.createDataFrame([("01/2024",), ("02/2024",), ("12/1999",)], ["Data"])
    out = (
        df.withColumn("d", month_string_to_date("Data"))
        .withColumns(time_attributes("d"))
        .orderBy("d")
        .collect()
    )
    r_dec99, r_jan24, r_feb24 = out
    assert (r_jan24["ano"], r_jan24["mes"]) == (2024, 1)
    assert str(r_jan24["data_inicio"]) == "2024-01-01"
    assert str(r_jan24["data_fim"]) == "2024-01-31"
    assert str(r_dec99["data_fim"]) == "1999-12-31"
    assert str(r_feb24["data_fim"]) == "2024-02-29"  # leap year
    assert r_jan24["semana"] == 1  # 2024-01-01 is a Monday → ISO week 1


def test_mm_yyyy_case_sensitivity_guard(spark):
    # 'mm' (minutes) instead of 'MM' would silently yield month=1 for all.
    df = spark.createDataFrame([("07/2024",)], ["Data"])
    got = df.select(F.month(month_string_to_date("Data")).alias("m")).collect()[0]["m"]
    assert got == 7


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), (None,), ("one",)], "t string"
    )
    got = [r["n"] for r in df.select(token_count_expr("t").alias("n")).collect()]
    assert got == [3, 0, 0, 0, 1]


def test_detect_language(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and it is fine",),
            ("o que de e para um do da em",),
            ("xyzzy qwerty",),
        ],
        "t string",
    )
    got = [r["l"] for r in df.select(detect_language_expr("t").alias("l")).collect()]
    assert got == ["en", "pt", "und"]


def test_char_ngrams(spark):
    df = spark.createDataFrame([("abcd",), ("ab",)], "t string")
    got = [r["g"] for r in df.select(char_ngrams_expr("t", 3).alias("g")).collect()]
    assert got[0] == ["abc", "bcd"]
    assert got[1] == []


def test_vector_ops(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([0.0, 0.0], [1.0, 1.0])],
        "a array<float>, b array<float>",
    )
    got = df.select(
        dot_expr("a", "b").alias("d"), cosine_similarity_expr("a", "b").alias("c")
    ).collect()
    assert got[0]["d"] == 1.0 and abs(got[0]["c"] - 1.0) < 1e-12
    assert got[1]["d"] == 0.0 and got[1]["c"] == 0.0
    assert got[2]["c"] == 0.0  # zero-norm guard, no NaN


def test_hash_python_whitespace_parity(spark):
    """str.strip() strips tabs/newlines/NBSP; SQL trim only ascii space.
    The hash must follow the reference's Python semantics (app/utils.py:18)."""
    import hashlib

    probes = ["\tA", "A\n", "\xa0A", " A ", "　A "]
    rows = [(i, p, "", "", "", "", "1") for i, p in enumerate(probes)]
    schema = (
        "i long, Tipo string, Grupo string, Categoria string, Data string, "
        "Descricao string, Valor string"
    )
    got = {
        r["i"]: r["h"]
        for r in spark.createDataFrame(rows, schema)
        .select("i", business_key_hash().alias("h"))
        .collect()
    }
    for i, p in enumerate(probes):
        base = p.strip().lower() + "-" + "-" + "-" + "-" + "-" + "1"
        assert got[i] == hashlib.md5(base.encode()).hexdigest(), repr(p)


def test_blank_to_null_python_whitespace(spark):
    """Python re \\s covers NBSP etc.; the blank gate must match
    (app/app.py:36 runs under Python regex semantics)."""
    from etl_lorettoscarpa_1asfb2jf21_spark.operators.validate import blank_to_null

    rows = [(0, "\xa0\t"), (1, " x "), (2, "　"), (3, "")]
    out = {
        r["i"]: r["v"]
        for r in spark.createDataFrame(rows, "i long, c string")
        .select("i", blank_to_null("c").alias("v"))
        .collect()
    }
    assert out[0] is None and out[2] is None and out[3] is None
    assert out[1] == " x "


def test_packed_argmin_overflow_guard():
    """The int kernels must raise instead of silently wrapping int64 when
    magnitudes × cell count exceed the packing headroom (unnormalized
    vectors / oversized scale would otherwise corrupt assignments)."""
    import numpy as np
    import pytest

    from etl_lorettoscarpa_1asfb2jf21_spark.functions.vectors import (
        _assert_packed_argmin_safe,
    )

    # normal operating point: far under the limit
    _assert_packed_argmin_safe(10**6, 10**6, 64, 1024)
    # ~1e9-row SemDeDup point from the advisory: sqrt(n) centroids with
    # doubled magnitudes crosses 2^63
    with pytest.raises(OverflowError):
        _assert_packed_argmin_safe(2 * 10**6, 2 * 10**6, 64, 32768)
