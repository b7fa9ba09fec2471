"""Explicit schemas for bronze (staging) and gold (star) tables.

Mirrors the reference's warehouse DDL (initdb/01_schema.sql:13-86) and its
ingest contract (app/app.py:25). Explicit StructTypes — never inferSchema in
production paths: at 100 TB an inference pass is a full extra scan.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DecimalType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# The 7 required upload columns (app/app.py:25). All arrive as strings; Valor
# is parsed to Decimal downstream (functions.locale).
REQUIRED_COLUMNS = [
    "Descricao",
    "Tipo",
    "Grupo",
    "Categoria",
    "Classificacao",
    "Data",
    "Valor",
]

# Accent-bearing originals → ASCII-safe canonical names used internally.
# (The reference keeps "Descrição"/"Classificação"; we normalize on read.)
COLUMN_ALIASES = {
    "Descrição": "Descricao",
    "Classificação": "Classificacao",
}

LANCAMENTOS_CSV_SCHEMA = StructType(
    [StructField(c, StringType(), True) for c in REQUIRED_COLUMNS]
)

STAGING_SCHEMA = StructType(
    [
        StructField("Descricao", StringType(), True),
        StructField("Tipo", StringType(), True),
        StructField("Grupo", StringType(), True),
        StructField("Categoria", StringType(), True),
        StructField("Classificacao", StringType(), True),
        StructField("Data", StringType(), True),  # MM/yyyy month-string
        StructField("Valor", DecimalType(15, 2), True),
        StructField("id_hash", StringType(), True),
    ]
)

DIM_TIPO_SCHEMA = StructType(
    [
        StructField("id_tipo", IntegerType(), False),
        StructField("nome_tipo", StringType(), False),
    ]
)

DIM_CLASSIFICACAO_SCHEMA = StructType(
    [
        StructField("id_classificacao", IntegerType(), False),
        StructField("nome_classificacao", StringType(), False),
    ]
)

DIM_GRUPO_SCHEMA = StructType(
    [
        StructField("id_grupo", IntegerType(), False),
        StructField("id_tipo", IntegerType(), False),
        StructField("nome_grupo", StringType(), False),
    ]
)

DIM_CATEGORIA_SCHEMA = StructType(
    [
        StructField("id_categoria", IntegerType(), False),
        StructField("id_grupo", IntegerType(), False),
        StructField("nome_categoria", StringType(), False),
    ]
)

DIM_TEMPO_SCHEMA = StructType(
    [
        StructField("id_tempo", IntegerType(), False),
        StructField("ano", IntegerType(), False),
        StructField("mes", IntegerType(), False),
        StructField("semana", IntegerType(), False),
        StructField("data_inicio", DateType(), False),
        StructField("data_fim", DateType(), False),
    ]
)

FATO_LANCAMENTO_SCHEMA = StructType(
    [
        StructField("id_tipo", IntegerType(), False),
        StructField("id_grupo", IntegerType(), False),
        StructField("id_categoria", IntegerType(), False),
        StructField("id_tempo", IntegerType(), False),
        StructField("id_classificacao", IntegerType(), True),
        StructField("descricao", StringType(), True),
        StructField("valor", DecimalType(15, 2), True),
        StructField("id_hash", StringType(), False),
    ]
)
