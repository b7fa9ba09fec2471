"""Brazilian-locale CSV reader (SURVEY.md §2 S1).

Parity target: reference app/app.py:22 —
``pd.read_csv(sep=",", quotechar='"', decimal=",")``. Spark's CSV reader has
no ``decimal=","`` option, so the money column is read as a string and parsed
by functions.locale (F4-F6) downstream — which is what we want anyway: the
parse is then part of the Catalyst plan, not the scanner.

Blank-vs-null: pandas keeps ``""`` as a value until explicitly coerced
(app/app.py:35-36); Spark maps ``""`` → null by default. We read with
``emptyValue=""`` so empty strings survive the scan and the validation gate
(operators.validate) performs the coercion — reproducing the reference's
error-reporting semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import COLUMN_ALIASES, LANCAMENTOS_CSV_SCHEMA


def read_lancamentos_csv(
    spark: SparkSession, path: str, header: bool = True
) -> DataFrame:
    """Read an upload CSV with the reference's dialect; accent-normalized
    column names (Descrição→Descricao etc.); all columns as strings."""
    df = (
        spark.read.option("header", header)
        .option("quote", '"')
        .option("sep", ",")
        .option("emptyValue", "")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    for old, new in COLUMN_ALIASES.items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    return df
