"""Brazilian-locale money parsing as native Spark expressions.

Parity target: reference app/utils.py:5-14 (normalize_valor) — strip
thousands dots, swap decimal comma, exact Decimal cast — and app/app.py:65
(NA → "0"). Implemented as pure Column expressions (SURVEY.md §2 F4-F7):
no UDF, so the whole pipeline stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def parse_brl_decimal(col: Column | str, precision: int = 15, scale: int = 2) -> Column:
    """``"1.234,56"`` → Decimal ``1234.56`` (exact, never float).

    Steps (reference app/utils.py:9-13):
      cast to string → drop "." thousands separators → "," → "." →
      cast DecimalType(precision, scale).
    """
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.replace(
        F.replace(c.cast("string"), F.lit("."), F.lit("")),
        F.lit(","),
        F.lit("."),
    )
    return normalized.cast(DecimalType(precision, scale))


def normalize_valor(col: Column | str, default: str = "0") -> Column:
    """Full Valor pipeline: NA→default (app/app.py:65) then BRL parse."""
    c = F.col(col) if isinstance(col, str) else col
    return parse_brl_decimal(F.coalesce(c.cast("string"), F.lit(default)))
