"""Native-expression scalar function library.

Every function here returns a Column built from pyspark.sql.functions —
JVM-side, whole-stage-codegen friendly. No row-at-a-time Python UDFs.
"""

from .locale import normalize_valor, parse_brl_decimal
from .hashing import business_key_hash, canonical_key
from .dates import month_string_to_date, time_attributes
from .text import (
    detect_language_expr,
    quality_score_expr,
    token_count_expr,
    rolling_fingerprint_expr,
)
from .vectors import cosine_similarity_expr, dot_expr, l2_norm_expr

__all__ = [
    "normalize_valor",
    "parse_brl_decimal",
    "business_key_hash",
    "canonical_key",
    "month_string_to_date",
    "time_attributes",
    "detect_language_expr",
    "quality_score_expr",
    "token_count_expr",
    "rolling_fingerprint_expr",
    "cosine_similarity_expr",
    "dot_expr",
    "l2_norm_expr",
]
