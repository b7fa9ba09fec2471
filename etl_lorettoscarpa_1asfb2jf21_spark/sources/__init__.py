"""Sources & sinks (SURVEY.md §2 S1-S5)."""

from .csv_locale import read_lancamentos_csv
from .tables import TPCH_TABLES, load_table, load_tables

__all__ = ["read_lancamentos_csv", "TPCH_TABLES", "load_table", "load_tables"]
