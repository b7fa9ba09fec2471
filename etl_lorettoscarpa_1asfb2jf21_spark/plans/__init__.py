"""End-to-end pipelines: bronze ingest, star-schema build, flagship rollups."""

from .star import Warehouse, ingest_lancamentos, run_etl
from .flagship import flagship_star_rollup

__all__ = ["Warehouse", "ingest_lancamentos", "run_etl", "flagship_star_rollup"]
