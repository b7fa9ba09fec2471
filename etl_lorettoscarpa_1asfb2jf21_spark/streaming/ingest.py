"""Streaming bronze ingest (SURVEY.md §7 M4 extension).

The reference ingests one CSV per month through a Streamlit widget
(app/app.py:17-22). The Spark-native shape is a file-source stream: drop
files into a directory, get the same validated/normalized/hashed staging
rows continuously, exactly-once per file via checkpointing.

The transformation lineage is IDENTICAL to the batch path
(plans.star.ingest_lancamentos applies the same expressions) — one
definition of the contract, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.hashing import business_key_hash
from ..functions.locale import normalize_valor
from ..operators.validate import any_null_mask, normalize_blanks
from ..schemas import COLUMN_ALIASES, LANCAMENTOS_CSV_SCHEMA, REQUIRED_COLUMNS


def stream_lancamentos(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream over a drop directory → validated staging rows (lazy).

    Invalid rows (any required field null/blank) are *filtered* here, not
    quarantined — a streaming sink for the quarantine split is trivially the
    complement filter on a second query over the same source.
    """
    raw = (
        spark.readStream.schema(LANCAMENTOS_CSV_SCHEMA)
        .option("header", True)
        .option("quote", '"')
        .option("emptyValue", "")
        .csv(input_dir)
    )
    for old, new in COLUMN_ALIASES.items():
        if old in raw.columns:
            raw = raw.withColumnRenamed(old, new)
    normalized = normalize_blanks(raw, REQUIRED_COLUMNS)
    valid = normalized.filter(~any_null_mask(REQUIRED_COLUMNS))
    return (
        valid.na.fill({"Valor": "0"})
        .withColumn("id_hash", business_key_hash())
        .withColumn("Valor", normalize_valor("Valor"))
    )


def start_bronze_sink(
    staged: DataFrame, output_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Append-mode parquet sink with checkpoint (exactly-once per file)."""
    return (
        staged.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
