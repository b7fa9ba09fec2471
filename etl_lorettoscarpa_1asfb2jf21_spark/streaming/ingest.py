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


def start_gold_sink(
    staged: DataFrame, gold_path: str, checkpoint_dir: str
) -> StreamingQuery:
    """Streaming EP2: every micro-batch runs the star-schema ETL
    incrementally against the persisted gold layer (foreachBatch).

    foreachBatch gives at-least-once batch delivery; the upsert-ignore
    semantics inside run_etl (anti-join on the natural/hash keys) make
    replays idempotent — the same exactly-once-net-effect contract the
    reference gets from ON CONFLICT DO NOTHING (app/etl.py:48-129).

    The gold tables are re-read each batch and the fact grows by
    append-only new rows; tables are localCheckpoint'ed before the
    overwrite so Spark never reads and overwrites the same files in one
    plan. (On a real deployment this is a Delta/Iceberg MERGE; plain
    parquet keeps the engine dependency-free here.)
    """
    import os

    from ..plans.star import Warehouse, read_warehouse, run_etl, write_warehouse

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        existing = (
            read_warehouse(spark, gold_path)
            if os.path.isdir(f"{gold_path}/fato_lancamento")
            else Warehouse()
        )
        wh = run_etl(batch_df, existing)
        for name in vars(wh):
            setattr(wh, name, getattr(wh, name).localCheckpoint(eager=True))
        write_warehouse(wh, gold_path)

    return (
        staged.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
