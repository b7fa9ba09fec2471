"""Structured Streaming tests: file-source bronze ingest with checkpointed
exactly-once, and watermarked windowed aggregation parity with batch."""

from __future__ import annotations

import time
from decimal import Decimal

from etl_lorettoscarpa_1asfb2jf21_spark.streaming.ingest import (
    start_bronze_sink,
    stream_lancamentos,
)
from etl_lorettoscarpa_1asfb2jf21_spark.streaming.windows import windowed_event_counts

CSV1 = """Descrição,Tipo,Grupo,Categoria,Classificação,Data,Valor
Aluguel,Despesa,Casa,Aluguel,Fixa,01/2024,"1.500,00"
Mercado,Despesa,Casa,Supermercado,Variável,01/2024,"823,45"
,Despesa,Casa,Aluguel,Fixa,01/2024,"1,00"
"""

CSV2 = """Descrição,Tipo,Grupo,Categoria,Classificação,Data,Valor
Salário,Receita,Trabalho,CLT,Fixa,02/2024,"7.000,00"
"""


def _run_available(spark, in_dir, out_dir, ckpt_dir):
    q = start_bronze_sink(stream_lancamentos(spark, in_dir), out_dir, ckpt_dir)
    q.awaitTermination(120)
    assert not q.isActive


def test_streaming_bronze_ingest(spark, tmp_path):
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "m1.csv").write_text(CSV1, encoding="utf-8")

    _run_available(spark, in_dir, out_dir, ckpt)
    got = spark.read.parquet(out_dir)
    assert got.count() == 2  # invalid (empty Descrição) row filtered
    vals = {r["Descricao"]: r["Valor"] for r in got.collect()}
    assert vals["Aluguel"] == Decimal("1500.00")
    assert all(r["id_hash"] is not None for r in got.collect())

    # second file arrives; first file must NOT be reprocessed (checkpoint)
    (tmp_path / "in" / "m2.csv").write_text(CSV2, encoding="utf-8")
    _run_available(spark, in_dir, out_dir, ckpt)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 3
    assert got2.filter("Descricao = 'Aluguel'").count() == 1  # no dup


def test_windowed_counts_stream_matches_batch(spark, tmp_path, sf_small):
    from etl_lorettoscarpa_1asfb2jf21_spark.sources.tables import load_table

    events = load_table(spark, sf_small, "events")
    batch = windowed_event_counts(events, "1 hour")

    # stream the same rows through a file source
    stream_src = str(tmp_path / "stream_src")
    events.write.parquet(stream_src)
    stream = (
        spark.readStream.schema(events.schema).parquet(stream_src)
    )
    out = windowed_event_counts(stream, "1 hour", watermark="10 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("win_test")
    b = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in batch.collect()
    }
    s = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in got.collect()
    }
    assert b == s and len(b) > 0


def test_sliding_window(spark, sf_small):
    from etl_lorettoscarpa_1asfb2jf21_spark.sources.tables import load_table

    events = load_table(spark, sf_small, "events")
    slid = windowed_event_counts(events, "2 hours", slide="1 hour")
    tumb = windowed_event_counts(events, "1 hour")
    # every event lands in exactly 2 sliding windows vs 1 tumbling window
    assert slid.agg({"n": "sum"}).collect()[0][0] == 2 * tumb.agg(
        {"n": "sum"}
    ).collect()[0][0]


def test_streaming_gold_end_to_end(spark, tmp_path):
    """Full streaming DW: CSV drops -> validated bronze -> incremental gold
    star schema; second file only adds the genuinely-new rows (idempotent
    upsert), matching the reference's ON CONFLICT net effect."""
    from etl_lorettoscarpa_1asfb2jf21_spark.plans.star import read_warehouse
    from etl_lorettoscarpa_1asfb2jf21_spark.streaming.ingest import start_gold_sink

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = start_gold_sink(stream_lancamentos(spark, str(in_dir)), gold, ckpt)
        q.awaitTermination(180)
        assert not q.isActive

    (in_dir / "m1.csv").write_text(CSV1, encoding="utf-8")
    run()
    wh1 = read_warehouse(spark, gold)
    assert wh1.fato_lancamento.count() == 2
    assert wh1.dim_tipo.count() == 1  # Despesa

    # second drop: one new month + new tipo; re-delivery of m1 rows (same
    # id_hash) must not duplicate facts
    (in_dir / "m2.csv").write_text(CSV2 + 'Aluguel,Despesa,Casa,Aluguel,Fixa,01/2024,"1.500,00"\n', encoding="utf-8")
    run()
    wh2 = read_warehouse(spark, gold)
    assert wh2.fato_lancamento.count() == 3  # +1 new (Salário), dup ignored
    assert wh2.dim_tipo.count() == 2  # +Receita
    assert wh2.dim_tempo.count() == 2  # 01/2024, 02/2024
