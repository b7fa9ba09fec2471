"""Sessionization tests: the three execution shapes agree, and the custom
applyInPandasWithState sessionizer closes sessions both by gap and by
event-time timeout across checkpointed restarts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_lorettoscarpa_1asfb2jf21_spark.sources.tables import load_table
from etl_lorettoscarpa_1asfb2jf21_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_session_window,
    sessionize_stateful_stream,
)


def test_batch_and_session_window_agree(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    a = {
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in sessionize_batch(events).collect()
    }
    b = {
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in sessionize_session_window(events).collect()
    }
    assert a == b
    assert len(a) > 0


EVENT_SCHEMA = "user_id long, event_id long, ts timestamp, value double"


def _write_events(spark, in_dir, name, rows):
    """Drop ONE flat parquet file into the stream watch dir (the file source
    does not recurse into the directories df.write.parquet creates)."""
    import glob
    import pathlib
    import shutil
    import tempfile

    pathlib.Path(in_dir).mkdir(parents=True, exist_ok=True)
    with tempfile.TemporaryDirectory() as scratch:
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{scratch}/out")
        (part,) = glob.glob(f"{scratch}/out/part-*.parquet")
        shutil.copy(part, f"{in_dir}/{name}")


def _run_stream(spark, in_dir, out_dir, ckpt):
    src = spark.readStream.schema(EVENT_SCHEMA).parquet(in_dir)
    q = (
        sessionize_stateful_stream(src, gap="30 minutes", watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive


def test_stateful_stream_closes_by_gap_and_timeout(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: u1 has two events 10 min apart (one session), u2 one event
    _write_events(
        spark,
        in_dir,
        "f1.parquet",
        [(1, 1, ts(0), 1.0), (1, 2, ts(10), 2.0), (2, 3, ts(5), 5.0)],
    )
    _run_stream(spark, in_dir, out_dir, ckpt)

    # batch 2 (restart from checkpoint): u1 event 3h later -> closes u1's
    # first session by GAP; watermark advances to 02:00 -> u2's idle session
    # (timeout due 00:35) closes by TIMEOUT in the no-data batch
    _write_events(spark, in_dir, "f2.parquet", [(1, 4, ts(180), 7.0)])
    _run_stream(spark, in_dir, out_dir, ckpt)

    got = {
        (r["user_id"], r["session_start_us"], r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    us = lambda minutes: int(ts(minutes).replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    assert (1, us(0), 2, 3.0) in got, got  # u1 session closed by gap
    assert (2, us(5), 1, 5.0) in got, got  # u2 session closed by timeout
    # u1's 03:00 session is still open -> not emitted
    assert all(not (u == 1 and s == us(180)) for u, s, _, _ in got)
