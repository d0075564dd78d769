"""Watermark semantics test (B14): append-mode windows finalize only
once the watermark passes them, and late events behind the watermark
are DROPPED — demonstrated across two real micro-batches of a file
stream, not claimed from documentation."""

from __future__ import annotations

import time
import uuid

from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "ts string, user_id long, value double").select(
        F.col("ts").cast("timestamp"), "user_id", "value"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_late_data_dropped_behind_watermark(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    sink = f"wm_{uuid.uuid4().hex[:8]}"

    # batch 1: three on-time events in [10:00, 10:10), plus a 10:30
    # event that advances the watermark to 10:25 — past the window end,
    # so the window finalizes and is emitted in append mode.
    _write_batch(
        spark,
        src,
        [
            ("2026-01-01 10:01:00", 1, 1.0),
            ("2026-01-01 10:04:00", 1, 1.0),
            ("2026-01-01 10:08:00", 2, 1.0),
            ("2026-01-01 10:30:00", 3, 1.0),
        ],
    )
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r.ws.isoformat(): r.n for r in spark.table(sink).collect()}
        assert first.get("2026-01-01T10:00:00") == 3, first

        # batch 2: one LATE event inside the already-finalized window
        # (behind the 10:25 watermark → must be dropped) and one fresh
        # event at 11:00 that finalizes the 10:30 window.
        _write_batch(
            spark,
            src,
            [
                ("2026-01-01 10:05:00", 9, 1.0),  # late — dropped
                ("2026-01-01 11:00:00", 3, 1.0),
            ],
        )
        # file source lists new files on the next trigger
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            rows = {r.ws.isoformat(): r.n for r in spark.table(sink).collect()}
            if "2026-01-01T10:30:00" in rows:
                break
            time.sleep(1)
        # the finalized window was emitted once with the ON-TIME count
        # only; the late event never re-emits or bumps it.
        emitted = [r for r in spark.table(sink).collect()
                   if r.ws.isoformat() == "2026-01-01T10:00:00"]
        assert len(emitted) == 1 and emitted[0].n == 3, emitted
        assert rows.get("2026-01-01T10:30:00") == 1, rows
    finally:
        q.stop()
