"""Streaming window/watermark operators (SURVEY.md §2 B14).

The transformation logic is shared with the batch plans — the same
groupBy(window(...)) expression runs in both modes; only the source
(readStream) and sink (writeStream + watermark) differ. That is the
point of Structured Streaming: one declarative plan, two execution
modes.

The reference's 20-record buffer flush (A14, reference __main__.py:61-66)
maps to micro-batch triggers + foreachBatch here.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

from stupp_exclusion_etl_spark.functions.timeutil import (
    ntz_from_timestamp,
    timestamp_from_ntz,
)


def tumbling_agg(ev: DataFrame, minutes: int = 10, watermark: str | None = None) -> DataFrame:
    """Tumbling-window count/sum per event_type; with `watermark` set
    (e.g. '15 minutes') late events beyond the bound are dropped and
    state is evicted — required for append-mode streaming output.

    Window starts are typed like the event-time column: NTZ in batch
    (catalog ts is NTZ), TIMESTAMP in streaming (watermark rejects
    NTZ). Emit NTZ either way — for the TIMESTAMP case via unix_micros
    arithmetic, NOT the session-TZ-dependent cast (the driver's vanilla
    session is not UTC-pinned)."""
    ts_is_ntz = isinstance(ev.schema["ts"].dataType, TimestampNTZType)
    if watermark is not None:
        ev = ev.withWatermark("ts", watermark)
    start = F.col("w.start")
    return (
        ev.groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            (start if ts_is_ntz else ntz_from_timestamp(start)).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (schema pinned from a batch
    read; ts converted ns→µs exactly as the batch catalog does)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # FileStreamSource wants a directory: stream the sf dir, glob-
    # filtered to the events file.
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # Watermarks require TIMESTAMP (EventTimeWatermark rejects NTZ), so
    # the stream keeps the instant type; downstream NTZ conversions go
    # through functions.timeutil (unix_micros arithmetic), never the
    # session-TZ-dependent cast — the driver's session is NOT UTC-pinned.
    # Spark ≥ 4.1 reads parquet NANOS natively as TIMESTAMP_NTZ; older
    # readers (with nanosAsLong) deliver BIGINT ns. Handle both.
    if isinstance(schema["ts"].dataType, TimestampNTZType):
        return raw.withColumn("ts", timestamp_from_ntz(F.col("ts")))
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def run_tumbling_stream(
    spark: SparkSession,
    sf_dir: str,
    minutes: int = 10,
    watermark: str = "15 minutes",
    timeout_sec: int = 120,
) -> DataFrame:
    """Execute the tumbling aggregation as a real micro-batch streaming
    job (availableNow trigger → memory sink) and return the result
    table. Complete output mode: every window is emitted once the
    bounded input is drained."""
    name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    agg = tumbling_agg(events_stream(spark, sf_dir), minutes, watermark)
    # Scope state-store partitioning to parallelism (see
    # streaming.stateful.run_user_activity_stream).
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def run_atomic_upsert_stream(
    spark: SparkSession,
    sf_dir: str,
    rows_per_batch: int = 20000,
    timeout_sec: int = 180,
):
    """Drain the offset-tracked events replay stream through
    foreachBatch into an atomic manifest-commit table: each micro-batch
    is a last-write-wins MERGE on user_id, published with ONE atomic
    manifest rename carrying the applied batch_id (exactly-once —
    sinks.atomic.streaming_upsert_sink), with the table partitioned by
    event_type so users whose latest event changes type MOVE partitions
    across batches (the cross-batch emptied-partition path). Returns
    the drained AtomicParquetTable; on the bounded input its end state
    is keep-latest-per-user over ALL events regardless of how the
    stream was sliced into batches — the batch-SQL-checkable contract.
    """
    import tempfile

    from pyspark.sql import functions as F

    from stupp_exclusion_etl_spark.sinks.atomic import (
        AtomicParquetTable,
        streaming_upsert_sink,
    )
    from stupp_exclusion_etl_spark.sources.replay_stream import (
        register_replay_stream,
    )

    register_replay_stream(spark)
    stream = (
        spark.readStream.format("events_replay")
        .option("path", os.path.join(sf_dir, "events.parquet"))
        .option("rows_per_batch", rows_per_batch)
        .load()
        .select("user_id", "event_type", "value", "ts", "event_id")
    )
    t = AtomicParquetTable(
        spark,
        tempfile.mkdtemp(prefix="atomic_stream_") + "/t",
        keys=["user_id"],
        partition_by=["event_type"],
    )
    handler = streaming_upsert_sink(
        t, [F.col("ts").desc(), F.col("event_id").desc()]
    )
    # Default micro-batch trigger + processAllAvailable, NOT
    # availableNow: the SimpleDataSourceStreamReader wrapper prefetches
    # exactly one batch per start, so availableNow would drain ONE
    # rows_per_batch slice and stop "caught up" — silently committing a
    # prefix (found empirically; the replay-source tests use the same
    # drain pattern). processAllAvailable blocks until every slice has
    # been processed, then the query is stopped.
    q = (
        stream.writeStream.foreachBatch(handler)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="atomic_ckpt_"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    if q.exception() is not None:
        raise RuntimeError(f"streaming upsert failed: {q.exception()}")
    return t
