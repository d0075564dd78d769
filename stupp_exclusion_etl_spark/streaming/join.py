"""Stream-stream interval join runner (SURVEY.md §2 B14 × B4).

The click-attribution shape: two event streams joined on a key within
an event-time interval, watermarked on BOTH sides so join state is
evictable — without both watermarks + the interval bound each side
buffers forever, the canonical unbounded-state hazard at 100 TB.
Eviction (a behind-watermark row failing to join) is pinned in
tests/test_streaming_join.py; this module runs the bounded-input
variant whose output equals the batch interval join, so the driver
value-checks a true stream-stream join.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.functions.timeutil import ntz_from_timestamp
from stupp_exclusion_etl_spark.streaming.windows import events_stream


def run_click_attribution_stream(
    spark: SparkSession,
    sf_dir: str,
    window_hours: int = 12,
    timeout_sec: int = 180,
) -> DataFrame:
    """Attribute each click to every view by the same user within the
    preceding ``window_hours``: views ⋈ clicks on user_id with
    ``view_ts <= click_ts <= view_ts + window`` as the interval
    condition. Both sides carry a 1-day watermark, so Spark bounds the
    buffered state per side to watermark + interval reach instead of
    the whole stream. Output timestamps are emitted as NTZ via
    unix-micros arithmetic (timeutil) — never the session-TZ cast."""
    name = f"stream_attrib_{uuid.uuid4().hex[:8]}"
    views = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "1 day")
    )
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 day")
    )
    joined = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {window_hours} HOURS")),
    )
    out = joined.select(
        F.col("v_user").alias("user_id"),
        ntz_from_timestamp(F.col("v_ts")).alias("view_ts"),
        ntz_from_timestamp(F.col("c_ts")).alias("click_ts"),
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
