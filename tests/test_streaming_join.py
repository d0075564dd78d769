"""Stream-stream interval join test (B14): two file streams joined on
a key within an event-time interval, with watermarks on BOTH sides so
join state is evictable — the Structured Streaming shape behind
click-attribution / impression-conversion pipelines. Executed across
real micro-batches and checked against the equivalent batch join, and
state eviction is demonstrated by a too-late right-side row failing to
join.

At 100 TB scale this is the canonical unbounded-state hazard: without
both watermarks + the interval condition, each side buffers forever.
With them, Spark bounds state to [watermark, now] per key — the test's
assertion that a behind-watermark impression produces no join output is
the observable proof of eviction.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F


def _write(spark, path, schema_rows, schema):
    df = spark.createDataFrame(schema_rows, schema)
    df = df.select(F.col(df.columns[0]).cast("timestamp").alias("ts"), *df.columns[1:])
    df.coalesce(1).write.mode("append").parquet(path)


def test_interval_join_matches_batch_and_evicts_state(spark, tmp_path):
    imp_dir = str(tmp_path / "impressions")
    clk_dir = str(tmp_path / "clicks")
    sink = f"ssj_{uuid.uuid4().hex[:8]}"

    _write(
        spark,
        imp_dir,
        [
            ("2026-01-01 10:00:00", 1, "ad_a"),
            ("2026-01-01 10:00:30", 2, "ad_b"),
            ("2026-01-01 10:05:00", 3, "ad_c"),
            ("2026-01-01 10:20:00", 9, "ad_z"),  # advances impression watermark
        ],
        "ts string, user_id long, ad string",
    )
    _write(
        spark,
        clk_dir,
        [
            ("2026-01-01 10:00:45", 1, "landing_1"),  # 45s after imp → joins
            ("2026-01-01 10:03:00", 2, "landing_2"),  # 150s after imp → outside window
            ("2026-01-01 10:05:30", 3, "landing_3"),  # 30s after imp → joins
            ("2026-01-01 10:20:00", 9, "landing_9"),  # advances click watermark
        ],
        "ts string, user_id long, page string",
    )

    imp_schema = spark.read.parquet(imp_dir).schema
    clk_schema = spark.read.parquet(clk_dir).schema
    imps = (
        spark.readStream.schema(imp_schema)
        .parquet(imp_dir)
        .withColumnRenamed("ts", "imp_ts")
        .withWatermark("imp_ts", "10 minutes")
    )
    clks = (
        spark.readStream.schema(clk_schema)
        .parquet(clk_dir)
        .withColumnRenamed("ts", "clk_ts")
        .withWatermark("clk_ts", "10 minutes")
    )
    # Attribution: click within [0s, 60s] after the impression.
    joined = imps.join(
        clks,
        (imps.user_id == clks.user_id)
        & (clks.clk_ts >= imps.imp_ts)
        & (clks.clk_ts <= imps.imp_ts + F.expr("INTERVAL 60 SECONDS")),
        "inner",
    ).select(imps.user_id, "ad", "page", "imp_ts", "clk_ts")

    q = joined.writeStream.format("memory").queryName(sink).outputMode("append").start()
    try:
        q.processAllAvailable()
        got = {(r.user_id, r.ad, r.page) for r in spark.table(sink).collect()}
        assert got == {(1, "ad_a", "landing_1"), (3, "ad_c", "landing_3"), (9, "ad_z", "landing_9")}, got

        # Batch equivalence: the same join as a plain DataFrame join.
        bi = spark.read.parquet(imp_dir).withColumnRenamed("ts", "imp_ts")
        bc = spark.read.parquet(clk_dir).withColumnRenamed("ts", "clk_ts")
        batch = (
            bi.join(
                bc,
                (bi.user_id == bc.user_id)
                & (bc.clk_ts >= bi.imp_ts)
                & (bc.clk_ts <= bi.imp_ts + F.expr("INTERVAL 60 SECONDS")),
                "inner",
            )
            .select(bi.user_id, "ad", "page")
        )
        assert got == {(r.user_id, r.ad, r.page) for r in batch.collect()}

        # State eviction: both watermarks sit at ~10:10 (max 10:20 -
        # 10m). A new click for user 1 at 10:01 is behind the
        # click-side watermark AND targets impression state already
        # evicted — no new join row may appear.
        n_before = spark.table(sink).count()
        _write(
            spark,
            clk_dir,
            [("2026-01-01 10:01:00", 1, "landing_late")],
            "ts string, user_id long, page string",
        )
        q.processAllAvailable()
        late_rows = [
            r for r in spark.table(sink).collect() if r.page == "landing_late"
        ]
        assert late_rows == [], late_rows
        assert spark.table(sink).count() == n_before
    finally:
        q.stop()


def test_interval_left_outer_join_emits_timeouts(spark, tmp_path):
    """Left-outer stream-stream join: impressions with no click inside
    the attribution window are emitted with a NULL click side — but
    only once the watermark proves no qualifying click can still
    arrive (the attribution-timeout pattern)."""
    imp_dir = str(tmp_path / "impressions")
    clk_dir = str(tmp_path / "clicks")
    sink = f"ssjo_{uuid.uuid4().hex[:8]}"

    _write(
        spark,
        imp_dir,
        [
            ("2026-01-01 10:00:00", 1, "ad_a"),   # clicked in-window
            ("2026-01-01 10:00:30", 2, "ad_b"),   # click too late → timeout row
            ("2026-01-01 10:30:00", 9, "ad_z"),   # watermark driver
        ],
        "ts string, user_id long, ad string",
    )
    _write(
        spark,
        clk_dir,
        [
            ("2026-01-01 10:00:45", 1, "landing_1"),
            ("2026-01-01 10:03:00", 2, "landing_2"),   # 150s after imp
            ("2026-01-01 10:30:00", 9, "landing_9"),   # watermark driver
        ],
        "ts string, user_id long, page string",
    )

    imps = (
        spark.readStream.schema(spark.read.parquet(imp_dir).schema)
        .parquet(imp_dir)
        .withColumnRenamed("ts", "imp_ts")
        .withWatermark("imp_ts", "10 minutes")
    )
    clks = (
        spark.readStream.schema(spark.read.parquet(clk_dir).schema)
        .parquet(clk_dir)
        .withColumnRenamed("ts", "clk_ts")
        .withWatermark("clk_ts", "10 minutes")
    )
    joined = imps.join(
        clks,
        (imps.user_id == clks.user_id)
        & (clks.clk_ts >= imps.imp_ts)
        & (clks.clk_ts <= imps.imp_ts + F.expr("INTERVAL 60 SECONDS")),
        "left_outer",
    ).select(imps.user_id, "ad", "page")

    q = joined.writeStream.format("memory").queryName(sink).outputMode("append").start()
    try:
        q.processAllAvailable()
        # Outer results need a watermark advance in a LATER trigger to
        # flush: append an empty-ish batch moving event time forward.
        _write(
            spark,
            imp_dir,
            [("2026-01-01 11:00:00", 99, "ad_tick")],
            "ts string, user_id long, ad string",
        )
        _write(
            spark,
            clk_dir,
            [("2026-01-01 11:00:00", 99, "landing_tick")],
            "ts string, user_id long, page string",
        )
        q.processAllAvailable()
        got = {(r.user_id, r.ad, r.page) for r in spark.table(sink).collect()}
        assert (1, "ad_a", "landing_1") in got, got
        assert (2, "ad_b", None) in got, got           # timeout row, NULL side
        assert (2, "ad_b", "landing_2") not in got, got
    finally:
        q.stop()
