"""Streaming ingest through the keyed upsert sink (A14 × A15 × B14):
``writeStream.foreachBatch`` applies each micro-batch via
``upsert_parquet`` — the reference's scrape→batch→batch_write_item loop
(reference __main__.py:50-66) as a continuous pipeline. Last-write-wins
across micro-batches lands on the same keep-latest semantics the batch
sink has, and the partitioned path keeps rewrites partition-scoped per
batch."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.sinks.upsert import upsert_parquet


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "id long, status string, version long")
    df.coalesce(1).write.mode("append").parquet(path)


def test_streaming_foreach_batch_upsert(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")

    _write_batch(spark, src, [(1, "pending", 1), (2, "pending", 1)])
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    def sink(batch_df, batch_id):
        upsert_parquet(
            batch_df, target, keys=["id"], order_by=[F.col("version").desc()]
        )

    q = stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        got = {r.id: (r.status, r.version) for r in spark.read.parquet(target).collect()}
        assert got == {1: ("pending", 1), 2: ("pending", 1)}, got

        # micro-batch 2: update key 1, insert key 3 — upsert, not append
        _write_batch(spark, src, [(1, "granted", 2), (3, "pending", 1)])
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            got = {
                r.id: (r.status, r.version)
                for r in spark.read.parquet(target).collect()
            }
            if 3 in got:
                break
            time.sleep(1)
        assert got == {
            1: ("granted", 2),
            2: ("pending", 1),
            3: ("pending", 1),
        }, got

        # a stale replay (version 1 for key 1) must NOT regress the row;
        # key 4 rides along as the batch-processed marker
        _write_batch(spark, src, [(1, "pending", 1), (4, "pending", 1)])
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            got = {
                r.id: (r.status, r.version)
                for r in spark.read.parquet(target).collect()
            }
            if 4 in got:
                break
            time.sleep(1)
        assert got[1] == ("granted", 2), got
    finally:
        q.stop()


def test_incremental_rollup_maintenance_equals_batch(spark, tmp_path):
    """IVM batch-equivalence: fold 4 micro-batches of partial aggregates
    (per event_type sum/count/min/max over hourly slices of events)
    through merge_rollup_parquet; the maintained table must equal the
    direct one-shot aggregation — including avg DERIVED from maintained
    sum/count, the quantity that silently drifts if avgs are merged
    directly (the classic IVM bug this sink's contract forbids)."""
    from stupp_exclusion_etl_spark.catalog import table
    from stupp_exclusion_etl_spark.sinks.upsert import merge_rollup_parquet

    path = str(tmp_path / "rollup")
    ev = table(spark, "/root/testdata/sf0.001", "events").select(
        "event_type", F.col("value").cast("double").alias("value"), "ts"
    )
    ev = ev.withColumn("bucket", F.pmod(F.hour("ts"), F.lit(4)))

    for b in range(4):
        partials = (
            ev.filter(F.col("bucket") == b)
            .groupBy("event_type")
            .agg(
                F.sum("value").alias("sum_value"),
                F.count("*").alias("n"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
        )
        merge_rollup_parquet(
            spark,
            partials,
            path,
            keys=["event_type"],
            measures={
                "sum_value": "sum",
                "n": "sum",
                "min_value": "min",
                "max_value": "max",
            },
        )

    maintained = {
        r.event_type: r.asDict()
        for r in spark.read.parquet(path).collect()
    }
    direct = {
        r.event_type: r.asDict()
        for r in ev.groupBy("event_type")
        .agg(
            F.sum("value").alias("sum_value"),
            F.count("*").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.avg("value").alias("avg_value"),
        )
        .collect()
    }
    assert set(maintained) == set(direct)
    for k, d in direct.items():
        m = maintained[k]
        assert m["n"] == d["n"], k
        assert abs(m["sum_value"] - d["sum_value"]) < 1e-6, k
        assert m["min_value"] == d["min_value"], k
        assert m["max_value"] == d["max_value"], k
        assert abs(m["sum_value"] / m["n"] - d["avg_value"]) < 1e-9, k
