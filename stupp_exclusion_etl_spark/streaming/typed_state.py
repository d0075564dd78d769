"""Custom stateful operator on transformWithStateInPandas — Spark 4's
typed-state successor to applyInPandasWithState (which
streaming/stateful.py uses): state is declared as named, schema'd
ValueState/ListState/MapState handles instead of one opaque tuple,
enabling independent eviction/TTL per state and schema evolution.

Operator: per-user running event-type histogram in a MapState
(event_type → count), emitting a (user_id, n_events, n_types) snapshot
every micro-batch. The reference anchor is the same per-entity
accumulation its serial loop performs (reference __main__.py:53-66);
the batch-equivalence proof lives in tests/test_streaming_stateful.py.

Scale: state is partitioned by user_id across the cluster (RocksDB
state store, incremental checkpoints); each micro-batch touches only
the keys present in the batch.

Environment note: Spark's transform_with_state_driver_worker speaks a
protobuf protocol to the state server; this container ships no
google.protobuf, so run_user_type_histogram_stream only executes where
protobuf is installed (tests gate on importorskip) — the processor
logic itself is dependency-free and unit-tested with fake state."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

_OUTPUT = "user_id bigint, n_events bigint, n_types bigint"


class UserTypeHistogram(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "type_counts", "event_type string", "cnt bigint"
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        (user_id,) = key
        for pdf in rows:
            for et, c in pdf["event_type"].value_counts().items():
                prev = (
                    self._counts.getValue((et,))
                    if self._counts.containsKey((et,))
                    else None
                )
                base = int(prev[0]) if prev is not None else 0
                self._counts.updateValue((et,), (base + int(c),))
        total = 0
        n_types = 0
        for _k, v in self._counts.iterator():
            total += int(v[0])
            n_types += 1
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [total], "n_types": [n_types]}
        )

    def close(self) -> None:
        # intentionally a no-op: the processor holds no resources
        # outside the engine-managed state store (no files, sockets,
        # or thread pools to release) — the engine still requires the
        # hook to exist (StatefulProcessor ABC)
        pass


def user_type_histogram(ev: DataFrame) -> DataFrame:
    return (
        ev.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserTypeHistogram(),
            outputStructType=_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    )


def run_user_type_histogram_stream(
    spark: SparkSession, sf_dir: str, timeout_sec: int = 120
) -> DataFrame:
    """Run as a real availableNow micro-batch job into a memory sink;
    returns the final per-user snapshot (max n_events row — state is
    monotone). transformWithState requires the RocksDB state store;
    scoped to this run like the shuffle-partition sizing."""
    from stupp_exclusion_etl_spark.streaming.windows import events_stream

    ev = events_stream(spark, sf_dir)
    name = f"typedstate_{uuid.uuid4().hex[:8]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_store = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            user_type_histogram(ev)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(timeout_sec)
        if not finished and q.isActive:
            q.stop()
            raise TimeoutError(
                f"availableNow stream {name} did not finish in {timeout_sec}s "
                "— snapshot would be partial"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if prev_store:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_store
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    snap = spark.table(name)
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    )
    return (
        snap.withColumn("__rn", rn).filter(F.col("__rn") == 1).drop("__rn")
    )
