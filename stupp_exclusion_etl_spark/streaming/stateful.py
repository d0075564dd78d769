"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2 B14; north-star custom stateful operators).

`user_activity_state` tracks, per user, arbitrary cross-batch state the
built-in window aggregations cannot express: total events, last-seen
timestamp, and the number of 30-minute-gap sessions. The session count
needs ordered gap detection *continued across micro-batches* — exactly
the applyInPandasWithState niche (the reference's closest analog is its
record-at-a-time buffer loop, reference __main__.py:56-66, which is
also imperative per-key state).

State layout (per user): (n_events long, last_ts_us long, n_sessions
long) — primitives only, so state serialization is cheap and the
operator scales to millions of keys (state lives in the state store,
partitioned by key; each micro-batch touches only keys present in the
batch).

Determinism: events are sorted by (ts, event_id) inside the function,
so the emitted snapshot is reproducible and — on bounded input — equal
to the batch gaps-and-islands SQL, which is how the differential test
checks it (tests/test_streaming_stateful.py).
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, microseconds

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("n_sessions", LongType()),
    ]
)
_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ts", TimestampNTZType()),
        StructField("n_sessions", LongType()),
    ]
)


def _update_user(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n_events, last_ts_us, n_sessions = (
        state.get if state.exists else (0, None, 0)
    )
    import numpy as np

    batch = pd.concat(list(pdfs))
    batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
    # Explicit ns normalization: Arrow may deliver datetime64[us] (not
    # always [ns]); a bare astype(int64) would then yield milliseconds
    # and corrupt every GAP_US comparison.
    ts_us = (
        batch["ts"].astype("datetime64[ns]").astype("int64") // 1000
    ).to_numpy()  # µs epoch
    if len(ts_us):
        # vectorized gap detection; the state's last_ts seeds the first
        # gap (None → always a new session)
        seed = last_ts_us if last_ts_us is not None else -(1 << 62)
        prev = np.concatenate(([seed], ts_us[:-1]))
        n_sessions += int((ts_us - prev > GAP_US).sum())
        n_events += len(ts_us)
        last_ts_us = int(ts_us[-1])
    state.update((n_events, last_ts_us, n_sessions))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "last_ts": [pd.Timestamp(last_ts_us, unit="us")],
            "n_sessions": [n_sessions],
        }
    )


def user_activity_state(ev: DataFrame) -> DataFrame:
    """Apply the stateful per-user sessionizer to a (streaming)
    events DataFrame with columns (user_id, ts, event_id). Emits one
    snapshot row per user per micro-batch (update semantics)."""
    return ev.select("user_id", "ts", "event_id").groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_user_activity_stream(
    spark: SparkSession, sf_dir: str, timeout_sec: int = 120
) -> DataFrame:
    """Run the stateful operator as a real micro-batch streaming job
    (availableNow → memory sink) over the bounded events table and
    return the final per-user snapshot (latest row per user)."""
    from stupp_exclusion_etl_spark.streaming.windows import events_stream

    # NTZ timestamps for the stateful operator, built arithmetically
    # (unix_micros) — the cast-to-NTZ route depends on the session
    # timezone and the driver's vanilla session is not UTC-pinned.
    from stupp_exclusion_etl_spark.functions.timeutil import ntz_from_timestamp

    ev = events_stream(spark, sf_dir).withColumn("ts", ntz_from_timestamp(F.col("ts")))
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    # State-store partition count is frozen from shuffle partitions at
    # checkpoint creation; a vanilla session's 200 means 200 state
    # tasks per micro-batch. Scope a parallelism-sized value to this
    # run (restored after) — on a cluster, size it to executor count.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )
    try:
        q = (
            user_activity_state(ev)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    snap = spark.table(name)
    # Multiple micro-batches emit multiple snapshots per user; the
    # per-user maximum n_events row is the final one (monotone state).
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        snap.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
