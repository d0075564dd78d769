"""Differential test for the applyInPandasWithState operator: on
bounded input the final snapshot must equal the batch gaps-and-islands
computation — cross-batch state correctness reduces to this plus the
state continuation logic (seeded first-gap check), which is unit-tested
directly on the pandas function."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.functions.metrics import observed_counts
from stupp_exclusion_etl_spark.streaming.stateful import (
    _update_user,
    run_user_activity_stream,
)
from tests.conftest import SF_SMALL


def test_stateful_stream_equals_batch(spark):
    got = {
        r.user_id: (r.n_events, r.last_ts, r.n_sessions)
        for r in run_user_activity_stream(spark, SF_SMALL).collect()
    }
    ev = table(spark, SF_SMALL, "events")
    lag = F.lag("ts").over(W.partitionBy("user_id").orderBy("ts", "event_id"))
    want = {
        r.user_id: (r.n_events, r.last_ts, r.n_sessions)
        for r in (
            ev.withColumn(
                "brk",
                F.when(
                    lag.isNull()
                    | (F.col("ts") - lag > F.expr("INTERVAL 30 MINUTES")),
                    1,
                ).otherwise(0),
            )
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.max("ts").alias("last_ts"),
                F.sum("brk").alias("n_sessions"),
            )
            .collect()
        )
    }
    assert got == want


class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self.exists = True
        self._v = v


def _pdf(ts_minutes):
    return pd.DataFrame(
        {
            "user_id": [1] * len(ts_minutes),
            "ts": pd.to_datetime([f"2026-01-01 00:{m:02d}:00" for m in ts_minutes]),
            "event_id": list(range(len(ts_minutes))),
        }
    )


def test_state_continues_across_batches():
    st = _FakeState()
    # batch 1: two events 5 min apart → 1 session
    list(_update_user((1,), iter([_pdf([0, 5])]), st))
    assert st.get[0] == 2 and st.get[2] == 1
    # batch 2: 31+ min after last → new session; then close event
    out = list(_update_user((1,), iter([_pdf([37, 40])]), st))
    assert st.get[0] == 4 and st.get[2] == 2
    assert out[0]["n_sessions"].iloc[0] == 2


def test_observed_counts_no_extra_job(spark):
    df = table(spark, SF_SMALL, "orders")
    observed, obs = observed_counts(df, "orders_load", value_col="o_totalprice")
    n = observed.count()
    metrics = obs.get
    assert metrics["n_rows"] == n
    assert metrics["nulls_o_totalprice"] == 0
    assert metrics["sum_o_totalprice"] > 0


def test_rate_source_tumbling_stream(spark):
    """True unbounded-source smoke: the same tumbling window expression
    over the built-in rate source (not a bounded file) produces windowed
    counts under a processing-time trigger — the shape a Kafka-style
    deployment runs."""
    import uuid

    from stupp_exclusion_etl_spark.streaming.windows import tumbling_agg

    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 200).load()
        .withColumnRenamed("timestamp", "ts")
        .withColumn("event_type", (F.col("value") % 3).cast("string"))
    )
    agg = tumbling_agg(rate, minutes=1, watermark="0 seconds")
    name = f"rate_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
    )
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table(name).count() > 0:
                break
            time.sleep(1)
        rows = spark.table(name).collect()
        assert rows, "rate-source stream produced no windows in 30s"
        assert all(r.n > 0 for r in rows)
    finally:
        q.stop()


def test_transform_with_state_equals_batch(spark):
    """transformWithStateInPandas (typed MapState) batch-equivalence:
    the final per-user snapshot of the running event-type histogram
    must equal the one-shot groupBy count / count_distinct — cross-
    micro-batch MapState accumulation included.

    Spark's transform_with_state_driver_worker imports google.protobuf
    (its state-server protocol); this container doesn't ship it, so the
    execution path is gated — the unit test below covers the processor
    logic itself either way."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState python worker needs protobuf (not in container)",
    )
    from stupp_exclusion_etl_spark.streaming.typed_state import (
        run_user_type_histogram_stream,
    )

    got = {
        r.user_id: (r.n_events, r.n_types)
        for r in run_user_type_histogram_stream(spark, SF_SMALL).collect()
    }
    ev = table(spark, SF_SMALL, "events")
    want = {
        r.user_id: (r.n_events, r.n_types)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("event_type").alias("n_types"),
        )
        .collect()
    }
    assert got == want


class _FakeMapState:
    def __init__(self):
        self._d = {}

    def containsKey(self, k):
        return k in self._d

    def getValue(self, k):
        return self._d[k]

    def updateValue(self, k, v):
        self._d[k] = v

    def iterator(self):
        return iter(self._d.items())


class _FakeHandle:
    def __init__(self):
        self.map_state = _FakeMapState()

    def getMapState(self, name, key_schema, value_schema, ttlDurationMs=None):
        return self.map_state


def test_user_type_histogram_processor_logic():
    """Processor-level unit test (no streaming runtime needed): feeding
    two micro-batches through UserTypeHistogram must accumulate the
    MapState across batches and snapshot correct totals."""
    from stupp_exclusion_etl_spark.streaming.typed_state import UserTypeHistogram

    p = UserTypeHistogram()
    p.init(_FakeHandle())
    b1 = pd.DataFrame({"event_type": ["view", "view", "click"]})
    b2 = pd.DataFrame({"event_type": ["click", "buy"]})
    out1 = list(p.handleInputRows((7,), iter([b1]), None))[0]
    assert (out1.n_events[0], out1.n_types[0]) == (3, 2)
    out2 = list(p.handleInputRows((7,), iter([b2]), None))[0]
    assert (out2.n_events[0], out2.n_types[0]) == (5, 3)
