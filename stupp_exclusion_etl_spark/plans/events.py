"""Event-stream plans (SURVEY.md §2 B14 + as-of join).

Batch-mode window()/session_window() aggregations are oracle-testable;
the true Structured Streaming variants (watermark, foreachBatch) live
in streaming/ and are exercised by `stream_tumbling_micro_batch`
(rows-only) and unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.plans._shared import r4
from stupp_exclusion_etl_spark.plans.registry import register

# window start for a tumbling window of `sec` seconds, as DuckDB SQL.
# Floored modulo in pure INT64 — two wrongness classes ruled out:
# DuckDB's `//` truncates toward zero (pre-1970 timestamps bucketed one
# window late; extreme-timestamp sweep finding), and a float-division
# floor() loses exactness once epoch_us exceeds 2^53 (~year 2255; code
# review r3). epoch_us - ((epoch_us % m) + m) % m is the floored
# multiple for any int64, negative or huge ( % follows the dividend's
# sign in DuckDB, the +m %m normalizes it ).
_BUCKET = (
    "make_timestamp(epoch_us(ts)"
    " - ((epoch_us(ts) % ({sec} * 1000000)) + ({sec} * 1000000))"
    " % ({sec} * 1000000))"
)


@register(
    "events_tumbling_window",
    oracle=f"""
    SELECT {_BUCKET.format(sec=600)} AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("B14", "A14"),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute window aggregation — batch-mode window();
    identical grouping runs under Structured Streaming with a watermark
    (streaming.windows.tumbling_agg)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), r4(F.sum("value")).alias("sum_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "events_sliding_window",
    oracle=f"""
    WITH assigned AS (
      SELECT {_BUCKET.format(sec=300)} AS w1, value FROM events
    ), expanded AS (
      SELECT w1 AS window_start, value FROM assigned
      UNION ALL
      SELECT w1 - INTERVAL 5 MINUTE, value FROM assigned
    )
    SELECT window_start, CAST(count(*) AS BIGINT) AS n, ROUND(SUM(value), 4) AS sum_value
    FROM expanded GROUP BY 1
    """,
    tags=("B14",),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 min length, 5 min slide): each event lands in
    exactly 2 windows; window() expands rows plan-side, no UDF."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), r4(F.sum("value")).alias("sum_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "n",
            "sum_value",
        )
    )


@register(
    "events_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM sessions GROUP BY user_id, session_id
    """,
    tags=("B14",),
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap via session_window() —
    Spark merges events whose gaps are < 30 min; the oracle reproduces
    it with the gaps-and-islands window idiom."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), r4(F.sum("value")).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
    clicks AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts,
           c.ts AS right_ts, ROUND(c.value, 4) AS right_value
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("B4", "B14"),
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators.joins.asof_join): for every purchase, the
    most recent prior click by the same user — union + carry-forward
    window, one shuffle, no per-row subquery."""
    from stupp_exclusion_etl_spark.operators.joins import asof_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value")
    )
    out = asof_join(purchases, clicks, on="user_id", right_cols=["ts", "value"])
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("right_ts"),
        F.round("right_value", 4).alias("right_value"),
    )


@register(
    "stream_tumbling_micro_batch",
    # Full oracle (VERDICT r3 next-1): the stream is drained to
    # completion (availableNow) and the SINK'S END STATE is the query
    # output — on a bounded input it must equal the batch window()
    # aggregation bit-for-bit, so the streaming family's exactly-once
    # claim gets a hash-level proof instead of a rows-only count.
    oracle=f"""
    SELECT {_BUCKET.format(sec=600)} AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("B14", "A14"),
)
def stream_tumbling_micro_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling aggregation executed as a REAL micro-batch
    Structured Streaming job (readStream → watermark → window agg →
    availableNow trigger → memory sink), value-checked against the same
    DuckDB oracle as events_tumbling_window: complete-mode end state ==
    batch aggregation on bounded input."""
    from stupp_exclusion_etl_spark.streaming.windows import run_tumbling_stream

    return run_tumbling_stream(spark, sf_dir)


@register(
    "events_micro_batch_counts",
    oracle="""
    SELECT CAST(event_id // 20 AS BIGINT) AS batch_id,
           CAST(count(*) AS BIGINT) AS batch_size
    FROM events GROUP BY 1
    """,
    tags=("A14",),
)
def events_micro_batch_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 20-record sink batching (A14,
    reference __main__.py:61-66) as a deterministic batch assignment;
    sinks.batched.micro_batches does the physical per-partition
    chunking for real sinks."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy((F.col("event_id") / 20).cast("long").alias("batch_id"))
        .agg(F.count(F.lit(1)).alias("batch_size"))
    )


@register(
    "stream_stateful_user_sessions",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes' OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           max(ts) AS last_ts,
           CAST(sum(brk) AS BIGINT) AS n_sessions
    FROM d GROUP BY user_id
    """,
    tags=("B14", "B15"),
)
def stream_stateful_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState,
    streaming.stateful.user_activity_state): per-user event totals,
    last-seen timestamp, and 30-minute-gap session counts, with the
    gap state carried ACROSS micro-batches — not expressible with
    built-in window aggs. Runs as a real availableNow micro-batch job;
    on the bounded events table the final snapshot equals the batch
    gaps-and-islands SQL, so even this operator is value-checked."""
    from stupp_exclusion_etl_spark.streaming.stateful import (
        run_user_activity_stream,
    )

    return run_user_activity_stream(spark, sf_dir)


@register(
    "events_late_arrival_audit",
    oracle="""
    WITH marked AS (
      SELECT event_type, ts,
             MAX(ts) OVER (PARTITION BY event_type ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS high_water
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (WHERE ts < high_water - INTERVAL 5 MINUTE)
                AS BIGINT) AS n_late,
           ROUND(CAST(count(*) FILTER (WHERE ts < high_water - INTERVAL 5 MINUTE)
                      AS DOUBLE) / count(*), 6) AS late_ratio
    FROM marked GROUP BY event_type
    """,
    tags=("B14",),
)
def events_late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark dry-run: per stream (event_type), how many events
    arrive (by event_id order) more than 5 minutes behind the stream's
    running max event time — exactly the rows a Structured Streaming
    watermark of 5 minutes would drop (the live drop is proven in
    tests/test_streaming_watermark.py; this batch audit is how you pick
    the delay BEFORE deploying the stream). The running max partitions
    by stream key, so the window shuffles by event_type — no global
    single-reducer ordering."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    late = F.col("ts") < F.col("high_water") - F.expr("INTERVAL 5 MINUTES")
    return (
        ev.withColumn("high_water", F.max("ts").over(w))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_if(late).alias("n_late"),
            F.round(F.count_if(late).cast("double") / F.count(F.lit(1)), 6).alias(
                "late_ratio"
            ),
        )
    )


@register(
    "events_funnel",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t0 FROM events
               WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, MIN(ts) AS t1 FROM events e JOIN v USING (user_id)
          WHERE event_type = 'click' AND ts > v.t0 GROUP BY 1),
    p AS (SELECT e.user_id, MIN(ts) AS t2 FROM events e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND ts > c.t1 GROUP BY 1)
    SELECT 1 AS stage, 'view' AS step, CAST(count(*) AS BIGINT) AS n_users FROM v
    UNION ALL
    SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM c
    UNION ALL
    SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM p
    """,
    tags=("B14", "B4", "B5"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: each stage is
    a per-user MIN(ts) aggregate semi-joined to the previous stage with
    a strict temporal predicate — all equi-joins on user_id (one
    shuffle key reused across stages; at scale, bucketing events by
    user_id makes the whole funnel co-located), never a window over the
    raw stream."""
    ev = table(spark, sf_dir, "events")

    def stage_times(etype: str, prev: DataFrame | None, prev_t: str, t: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(prev_t))
        return e.groupBy("user_id").agg(F.min("ts").alias(t))

    v = stage_times("view", None, "", "t0")
    c = stage_times("click", v, "t0", "t1")
    p = stage_times("purchase", c, "t1", "t2")
    counts = [
        (1, "view", v), (2, "click", c), (3, "purchase", p),
    ]
    out = None
    for stage, step, df in counts:
        row = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(stage).alias("stage"), F.lit(step).alias("step"), "n_users"
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "events_time_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY ROLLUP (day, hour)
    """,
    tags=("B14", "B5"),
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical time rollup: one pass produces
    hour-level, day-level, and grand-total aggregates via ROLLUP on
    truncated timestamps — the continuous-aggregate pattern
    (TimescaleDB rollups / Druid hierarchies) as a single Catalyst
    rollup; partial aggregation happens map-side at every level."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"),
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour"),
            "value",
        )
        .rollup("day", "hour")
        .agg(F.count(F.lit(1)).alias("n"), r4(F.sum("value")).alias("sum_value"))
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH weeks AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
      FROM events),
    cohort AS (
      SELECT user_id, min(w) AS cw FROM weeks GROUP BY user_id)
    SELECT CAST(cohort.cw AS VARCHAR) AS cohort_week,
           CAST(date_diff('day', cohort.cw, weeks.w) // 7 AS BIGINT) AS week_no,
           CAST(count(DISTINCT weeks.user_id) AS BIGINT) AS n_users
    FROM weeks JOIN cohort USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("B14", "B5"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active week, counted in
    each subsequent week they return — the standard product-analytics
    rollup. Two aggregations over the deduped (user, week) activity set
    plus one equi-join on user_id; the cohort table is user-cardinality
    and the final matrix is weeks² — tiny at any event volume."""
    ev = table(spark, sf_dir, "events")
    weeks = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
    ).distinct()
    cohort = weeks.groupBy("user_id").agg(F.min("w").alias("cw"))
    return (
        weeks.join(cohort, "user_id")
        .select(
            F.col("cw").cast("string").alias("cohort_week"),
            (F.datediff("w", "cw") / 7).cast("long").alias("week_no"),
            "user_id",
        )
        .groupBy("cohort_week", "week_no")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "events_value_histogram",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(value / 25) AS BIGINT) AS bin,
           CAST(FLOOR(value / 25) * 25 AS DOUBLE) AS bin_lo,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("B5", "B14"),
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width numeric binning (width_bucket semantics) of the
    event value per event type — the profiling histogram every data
    audit starts with. Pure arithmetic bin key → one partial-agg
    shuffle on (type, bin); bin count is bounded by the value domain,
    not the row count, so the rollup is tiny at any scale."""
    ev = table(spark, sf_dir, "events")
    b = F.floor(F.col("value") / 25).cast("long")
    return (
        ev.groupBy(
            "event_type",
            b.alias("bin"),
            (b * 25).cast("double").alias("bin_lo"),
        )
        .agg(F.count(F.lit(1)).alias("n"), r4(F.sum("value")).alias("sum_value"))
    )


@register(
    "events_interpolate",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
      FROM events),
    w AS (
      SELECT event_id, user_id, ts, v,
             last_value(v IGNORE NULLS) OVER pw AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
               OVER pw AS pt,
             first_value(v IGNORE NULLS) OVER nw AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
               OVER nw AS nt
      FROM e
      WINDOW pw AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             nw AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
    SELECT event_id, user_id,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt > pt THEN
               pv + (nv - pv) * (CAST(date_diff('microsecond', pt, ts) AS DOUBLE)
                                 / CAST(date_diff('microsecond', pt, nt) AS DOUBLE))
             WHEN pv IS NOT NULL THEN pv
             ELSE nv END, 6) AS v_interp
    FROM w
    """,
    tags=("B6", "B14"),
)
def events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear time-interpolation of missing measurements per user
    timeline: each null gets the time-weighted blend of its nearest
    non-null neighbors (edges hold/backfill) — the time-series repair
    step downstream of gap detection (complements win_gap_fill's
    forward-fill). Nulls injected deterministically as in win_gap_fill.
    One shuffle on user_id; both window frames share the sort. The
    time fraction is integer-µs arithmetic cast to double at the end,
    so both engines compute the identical IEEE expression."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", F.lit(None))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    d = e.select(
        "event_id",
        "user_id",
        "ts",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(F.when(F.col("v").isNotNull(), F.col("ts")), ignorenulls=True)
        .over(wp)
        .alias("pt"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(F.when(F.col("v").isNotNull(), F.col("ts")), ignorenulls=True)
        .over(wn)
        .alias("nt"),
    )
    num = F.expr("timestampdiff(MICROSECOND, pt, ts)").cast("double")
    den = F.expr("timestampdiff(MICROSECOND, pt, nt)").cast("double")
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
            & (F.col("nt") > F.col("pt")),
            F.col("pv") + (F.col("nv") - F.col("pv")) * (num / den),
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    return d.select("event_id", "user_id", F.round(interp, 6).alias("v_interp"))


@register(
    "events_outlier_iqr",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(round(quantile_cont(value, 0.25) * 10000) AS BIGINT) AS q1i,
             CAST(round(quantile_cont(value, 0.75) * 10000) AS BIGINT) AS q3i
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN e.value < (5 * b.q1i - 3 * b.q3i) / 20000.0
                           OR e.value > (5 * b.q3i - 3 * b.q1i) / 20000.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           (5 * b.q1i - 3 * b.q3i) / 20000.0 AS lo,
           (5 * b.q3i - 3 * b.q1i) / 20000.0 AS hi
    FROM events e JOIN b USING (event_type)
    GROUP BY e.event_type, b.q1i, b.q3i
    """,
    tags=("B5", "B3"),
)
def events_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR outlier audit per event type: exact interpolated quartiles,
    Tukey fences q1/q3 ± 1.5·IQR, per-type outlier counts. The fences
    table is event-type-sized — broadcast back onto the stream, so the
    fact table is scanned twice but shuffled once (the tiny per-type
    agg). Cross-engine exactness: quartiles land on a 0.0025 grid (2dp
    inputs), so they're snapped to 1e-4-scaled INTEGERS and the fences
    lo = (5·q1 - 3·q3)/2, hi = (5·q3 - 3·q1)/2 are derived in integer
    arithmetic — both engines compare against bit-identical doubles,
    immune to round-half boundary disagreements."""
    e = table(spark, sf_dir, "events")
    b = e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.25)) * 10000).cast("long").alias("q1i"),
        F.round(F.percentile("value", F.lit(0.75)) * 10000).cast("long").alias("q3i"),
    )
    lo = (5 * F.col("q1i") - 3 * F.col("q3i")) / 20000.0
    hi = (5 * F.col("q3i") - 3 * F.col("q1i")) / 20000.0
    return (
        e.join(F.broadcast(b), "event_type")
        .groupBy("event_type", "q1i", "q3i")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when((F.col("value") < lo) | (F.col("value") > hi), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .select("event_type", "n", "n_outliers", lo.alias("lo"), hi.alias("hi"))
    )


@register(
    "events_time_weighted_avg",
    oracle="""
    WITH o AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS vc, ts,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events WHERE user_id < 100),
    s AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_holds,
             SUM(vc * ((epoch_us(nxt) - epoch_us(ts)) // 1000)) AS num,
             SUM((epoch_us(nxt) - epoch_us(ts)) // 1000) AS den
      FROM o WHERE nxt IS NOT NULL AND nxt > ts
      GROUP BY user_id)
    SELECT user_id, n_holds,
           ((200 * num + den) // (2 * den)) / 10000.0 AS twap
    FROM s
    """,
    tags=("B6", "B5"),
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each event's value
    is held until the next event, weighted by hold duration in
    whole milliseconds. One window pass (lead over the user×time
    ordering) feeding one agg on the same key — the plan reuses the
    user_id partitioning, single shuffle. Durations are exact integer
    microsecond diffs floored to ms (timestampdiff(MICROSECOND) on the
    NTZ column is pure calendar arithmetic, session-TZ-independent;
    second-granularity units would diverge — Spark truncates elapsed
    time, DuckDB counts boundary crossings). Cross-engine
    exactness: 2dp values become integer cents, so num/den are exact
    longs and the 4dp half-up rounding is the INTEGER identity
    (200·num + den) div (2·den) — no float accumulation anywhere."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
        "ts",
        F.lead("ts").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull() & (F.col("nxt") > F.col("ts")))
    dt = F.expr("timestampdiff(MICROSECOND, ts, nxt) div 1000")
    s = o.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_holds"),
        F.sum(F.col("vc") * dt).alias("num"),
        F.sum(dt).alias("den"),
    )
    return s.select(
        "user_id",
        "n_holds",
        (
            F.expr("(200 * num + den) div (2 * den)") / 10000.0
        ).alias("twap"),
    )


@register(
    "events_rolling_zscore",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, value,
             CAST(round(value * 100) AS BIGINT) AS vc,
             SUM(CAST(round(value * 100) AS BIGINT))
               OVER win AS s1,
             SUM(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT))
               OVER win AS s2,
             CAST(count(*) OVER win AS BIGINT) AS n
      FROM events WHERE user_id < 100
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id,
           ROUND((vc * n - s1) /
                 (sqrt(CAST(n AS DOUBLE) * (s2 * n - s1 * s1))), 4) + 0.0 AS z
    FROM w WHERE n >= 10 AND s2 * n > s1 * s1
    """,
    tags=("B6", "B5"),
)
def events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling anomaly score: each event's z-score against its own
    trailing 20-event window per user — the standard streaming-metrics
    anomaly primitive, expressed as one window pass (sum, sum-of-
    squares, count share a single frame, so Spark sorts each user
    partition once). Cross-engine exactness: 2dp values become integer
    cents, the window moments s1=Σv, s2=Σv² stay exact in int64
    (≤ ~5·10¹⁰ per 20-row frame), and
    z = (v·n − s1) / sqrt(n·(n·s2 − s1²)) is algebraically the sample
    z-score scaled so every input to the one float op (sqrt) is an
    exact integer — both engines produce bit-identical doubles.
    Windows with <10 points or zero variance are excluded."""
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    vc = F.round(F.col("value") * 100).cast("long")
    win = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-19, 0)
    )
    w = e.select(
        "event_id",
        "user_id",
        vc.alias("vc"),
        F.sum(vc).over(win).alias("s1"),
        F.sum(vc * vc).over(win).alias("s2"),
        F.count(F.lit(1)).over(win).alias("n"),
    )
    num = F.col("vc") * F.col("n") - F.col("s1")
    var_scaled = F.col("s2") * F.col("n") - F.col("s1") * F.col("s1")
    return (
        w.filter((F.col("n") >= 10) & (var_scaled > 0))
        .select(
            "event_id",
            "user_id",
            # + 0.0 normalizes IEEE negative zero (DuckDB's ROUND
            # keeps -0.0; Spark's doesn't) so canonical strings agree.
            (
                F.round(num / F.sqrt(F.col("n").cast("double") * var_scaled), 4)
                + F.lit(0.0)
            ).alias("z"),
        )
    )


@register(
    "stream_dedup_replay",
    oracle="SELECT event_id, user_id, event_type FROM events",
    tags=("B9", "B14"),
)
def stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup under at-least-once delivery: the events
    stream self-unioned (every event delivered twice) then collapsed by
    dropDuplicatesWithinWatermark in a REAL micro-batch job
    (streaming.dedup.run_dedup_stream). On the bounded table the
    output equals batch DISTINCT, so the streaming dedup operator is
    fully value-checked; the bounded-state eviction semantics are
    pinned separately in tests/test_streaming_dedup.py."""
    from stupp_exclusion_etl_spark.streaming.dedup import run_dedup_stream

    return run_dedup_stream(spark, sf_dir)


@register(
    "stream_click_attribution",
    oracle="""
    SELECT v.user_id, v.ts AS view_ts, c.ts AS click_ts
    FROM events v
    JOIN events c
      ON v.user_id = c.user_id
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 12 HOUR
    WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
    tags=("B4", "B14"),
)
def stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join as a real micro-batch job
    (streaming.join.run_click_attribution_stream): clicks attributed to
    same-user views within 12 hours, watermarked on both sides so join
    state evicts instead of buffering the stream. Bounded input makes
    the output equal the batch interval join — a value-checked
    stream-stream join in the driver's hard signal."""
    from stupp_exclusion_etl_spark.streaming.join import (
        run_click_attribution_stream,
    )

    return run_click_attribution_stream(spark, sf_dir)


@register(
    "cdc_user_state_diff",
    oracle="""
    WITH s1 AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-10') WHERE rn = 1),
    s2 AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-20') WHERE rn = 1)
    SELECT COALESCE(s2.user_id, s1.user_id) AS user_id,
           CASE WHEN s1.user_id IS NULL THEN 'insert'
                WHEN s2.user_id IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           s1.event_type AS old_type, s2.event_type AS new_type,
           ROUND(s1.value, 4) AS old_value, ROUND(s2.value, 4) AS new_value
    FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
    WHERE s1.user_id IS NULL OR s2.user_id IS NULL
       OR s1.event_type IS DISTINCT FROM s2.event_type
       OR s1.value IS DISTINCT FROM s2.value
    """,
    tags=("B4", "B6", "B9"),
)
def cdc_user_state_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC / changes-feed derivation without a table format: latest
    per-user state at two snapshot cutoffs (keep-latest window, the
    reference's A15 upsert semantics), full-outer joined into an
    insert/update/delete op stream — what a downstream consumer would
    apply to stay in sync. Null-safe DISTINCT FROM comparisons drop
    unchanged keys. Scale: both snapshots shuffle once on user_id and
    the join reuses that partitioning; state never materializes more
    than 2 rows per key."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def snap(cutoff: str) -> DataFrame:
        return (
            ev.filter(F.col("ts") < F.lit(cutoff).cast("timestamp_ntz"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_type", "value")
        )

    s1 = snap("2024-01-10").alias("s1")
    s2 = snap("2024-01-20").alias("s2")
    changed = (
        ~F.col("s1.event_type").eqNullSafe(F.col("s2.event_type"))
    ) | (~F.col("s1.value").eqNullSafe(F.col("s2.value")))
    return (
        s1.join(s2, F.col("s1.user_id") == F.col("s2.user_id"), "full_outer")
        .filter(
            F.col("s1.user_id").isNull() | F.col("s2.user_id").isNull() | changed
        )
        .select(
            F.coalesce(F.col("s2.user_id"), F.col("s1.user_id")).alias("user_id"),
            F.when(F.col("s1.user_id").isNull(), "insert")
            .when(F.col("s2.user_id").isNull(), "delete")
            .otherwise("update")
            .alias("op"),
            F.col("s1.event_type").alias("old_type"),
            F.col("s2.event_type").alias("new_type"),
            F.round(F.col("s1.value"), 4).alias("old_value"),
            F.round(F.col("s2.value"), 4).alias("new_value"),
        )
    )


# 8-tap EWMA weights: alpha=1/2, so 0.5^(j+1) is an exact power of two
# in BOTH engines — weighted terms are exact halvings of the input and
# cross-engine parity needs no tolerance.
_EWMA_TAPS = 8
_EWMA_W = [0.5 ** (j + 1) for j in range(_EWMA_TAPS)]


def _ewma_exprs() -> tuple[str, str]:
    num = " + ".join(
        f"coalesce({_EWMA_W[j]!r} * l{j}, 0.0)" for j in range(_EWMA_TAPS)
    )
    den = " + ".join(
        f"(CASE WHEN l{j} IS NOT NULL THEN {_EWMA_W[j]!r} ELSE 0.0 END)"
        for j in range(_EWMA_TAPS)
    )
    return num, den


@register(
    "events_ewma",
    oracle=f"""
    WITH s AS (
      SELECT event_id,
             CAST(value AS DOUBLE) AS l0,
             {", ".join(f"lag(CAST(value AS DOUBLE), {j}) OVER w AS l{j}" for j in range(1, _EWMA_TAPS))}
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
    SELECT event_id,
           ROUND(({_ewma_exprs()[0]}) / ({_ewma_exprs()[1]}), 6) AS ewma
    FROM s
    """,
    tags=("B6", "B14"),
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finite-horizon EWMA smoother (8 taps, α=1/2) per event-type
    series: the recursive filter unrolled into lag() taps with
    partial-window renormalization, so the first rows of each series
    are correctly weighted rather than biased toward zero. Pure window
    functions — one shuffle on the series key; weights are powers of
    two so every weighted term is an exact halving (bit-identical
    across engines by construction)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ev = table(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    s = ev.select(
        "event_id",
        v.alias("l0"),
        *[F.lag(v, j).over(w).alias(f"l{j}") for j in range(1, _EWMA_TAPS)],
    )
    num, den = _ewma_exprs()
    # try_divide: den is 0.0 when value and all 7 lags are NULL in a
    # series — ANSI mode would kill the query on plain '/' while the
    # DuckDB oracle yields NULL for 0/0 (repo-wide try_divide policy).
    return s.selectExpr("event_id", f"round(try_divide(({num}), ({den})), 6) AS ewma")


@register(
    "stream_atomic_upsert",
    # Full oracle: the stream is drained (availableNow, offset-tracked
    # replay source slicing it into many micro-batches) and the ATOMIC
    # TABLE'S committed end state is the output — on bounded input it
    # must equal keep-latest-per-user in plain SQL, independent of how
    # the batches were cut, proving the streaming MERGE + manifest
    # commit + cross-batch partition moves end to end.
    oracle="""
    WITH latest AS (
      SELECT user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_users,
           ROUND(SUM(value), 4) AS sum_last_value
    FROM latest WHERE rn = 1
    GROUP BY event_type
    """,
    tags=("B14", "A14", "A15"),
)
def stream_atomic_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once MERGE into the atomic manifest table
    (streaming.windows.run_atomic_upsert_stream): the events replay
    stream is drained micro-batch by micro-batch through foreachBatch,
    each batch an atomically-published last-write-wins upsert keyed by
    user_id and partitioned by event_type (so users move partitions as
    their latest event changes). The end state — per-event-type user
    counts and summed latest values read back THROUGH the manifest —
    is value-checked against the batch keep-latest SQL."""
    from stupp_exclusion_etl_spark.streaming.windows import (
        run_atomic_upsert_stream,
    )

    t = run_atomic_upsert_stream(spark, sf_dir)
    return (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            r4(F.sum("value")).alias("sum_last_value"),
        )
    )


@register(
    "stream_atomic_changes",
    # Full oracle: the stream subscribes at the base version and
    # availableNow drains everything up to the final commit in one
    # offset range, so the received rows ARE the net v0->head feed —
    # the same batch algebra as atomic_changes_read, but served by the
    # REGISTERED streaming connector (partition-planned
    # DataSourceStreamReader: the driver only plans key-range-disjoint
    # file groups from manifest stats; rows are read and diffed inside
    # Spark tasks).
    oracle="""
    WITH b1 AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 10 < 6),
    b2 AS (
      SELECT o_orderkey, ROUND(o_totalprice * 1.1, 4) AS o_totalprice,
             o_orderpriority
      FROM orders WHERE o_orderkey % 10 BETWEEN 4 AND 8),
    final AS (
      SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS k,
             COALESCE(n.o_totalprice, o.o_totalprice) AS p
      FROM b1 o FULL JOIN b2 n ON n.o_orderkey = o.o_orderkey),
    kept AS (SELECT * FROM final WHERE k % 7 <> 0),
    feed AS (
      SELECT k, p, 'insert' AS ct FROM kept
      WHERE k NOT IN (SELECT o_orderkey FROM b1)
      UNION ALL
      SELECT o_orderkey, o_totalprice, 'delete' FROM b1
      WHERE o_orderkey NOT IN (SELECT k FROM kept)
      UNION ALL
      SELECT f.k, f.p, 'update' FROM kept f
      JOIN b1 o ON o.o_orderkey = f.k
      JOIN b2 n ON n.o_orderkey = f.k)
    SELECT ct AS change_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           ROUND(SUM(p), 2) AS total
    FROM feed GROUP BY ct
    """,
    tags=("B14", "A14", "C16"),
)
def stream_atomic_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC consumption THROUGH the registered
    ``atomic_changes`` connector (sources/changes_stream.py, r8
    partition-planned reader): base orders batch, an overlapping
    re-priced upsert, a keyed delete — then a ``readStream`` from the
    base version drained with availableNow into a parquet sink, and
    the RECEIVED change rows aggregated by type. Proves the whole
    streaming path the driver can see: offset planning from manifest
    versions, key-range-disjoint partition planning from per-file
    stats, executor-side file diffs, and the exactly-once drain —
    value-equal to the pure batch feed algebra. Money sums rounded to
    2 (same convention as atomic_changes_read)."""
    import tempfile

    from stupp_exclusion_etl_spark.sinks.atomic import AtomicParquetTable
    from stupp_exclusion_etl_spark.sources.changes_stream import (
        register_changes_stream,
    )

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    k = F.col("o_orderkey")
    root = tempfile.mkdtemp(prefix="atomic_cs_")
    t = AtomicParquetTable(
        spark,
        root + "/t",
        keys=["o_orderkey"],
        cluster_by=["o_orderkey"],
        cluster_files=8,
    )
    t.upsert(
        o.filter(k % 10 < 6).withColumn("ts", F.lit(0)),
        [F.col("ts").desc()],
    )
    v0 = t.current_version()
    t.upsert(
        o.filter((k % 10 >= 4) & (k % 10 <= 8))
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 1.1, 4))
        .withColumn("ts", F.lit(1)),
        [F.col("ts").desc()],
    )
    t.delete_keys(o.filter(k % 7 == 0).select("o_orderkey"))
    register_changes_stream(spark)
    out = root + "/out"
    q = (
        spark.readStream.format("atomic_changes")
        .option("path", t.path)
        .option("keys", "o_orderkey")
        .option("from_version", str(v0))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", root + "/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.read.parquet(out)
        .groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
