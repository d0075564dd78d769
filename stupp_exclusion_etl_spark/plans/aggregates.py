"""Aggregation plans (SURVEY.md §2 B5).

The reference only counts records per HTS code in log lines
(reference __main__.py:53-55); this is the full aggregation surface:
hash aggregates with map-side partials, distinct, approx-distinct,
rollup/cube/grouping-sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.catalog import table, register_views
from stupp_exclusion_etl_spark.plans._shared import r4, revenue
from stupp_exclusion_etl_spark.plans.registry import register


@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order,
           ROUND(MIN(l_extendedprice), 4) AS min_price,
           ROUND(MAX(l_extendedprice), 4) AS max_price
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("B5",),
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: 2-key hash agg, 9 measures.
    Partial aggregation happens map-side (6 groups total), so the
    shuffle moves ~6 rows per partition regardless of input size."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    disc_price = revenue()
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        r4(F.sum("l_quantity")).alias("sum_qty"),
        r4(F.sum("l_extendedprice")).alias("sum_base_price"),
        r4(F.sum(disc_price)).alias("sum_disc_price"),
        r4(F.sum(charge)).alias("sum_charge"),
        r4(F.avg("l_quantity")).alias("avg_qty"),
        r4(F.avg("l_discount")).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
        r4(F.min("l_extendedprice")).alias("min_price"),
        r4(F.max("l_extendedprice")).alias("max_price"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("B5",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count-distinct: Catalyst expands to a partial-dedup expand
    plan; at 100 TB prefer approx_count_distinct when ±2% is fine."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "agg_approx_distinct",
    oracle=None,  # HLL sketches differ across engines → rows-only check
    tags=("B5",),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB-scale answer to
    distinct counting — constant memory per group, one pass, no expand.
    Sketch values are engine-specific, so no SQL oracle (rows-only)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 4) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("B5",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals + grand total via plan-level
    Expand — one shuffle, not one job per level."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), r4(F.sum("l_quantity")).alias("sum_qty"))
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 4) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("B5",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over status × priority."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), r4(F.sum("o_totalprice")).alias("total"))
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("B5",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (Catalyst plans the
    same Expand as rollup/cube)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 4) AS spent
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 12
    """,
    tags=("B5",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r4(F.sum("o_totalprice")).alias("spent"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS F,
           CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS O,
           CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS P
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("B5",),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation): order counts per segment ×
    status. Explicit pivot values keep it one pass — omitting them
    costs an extra distinct-scan job to discover columns."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
           ROUND(covar_samp(l_extendedprice, l_discount), 4) AS cov_pd
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("B5",),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/corr/covar) — single-pass
    moment accumulators, map-side partials like any hash agg."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r4(F.stddev_samp("l_extendedprice")).alias("sd_price"),
        r4(F.var_samp("l_quantity")).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
        r4(F.covar_samp("l_extendedprice", "l_discount")).alias("cov_pd"),
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("B5",),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group. Exact
    percentile needs the group's values collected per reducer — fine
    per-group; for a 100 TB global percentile use approx_percentile
    (t-digest-style sketch, map-side mergeable, see
    agg_approx_distinct's rows-only pattern)."""
    o = table(spark, sf_dir, "orders")
    pct = F.percentile("o_totalprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return o.groupBy("o_orderpriority").agg(
        r4(F.element_at(pct, 1)).alias("p25"),
        r4(F.element_at(pct, 2)).alias("p50"),
        r4(F.element_at(pct, 3)).alias("p75"),
    )


@register(
    "agg_unpivot",
    oracle="""
    SELECT l_returnflag, 'qty' AS measure, ROUND(SUM(l_quantity), 4) AS total
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 'price', ROUND(SUM(l_extendedprice), 4)
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 'tax', ROUND(SUM(l_tax), 4)
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("B2", "B5"),
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide per-flag totals to long (flag, measure,
    total) rows — one aggregation pass then a zero-shuffle unpivot,
    vs the oracle's triple-scan UNION ALL formulation."""
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        r4(F.sum("l_quantity")).alias("qty"),
        r4(F.sum("l_extendedprice")).alias("price"),
        r4(F.sum("l_tax")).alias("tax"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty", "price", "tax"],
        variableColumnName="measure",
        valueColumnName="total",
    )


@register(
    "agg_approx_percentiles",
    oracle=None,  # sketch values are engine-specific; error-bounded
    # against exact percentiles in tests/test_rows_only_quality.py
    tags=("B5",),
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the 100 TB percentile path: a mergeable
    sketch (map-side partials, bounded memory) instead of per-group
    value collection; accuracy knob = max relative error (here 1e-4).
    Companion to the exact agg_percentiles."""
    o = table(spark, sf_dir, "orders")
    pct = F.percentile_approx(
        "o_totalprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(10000)
    )
    return o.groupBy("o_orderpriority").agg(
        r4(F.element_at(pct, 1)).alias("p25"),
        r4(F.element_at(pct, 2)).alias("p50"),
        r4(F.element_at(pct, 3)).alias("p75"),
    )


@register(
    "agg_median_mode",
    oracle="""
    WITH cnt AS (
      SELECT l_returnflag, l_quantity, CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2),
    m AS (
      SELECT l_returnflag, l_quantity AS mode_qty,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY c DESC, l_quantity) AS rn
      FROM cnt),
    med AS (
      SELECT l_returnflag,
             ROUND(median(l_quantity), 4) AS median_qty,
             ROUND(median(l_extendedprice), 4) AS median_price
      FROM lineitem GROUP BY 1)
    SELECT med.l_returnflag, median_qty, median_price, mode_qty
    FROM med JOIN (SELECT l_returnflag, mode_qty FROM m WHERE rn = 1) mo
      USING (l_returnflag)
    """,
    tags=("B5",),
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + deterministic mode per group. Spark's builtin
    `mode()` breaks frequency ties arbitrarily, so the mode is an
    explicit count→argmax (row_number ordered by count DESC, value ASC)
    — reproducible on any engine. Median is the exact builtin (the
    approx-sketch path is agg_approx_percentiles). Two aggregations on
    the same grouping key; the per-group mode table is tiny and
    broadcast back onto the medians."""
    li = table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        r4(F.median("l_quantity")).alias("median_qty"),
        r4(F.median("l_extendedprice")).alias("median_price"),
    )
    cnt = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("c"))
    w = W.partitionBy("l_returnflag").orderBy(F.col("c").desc(), "l_quantity")
    mode = (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    return med.join(F.broadcast(mode), "l_returnflag").select(
        "l_returnflag", "median_qty", "median_price", "mode_qty"
    )


@register(
    "agg_hll_shard_union",
    oracle=None,  # DataSketches HLL binaries are engine-specific → rows-only;
    # exact-count tolerance + shard-merge consistency gated in
    # tests/test_rows_only_quality.py
    tags=("B5",),
)
def agg_hll_shard_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-and-merge distinct counting with MERGEABLE HLL sketches
    (DataSketches hll_sketch_agg / hll_union_agg): each
    (l_returnflag, l_shipmode) shard builds its own sketch — at 100 TB
    these are computed per partition/day and PERSISTED — and the
    per-flag answer is a union of shard sketches, never a re-scan of
    the raw data. This is the capability approx_count_distinct alone
    doesn't give: incremental maintenance (union yesterday's sketch
    with today's delta) and cross-cut re-aggregation from stored
    sketches."""
    shard = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", F.date_trunc("month", "l_shipdate").alias("shard"))
        .agg(F.hll_sketch_agg("l_orderkey").alias("sk"))
    )
    return (
        shard.groupBy("l_returnflag")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_orders"),
            F.count("*").alias("n_shards"),
        )
        .orderBy("l_returnflag")
    )
