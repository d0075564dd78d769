"""Multi-join analytical rollups (SURVEY.md §2 B4/B5/B7 composed).

The reference's FK graph (ER ←erid— OF ←ofid— SUR, reference
config.py:32-56) generalizes to the star-schema join chains every
warehouse query walks: region → nation → customer → orders → lineitem
→ supplier/part. These queries are the classic TPC-H shapes — the
point at 100 TB is the JOIN STRATEGY, not the arithmetic: dimension
sides stay under the broadcast threshold at any scale factor
(region=5, nation=25, filtered part/customer in the low millions), so
Catalyst plans broadcast hash joins on the fact-table probe side and
the only shuffles are the final group-by exchanges on low-cardinality
keys. AQE re-plans the join order at runtime from observed sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.plans._shared import r4, revenue
from stupp_exclusion_etl_spark.plans.registry import register


@register(
    "analytics_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
    tags=("B4", "B5", "B7"),
)
def analytics_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem,
    unshipped-revenue top-10. Scale: the segment filter keeps ~1/5 of
    customers — still broadcastable keyed on c_custkey at warehouse
    dimension sizes; lineitem never shuffles before the group-by, and
    the top-10 is TakeOrderedAndProject (no global sort)."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(r4(F.sum(revenue())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@register(
    "analytics_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    tags=("B4", "B5", "B7"),
)
def analytics_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-way star join (region→nation→supplier,
    customer→orders→lineitem) with the local-supplier correlation
    c_nationkey = s_nationkey, revenue per nation. Scale: region,
    nation, and supplier are broadcast; the c↔s nation equality rides
    on the existing equi-join keys (no extra shuffle); the single
    exchange is the 25-key group-by."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    sn = s.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
                s.s_nationkey == F.col("n_nationkey"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(sn),
            (li.l_suppkey == sn.s_suppkey) & (c.c_nationkey == sn.s_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(r4(F.sum(revenue())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "nation")
    )


@register(
    "analytics_nation_market_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           ROUND(SUM(CASE WHEN n.n_name = 'NATION_7'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type = 'PROMO'
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("B4", "B5"),
)
def analytics_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue per
    order year — conditional aggregation over a 5-way join. Scale:
    part(filtered)/supplier/nation broadcast against lineitem; the
    share division happens after a tiny per-year rollup."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    rev = revenue()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
              li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # try_divide: a year-group whose revenue sums to 0.0 (all
            # zero-price/zero-quantity lines) must yield NULL, not an
            # ANSI DIVIDE_BY_ZERO — DuckDB x/0.0 is NULL (adversarial
            # relational sweep; repo-wide try_divide policy).
            F.round(
                F.try_divide(
                    F.sum(
                        F.when(
                            F.col("n_name") == "NATION_7", rev
                        ).otherwise(F.lit(0.0))
                    ),
                    F.sum(rev),
                ),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "analytics_top_supplier",
    oracle="""
    WITH sup_rev AS (
      SELECT l_suppkey AS s_suppkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, sr.total_revenue
    FROM supplier s JOIN sup_rev sr ON s.s_suppkey = sr.s_suppkey
    WHERE sr.total_revenue = (SELECT MAX(total_revenue) FROM sup_rev)
    ORDER BY s.s_suppkey
    """,
    tags=("B4", "B5", "B6"),
)
def analytics_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, return the
    max-revenue supplier(s). The scalar-subquery max is expressed as a
    rank-over-empty-partition window on the ALREADY-AGGREGATED
    per-supplier rollup (thousands of rows per 1M suppliers) — the
    single-partition window never sees fact-table volume."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    sup_rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        r4(F.sum(revenue())).alias("total_revenue")
    )
    top = sup_rev.withColumn(
        "rk", F.rank().over(Window.orderBy(F.col("total_revenue").desc()))
    ).filter(F.col("rk") == 1)
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(top), "s_suppkey")
        .orderBy("s_suppkey")
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "analytics_order_count_histogram",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("B4", "B5"),
)
def analytics_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer distribution via outer join
    + two-level aggregation. Scale: the first group-by shuffles on
    c_custkey (same key as the join — AQE reuses the exchange); the
    second rollup is a few dozen histogram buckets."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "analytics_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4')
      AND n2.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4')
      AND n1.n_name <> n2.n_name
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("B4", "B5"),
)
def analytics_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border trade volume among five nations
    by ship year (distinct supplier/customer nation pairs). Five joins,
    but four sides are dimensions (supplier, customer, nation x2) — all
    broadcast, so lineitem flows through a single codegen'd stage and
    the only shuffle is the final 3-key group-by (cardinality =
    nations^2 x years). The nation filters land on the broadcast sides,
    pre-shrinking them before the probe."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    nations = [f"NATION_{i}" for i in range(5)]
    n = table(spark, sf_dir, "nation").filter(F.col("n_name").isin(nations))
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(F.broadcast(s.join(F.broadcast(n1), s.s_nationkey == n1.n1_key)),
                li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.join(F.broadcast(n2), c.c_nationkey == n2.n2_key)),
              o.o_custkey == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(r4(F.sum(revenue())).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "analytics_returned_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("B4", "B5", "B7"),
)
def analytics_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-merchandise
    revenue in a quarter. The returnflag + date filters reach the
    parquet scans (PushedFilters); customer and nation broadcast; the
    group-by key set (custkey) is the one shuffle, and the top-20 is
    TakeOrderedAndProject — no global sort at any scale."""
    start = F.lit("1997-01-01").cast("timestamp")
    end = F.lit("1997-04-01").cast("timestamp")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= start) & (F.col("o_orderdate") < end)
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(r4(F.sum(revenue())).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "analytics_part_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT b.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
    JOIN part p ON p.p_partkey = b.l_partkey
    WHERE b.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 20
    """,
    tags=("B4", "B5"),
)
def analytics_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute,
    excluding blacklisted suppliers via a NOT IN subquery (planned as
    a broadcast anti join — supplier is dimension-sized). lineitem
    stands in for partsupp as the part-supplier bridge; the DISTINCT
    pre-shrinks it to bridge cardinality before the part join."""
    bridge = (
        table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = table(spark, sf_dir, "part")
    return (
        bridge.join(F.broadcast(bad), bridge.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(20)
    )


@register(
    "analytics_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice, 4) AS o_totalprice,
           ROUND(t.sum_qty, 4) AS sum_qty
    FROM (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 250) t
    JOIN orders o ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY sum_qty DESC, o_orderkey
    LIMIT 20
    """,
    tags=("B4", "B5", "B7"),
)
def analytics_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the largest orders (sum of
    line quantities > 250). The HAVING aggregate runs FIRST, shrinking
    lineitem to a handful of order keys before any join — the
    aggregate-then-join ordering that matters at 100 TB (joining first
    would shuffle the full fact table). Survivor keys then hash-join
    orders and broadcast-join customer."""
    li = table(spark, sf_dir, "lineitem")
    t = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty_raw"))
        .filter(F.col("sum_qty_raw") > 250)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        t.join(o, t.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            r4(F.col("o_totalprice")).alias("o_totalprice"),
            r4(F.col("sum_qty_raw")).alias("sum_qty"),
        )
        .orderBy(F.col("sum_qty").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "analytics_waiting_supplier",
    oracle="""
    WITH l1 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
                WHERE l_returnflag = 'R')
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("B4", "B5"),
)
def analytics_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for returns in
    finalized multi-supplier orders — EXISTS (another supplier shipped
    in the order) AND NOT EXISTS (another supplier also had returns).
    Expressed as left-semi + left-anti joins on the order key with the
    supplier-inequality as a residual condition: both plan as hash
    joins (equi key = l_orderkey), never nested loops; the correlated
    subqueries are decorrelated by construction."""
    li = table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    ).distinct()
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3")
    )
    return (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .join(
            l2,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "analytics_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("B3", "B5"),
)
def analytics_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-scan filtered aggregate — the canonical
    pushdown showcase. Scale: every predicate (date range, discount
    band, quantity cap) reaches the parquet reader as PushedFilters +
    row-group stats skipping; the job is one map stage plus a single-
    row partial-agg merge — zero shuffle of data rows, so it is scan-
    bandwidth-bound at any scale factor."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
            "revenue_delta"
        )
    )


@register(
    "analytics_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey, MIN(unit_price) AS best_price
      FROM offers GROUP BY l_partkey
    )
    SELECT p.p_partkey, p.p_brand, s.s_name,
           b.best_price AS best_price
    FROM best b
    JOIN offers o ON o.l_partkey = b.l_partkey
                 AND o.unit_price = b.best_price
    JOIN part p ON p.p_partkey = b.l_partkey AND p.p_size = 7
    JOIN supplier s ON s.s_suppkey = o.l_suppkey
    ORDER BY best_price DESC, p_partkey, s_name
    LIMIT 25
    """,
    tags=("B4", "B5", "B7"),
)
def analytics_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each size-7 part, the supplier(s) quoting
    the minimum unit price — the correlated-MIN subquery decorrelated
    into aggregate + self-equi-join (no partsupp table in this schema;
    lineitem unit prices stand in for supply cost). Float equality on
    unit_price is engine-safe: both engines evaluate the identical
    IEEE division row-by-row and MIN is order-independent. Scale: the
    size-7 part filter is pushed BELOW both aggregates as a broadcast
    semi-join on the lineitem scan — offers/best exist only for parts
    that can reach the result (~1/50 of rows; equivalent to the
    oracle's late filter because best_price per part is independent of
    other parts). Both aggregates and the re-join share the l_partkey
    shuffle key, so AQE reuses one exchange; part and supplier
    broadcast."""
    p = table(spark, sf_dir, "part").filter(F.col("p_size") == 7)
    li = table(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"))),
        "l_partkey",
        "left_semi",
    )
    offers = li.groupBy(
        F.col("l_partkey").alias("o_pk"), F.col("l_suppkey").alias("l_suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    best = offers.groupBy(F.col("o_pk").alias("l_partkey")).agg(
        F.min("unit_price").alias("best_price")
    )
    s = table(spark, sf_dir, "supplier")
    return (
        best.join(
            offers,
            (F.col("l_partkey") == F.col("o_pk"))
            & (F.col("best_price") == F.col("unit_price")),
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "p_partkey", "p_brand", "s_name", "best_price"
        )
        .orderBy(F.col("best_price").desc(), "p_partkey", "s_name")
        .limit(25)
    )


@register(
    "analytics_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.01 * p.p_retailprice * l.l_quantity), 4) AS profit
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("B4", "B5"),
)
def analytics_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus a retail-price-proportional
    cost proxy — no partsupp.ps_supplycost in this schema) per supplier
    nation per order year, parts filtered by name substring. Scale: the
    LIKE-filtered part set and supplier→nation chain broadcast; lineitem
    joins orders on the orderkey shuffle; the measure stays on the 4dp
    decimal grid (2dp×2dp inputs) so ROUND(.,4) is cross-engine exact."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) - F.lit(
        0.01
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
              li.l_suppkey == F.col("s_suppkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(r4(F.sum(profit)).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "analytics_important_parts",
    oracle="""
    WITH stock AS (
      SELECT l.l_partkey,
             SUM(p.p_retailprice * l.l_quantity) AS value
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey, ROUND(value, 2) AS value
    FROM stock
    WHERE value > (SELECT SUM(value) * 0.002 FROM stock)
    ORDER BY value DESC, p_partkey
    """,
    tags=("B4", "B5", "B15"),
)
def analytics_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose one-nation inventory value exceeds
    a fixed fraction of that nation's total — the scalar subquery over
    the SAME aggregate. Expressed by computing `stock` once and joining
    the global sum back as a broadcast single-row cross join, so the
    expensive fact-side aggregation runs exactly once (not twice as a
    naive subquery would). Value sums sit on the 2dp×integer grid —
    exact in any accumulation order. Scale: one shuffle on l_partkey;
    the total is one row, broadcast."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    stock = (
        li.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
                li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("p_retailprice") * F.col("l_quantity")).alias("value"))
    )
    total = stock.agg((F.sum("value") * F.lit(0.002)).alias("__thr"))
    return (
        stock.join(F.broadcast(total))
        .filter(F.col("value") > F.col("__thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("value"), 2).alias("value"),
        )
        .orderBy(F.col("value").desc(), "p_partkey")
    )


@register(
    "analytics_priority_lines",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      AND l.l_linestatus = 'F'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    tags=("B4", "B5"),
)
def analytics_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts of high- vs low-priority
    orders per line category (l_returnflag stands in for l_shipmode,
    absent from this schema). Scale: lineitem's filters push to the
    scan; the join shuffles on orderkey; conditional sums are map-side
    partial aggregates over a 3-key group — the reduce is trivial."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_linestatus") == "F")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "analytics_promo_revenue_share",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
    tags=("B4", "B5"),
)
def analytics_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo parts' share of one month's revenue.
    Both the numerator and denominator are exact 4dp-grid sums, so the
    quotient is bit-identical across engines before ROUND(.,6). Scale:
    part broadcasts; the month filter prunes row groups; the result is
    a single row — no reduce-side data motion at all."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = revenue()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("promo_pct")
        )
    )


@register(
    "analytics_small_qty_revenue",
    oracle="""
    WITH thresh AS (
      SELECT l_partkey, 0.5 * AVG(l_quantity) AS qty_cap
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#13'
    JOIN thresh t ON t.l_partkey = l.l_partkey
    WHERE l.l_quantity < t.qty_cap
    """,
    tags=("B4", "B5", "B15"),
)
def analytics_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders below half the part's
    average quantity — the correlated AVG subquery decorrelated into a
    per-part aggregate re-joined to lineitem. Quantities are integer-
    valued doubles, so AVG is exact-sum/count and the 0.5× threshold
    comparison is engine-deterministic. Scale: the aggregate and the
    re-join share the l_partkey shuffle; the Brand filter broadcasts
    part and prunes the probe early."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    thresh = li.groupBy(F.col("l_partkey").alias("tk")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_cap")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresh, li.l_partkey == F.col("tk"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(r4(F.sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "analytics_disjunctive_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("B3", "B4", "B5"),
)
def analytics_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst
    factors the part-only disjuncts (brand ∈ {12,23,34}, size ≥ 1)
    below the join as a pushed pre-filter and keeps the cross-side
    residual on the join — the classic disjunctive-pushdown test.
    Scale: filtered part broadcasts; lineitem is scanned once with the
    quantity range union pushed to row-group stats."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    arm = lambda brand, smax, qlo, qhi: (
        (F.col("p_brand") == brand)
        & (F.col("p_size") >= 1) & (F.col("p_size") <= smax)
        & (F.col("l_quantity") >= qlo) & (F.col("l_quantity") <= qhi)
    )
    return j.filter(
        arm("Brand#12", 5, 1, 11) | arm("Brand#23", 10, 10, 20) | arm("Brand#34", 15, 20, 30)
    ).agg(r4(F.sum(revenue())).alias("revenue"))


@register(
    "analytics_dormant_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    tags=("B4", "B5"),
)
def analytics_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers dormant since
    1999, grouped by segment (c_mktsegment stands in for the phone
    country code, absent here). The scalar AVG broadcasts as a one-row
    cross join; NOT EXISTS is a left-anti join on o_custkey with the
    date bound pushed below it. AVG over 2dp doubles is exact-sum/count
    — the threshold comparison is engine-deterministic. Scale: orders
    is date-filtered and key-projected before the anti-join shuffle;
    customer is the smaller side throughout."""
    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__ab")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "analytics_late_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("B3", "B4", "B5"),
)
def analytics_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking — count a quarter's
    orders having at least one line shipped >60 days after the order
    date (the schema has no commit/receipt dates, so lateness is
    ship-vs-order lag). The correlated EXISTS decorrelates to a
    left-semi hash join on the order key with the lag comparison as a
    residual; the date-range filter prunes orders BEFORE the join, so
    the shuffle carries one quarter, not the table. Low-cardinality
    final group-by (5 priorities) — partial aggregation collapses it
    map-side at any scale."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("lk"), "l_shipdate"
    )
    return (
        o.join(
            l,
            (F.col("o_orderkey") == F.col("lk"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "analytics_excess_shippers",
    oracle="""
    WITH bulk AS (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate < TIMESTAMP '1999-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(l_quantity) > 60)
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM bulk)
    ORDER BY s.s_suppkey
    """,
    tags=("B4", "B5"),
)
def analytics_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (partsupp-less): suppliers who bulk-shipped any
    single 'small%' part (>60 units) during 1998, with their nation.
    The IN-subquery over a grouped aggregate decorrelates to a
    left-semi join against the aggregated key set; part is filtered
    then broadcast under the lineitem join, so the only data-row
    shuffle is the (suppkey, partkey) partial-agg exchange. The
    supplier/nation dimension joins broadcast at any scale factor."""
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    bulk = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 60)
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(bulk, s.s_suppkey == bulk.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )
