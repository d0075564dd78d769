"""Join plans (SURVEY.md §2 A12, B4).

The reference has one hand-rolled 1:1 enrichment join (detail ⟕ summary,
reference clients/exclusion_requests.py:97-99) plus an FK graph
ER ←(erid)— OF ←(ofid)— SUR (reference config.py:32-56). Here that
becomes the full Spark join surface: broadcast-hash, sort-merge, outer,
semi/anti, interval-containment range join, and the 3-way FK chain.

Scale notes: small dimension sides are broadcast explicitly; large-large
joins shuffle on the join key and rely on AQE for skew splitting. The
range join avoids the O(N*M) cartesian by equi-joining on a coarse
bucket of the range key first, then applying the residual predicate —
the standard bucketed range-join decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.plans._shared import r4, revenue
from stupp_exclusion_etl_spark.plans.registry import register


@register(
    "join_broadcast_enrich",
    oracle="""
    SELECT o.o_orderkey AS ID, o.o_totalprice AS total,
           c.c_name AS company, c.c_mktsegment AS segment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    """,
    tags=("A12", "B4"),
)
def join_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The enrichment join (A12): each detail row overlaid with its
    summary attributes — 1:1 per key, small side broadcast so the big
    side never shuffles."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = table(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("o_orderkey").alias("ID"),
        F.col("o_totalprice").alias("total"),
        F.col("c_name").alias("company"),
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0.0), 4) AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("B4", "B5"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            r4(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("total_spent"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    WITH big_cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
         big_ord AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
                     FROM orders GROUP BY o_custkey HAVING count(*) >= 15)
    SELECT COALESCE(b.c_custkey, g.o_custkey) AS custkey,
           b.c_acctbal AS acctbal, g.n AS n_orders
    FROM big_cust b FULL OUTER JOIN big_ord g ON b.c_custkey = g.o_custkey
    """,
    tags=("B4",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two derived sets with nulls on both sides."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        "c_custkey", "c_acctbal"
    )
    g = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 15)
    )
    return c.join(g, c.c_custkey == g.o_custkey, "full_outer").select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("n").alias("n_orders"),
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    tags=("B4",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having a very large order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("B4",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders at all."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_fk_chain",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY c.c_mktsegment
    """,
    tags=("B4", "B5"),
)
def join_fk_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ER→OF→SUR foreign-key chain (reference config.py:32-56)
    modeled on customer→orders→lineitem: two equi-joins + rollup by
    segment. orders⋈lineitem shuffles on orderkey; customer is the
    small dimension → broadcast."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_items"),
            r4(F.sum(revenue())).alias("revenue"),
        )
    )


# Interval-containment probes: the reference's thickness/diameter GSIs
# answer "which requests' [min,max] interval covers x" (SURVEY.md §1.3).
# Stand-in: intervals [p_retailprice - 50, p_retailprice + 50] probed by
# fixed price points.
_PROBES = [900.0, 1100.0, 1300.0, 1500.0, 1700.0, 1900.0]
_PROBES_SQL = ", ".join(f"({p})" for p in _PROBES)


@register(
    "join_interval_containment",
    oracle=f"""
    SELECT probe.x AS probe_x, CAST(count(p.p_partkey) AS BIGINT) AS n_covering
    FROM (VALUES {_PROBES_SQL}) AS probe(x)
    LEFT JOIN part p
      ON probe.x BETWEEN p.p_retailprice - 50.0 AND p.p_retailprice + 50.0
    GROUP BY probe.x
    """,
    tags=("B4",),
)
def join_interval_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: interval containment (`x BETWEEN lo AND hi`). The
    probe side is tiny → broadcast nested-loop with the BETWEEN
    residual; at scale with two large sides, use the bucketed
    decomposition in operators.joins.range_join_bucketed."""
    probes = spark.createDataFrame([(x,) for x in _PROBES], "x double")
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_retailprice") - 50.0).alias("lo"),
        (F.col("p_retailprice") + 50.0).alias("hi"),
    )
    return (
        F.broadcast(probes)
        .join(p, (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")), "left")
        .groupBy(F.col("x").alias("probe_x"))
        .agg(F.count("p_partkey").alias("n_covering"))
    )


@register(
    "join_range_bucketed",
    oracle="""
    SELECT o.o_orderkey, CAST(count(p.p_partkey) AS BIGINT) AS n_covering
    FROM (SELECT o_orderkey, o_totalprice / 100.0 AS x
          FROM orders WHERE o_orderkey < 300) o
    LEFT JOIN (SELECT p_partkey,
                      p_retailprice - 50.0 AS lo,
                      p_retailprice + 50.0 AS hi
               FROM part) p
      ON o.x BETWEEN p.lo AND p.hi
    GROUP BY o.o_orderkey
    """,
    tags=("B4",),
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment with BOTH sides large — the bucketed
    decomposition (operators.joins.range_join_bucketed): intervals
    explode into ~1-2 coarse buckets each, probes hash to one, and the
    equi-join on bucket + residual BETWEEN replaces the quadratic
    nested loop. A left join against the probe set restores probes
    covered by no interval (the bucketed form is inner by nature)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    probes = o.select("o_orderkey", (F.col("o_totalprice") / 100.0).alias("x"))
    iv = table(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_retailprice") - 50.0).alias("lo"),
        (F.col("p_retailprice") + 50.0).alias("hi"),
    )
    from stupp_exclusion_etl_spark.operators.joins import range_join_bucketed

    hits = range_join_bucketed(probes, "x", iv, "lo", "hi", bucket_width=100.0)
    counts = hits.groupBy("o_orderkey").agg(
        F.count("p_partkey").alias("n_covering")
    )
    return (
        probes.select("o_orderkey")
        .join(counts, "o_orderkey", "left")
        .select(
            "o_orderkey", F.coalesce("n_covering", F.lit(0)).alias("n_covering")
        )
    )


@register(
    "join_salted_skew",
    oracle="""
    WITH skewed AS (
      SELECT CASE WHEN o_orderkey % 4 < 3 THEN 1 ELSE o_custkey END AS hot_key,
             o_totalprice
      FROM orders)
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           ROUND(SUM(s.o_totalprice), 4) AS total
    FROM skewed s JOIN customer c ON s.hot_key = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("B4",),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-key join through operators.joins.salted_join: 75% of
    orders are remapped onto one hot customer key — unsalted, that key
    is a single straggler reducer; salted, it spreads over n_salts
    tasks. The oracle proves the salted result equals the plain join
    (the salt is an internal rewrite, invisible in the output)."""
    from stupp_exclusion_etl_spark.operators.joins import salted_join

    o = table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 4 < 3, F.lit(1).cast("long"))
        .otherwise(F.col("o_custkey"))
        .alias("hot_key"),
        "o_totalprice",
    )
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("hot_key"), "c_mktsegment"
    )
    return (
        salted_join(o, c, "hot_key", n_salts=16)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r4(F.sum("o_totalprice")).alias("total"),
        )
    )


@register(
    "join_nullsafe",
    oracle="""
    WITH c AS (SELECT c_custkey,
                      CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END AS cnk
               FROM customer),
         s AS (SELECT s_suppkey,
                      CASE WHEN s_suppkey % 5 = 0 THEN NULL ELSE s_nationkey END AS snk
               FROM supplier)
    SELECT c.cnk AS nk, CAST(count(*) AS BIGINT) AS n_pairs
    FROM c JOIN s ON c.cnk IS NOT DISTINCT FROM s.snk
    GROUP BY c.cnk
    """,
    tags=("B4",),
)
def join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of dropping out — the semantics an
    entity-resolution join over incompletely-keyed records needs (the
    reference's dynamic schema routinely yields missing attributes,
    SURVEY.md §1.1). Nulls are derived deterministically here since the
    testdata is fully keyed. Still a hash-partitionable equi-join for
    Catalyst (no cartesian); the null bucket is one key group — at
    scale it is THE skew key, so pair it with salting if nulls are
    common."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("cnk"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.when(F.col("s_suppkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("s_nationkey"))
        .alias("snk"),
    )
    return (
        cust.join(F.broadcast(supp), cust["cnk"].eqNullSafe(supp["snk"]))
        .groupBy(cust["cnk"].alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
