"""Set-operation plans (SURVEY.md §2 B8).

The reference runs three parallel entity pipelines that never combine
(reference __main__.py:36-121); here they union/intersect/except as one
plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.plans.registry import register


@register(
    "setop_union_pipelines",
    oracle="""
    SELECT 'customer' AS entity, c_custkey AS id, c_name AS name FROM customer
      WHERE c_acctbal > 9500
    UNION ALL
    SELECT 'supplier' AS entity, s_suppkey AS id, s_name AS name FROM supplier
      WHERE s_acctbal > 9500
    """,
    tags=("B8",),
)
def setop_union_pipelines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of two entity pipelines with a discriminator column —
    the three serial reference pipelines as one combined plan."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .select(
            F.lit("customer").alias("entity"),
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("name"),
        )
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9500)
        .select(
            F.lit("supplier").alias("entity"),
            F.col("s_suppkey").alias("id"),
            F.col("s_name").alias("name"),
        )
    )
    return c.unionByName(s)


@register(
    "setop_intersect",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    """,
    tags=("B8",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): parts appearing in both returned and
    accepted lineitems."""
    li = table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return r.intersect(a)


@register(
    "setop_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("B8",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers with finished orders but no open
    ones (all-parts-EXCEPT-ordered-parts is empty in this testdata —
    every part is referenced by some lineitem)."""
    o = table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.subtract(op)


@register(
    "setop_union_schema_evolution",
    oracle="""
    SELECT * FROM (
      SELECT o_orderkey AS rec_id, 'order' AS src,
             ROUND(o_totalprice, 4) AS amount, o_orderpriority AS priority
      FROM orders
      UNION ALL BY NAME
      SELECT l_orderkey AS rec_id, 'line' AS src,
             ROUND(l_extendedprice, 4) AS amount, l_returnflag AS flag
      FROM lineitem WHERE l_linenumber = 1)
    """,
    tags=("B8", "B2"),
)
def setop_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two record versions with different
    column sets combined by NAME with null fill
    (unionByName(allowMissingColumns=True) — DuckDB's UNION ALL BY
    NAME). The everyday shape when a pipeline's v2 adds/drops fields
    and history must still union with today. Catalyst plans it as a
    zero-shuffle Union of projections — columns missing on one side
    are literal nulls, no row movement."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("rec_id"),
        F.lit("order").alias("src"),
        F.round("o_totalprice", 4).alias("amount"),
        F.col("o_orderpriority").alias("priority"),
    )
    l = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") == 1)
        .select(
            F.col("l_orderkey").alias("rec_id"),
            F.lit("line").alias("src"),
            F.round("l_extendedprice", 4).alias("amount"),
            F.col("l_returnflag").alias("flag"),
        )
    )
    return o.unionByName(l, allowMissingColumns=True)
