"""Subquery plans (SURVEY.md §2 B3-B5 adjuncts): correlated EXISTS /
NOT EXISTS (Catalyst decorrelates to semi/anti joins — SURVEY §4 lists
decorrelation as a free Catalyst win), IN-subquery, and scalar
aggregate subqueries. Expressed via spark.sql over registered temp
views — the SQL front door of the engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.plans.registry import register


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


_EXISTS_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
"""


@register("subquery_exists", oracle=_EXISTS_SQL, tags=("B3", "B4"))
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — planned as a left-semi hash join after
    decorrelation (check .explain: no per-row subquery execution)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_EXISTS_SQL)


_NOT_IN_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey NOT IN (
  SELECT n_nationkey FROM nation WHERE n_regionkey = 0
)
"""


@register("subquery_not_in", oracle=_NOT_IN_SQL, tags=("B3", "B4"))
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery — null-aware anti join (the subquery side has no
    nulls here, so semantics match the naive set difference)."""
    _views(spark, sf_dir, "supplier", "nation")
    return spark.sql(_NOT_IN_SQL)


_SCALAR_SQL = """
SELECT o_orderkey, ROUND(o_totalprice, 4) AS total
FROM orders
WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
"""


@register("subquery_scalar_agg", oracle=_SCALAR_SQL, tags=("B3", "B5"))
def subquery_scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar aggregate subquery — one extra aggregation job whose
    single-row result feeds the filter (no rescan per row)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_SCALAR_SQL)


_LATERAL_SQL = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n,
     LATERAL (
       SELECT c_custkey, c_acctbal
       FROM customer c
       WHERE c.c_nationkey = n.n_nationkey
       ORDER BY c_acctbal DESC, c_custkey
       LIMIT 2
     ) t
"""


@register("subquery_lateral_topn", oracle=_LATERAL_SQL, tags=("B3", "B4", "B7"))
def subquery_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table — per-nation top-2 customers by
    balance. Catalyst plans the lateral as a ranked join (DomainJoin →
    window + filter), the same shape as win_topk_per_group, so the
    per-outer-row 'run a subquery' never literally happens — the
    identical SQL runs on DuckDB as the oracle."""
    _views(spark, sf_dir, "nation", "customer")
    return spark.sql(_LATERAL_SQL)
