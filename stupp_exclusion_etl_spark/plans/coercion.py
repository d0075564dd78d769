"""Dynamic type-inference plan (SURVEY.md §1.2 / A13 / B15).

Drives functions.coercion.typify over a deterministic mix of raw
strings synthesized from `part` — covering every edge class of the
reference's typify_value (reference clients/dynamodb.py:51-72): plain
ints, decimals, whitespace ints, the 1E1771 guard, inf/nan, leading
zeros, negatives, and plain words.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.functions.coercion import oracle_case_sql, typify
from stupp_exclusion_etl_spark.plans.registry import register

# Deterministic raw-string synthesis shared (textually) by both engines.
_RAW_SQL = """
    CASE p_partkey % 8
      WHEN 0 THEN CAST(p_partkey AS VARCHAR)
      WHEN 1 THEN CAST(p_partkey AS VARCHAR) || '.' || CAST(p_size AS VARCHAR)
      WHEN 2 THEN ' ' || CAST(p_partkey AS VARCHAR) || ' '
      WHEN 3 THEN '1E' || CAST(p_size AS VARCHAR)
      WHEN 4 THEN CASE p_size % 3 WHEN 0 THEN 'inf' WHEN 1 THEN 'nan' ELSE '-inf' END
      WHEN 5 THEN p_name
      WHEN 6 THEN '00' || CAST(p_size AS VARCHAR)
      ELSE '-' || CAST(p_partkey AS VARCHAR)
    END
"""


def _raw_col() -> F.Column:
    p, s = F.col("p_partkey"), F.col("p_size").cast("string")
    return (
        F.when(p % 8 == 0, p.cast("string"))
        .when(p % 8 == 1, F.concat(p.cast("string"), F.lit("."), s))
        .when(p % 8 == 2, F.concat(F.lit(" "), p.cast("string"), F.lit(" ")))
        .when(p % 8 == 3, F.concat(F.lit("1E"), s))
        .when(
            p % 8 == 4,
            F.when(F.col("p_size") % 3 == 0, F.lit("inf"))
            .when(F.col("p_size") % 3 == 1, F.lit("nan"))
            .otherwise(F.lit("-inf")),
        )
        .when(p % 8 == 5, F.col("p_name"))
        .when(p % 8 == 6, F.concat(F.lit("00"), s))
        .otherwise(F.concat(F.lit("-"), p.cast("string")))
    )


@register(
    "coercion_typify",
    oracle=f"""
    WITH raws AS (SELECT p_partkey, ({_RAW_SQL}) AS raw FROM part)
    SELECT p_partkey, raw,
           ({oracle_case_sql('raw')}) AS tag,
           CASE WHEN ({oracle_case_sql('raw')}) = 'long'
                THEN try_cast(trim(raw) AS BIGINT) END AS long_val,
           CASE WHEN ({oracle_case_sql('raw')}) = 'double'
                THEN try_cast(trim(raw) AS DOUBLE) END AS double_val,
           CASE WHEN ({oracle_case_sql('raw')}) = 'string' THEN raw END AS str_val
    FROM raws
    """,
    tags=("A13", "B15"),
)
def coercion_typify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guarded S/N/NULL typing (A13): int-before-float, whitespace
    tolerance, and the inf/nan/'e' guard that keeps '1E1771' a string."""
    p = table(spark, sf_dir, "part").select("p_partkey", "p_size", "p_name")
    out = p.withColumn("raw", _raw_col()).withColumn("t", typify(F.col("raw")))
    return out.select(
        "p_partkey",
        "raw",
        F.col("t.tag").alias("tag"),
        F.col("t.long_val").alias("long_val"),
        F.col("t.double_val").alias("double_val"),
        F.col("t.str_val").alias("str_val"),
    )


# Contract-violation reasons over the typified raws, shared textually
# with the oracle: untypable values, negative ids, oversize strings.
def _reason_col(tag, long_val, raw) -> F.Column:
    return (
        F.when(tag == "null", F.lit("untypable"))
        .when((tag == "long") & (long_val < 0), F.lit("negative_id"))
        .when((tag == "string") & (F.length(raw) > 25), F.lit("oversize_string"))
        .otherwise(F.lit("ok"))
    )


@register(
    "ingest_reject_audit",
    oracle=f"""
    WITH raws AS (SELECT p_partkey, ({_RAW_SQL}) AS raw FROM part),
    typed AS (
      SELECT raw, ({oracle_case_sql('raw')}) AS tag,
             try_cast(trim(raw) AS BIGINT) AS long_val
      FROM raws)
    SELECT CASE WHEN tag = 'null' THEN 'untypable'
                WHEN tag = 'long' AND long_val < 0 THEN 'negative_id'
                WHEN tag = 'string' AND length(raw) > 25 THEN 'oversize_string'
                ELSE 'ok' END AS reason,
           CAST(count(*) AS BIGINT) AS n
    FROM typed
    GROUP BY 1
    """,
    tags=("A13", "A18"),
)
def ingest_reject_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine audit rollup: the same dirty-string mix as
    coercion_typify routed through the dead-letter contract
    (sources.ingest.quarantine_split) — per-reason counts the pipeline
    operator would write to its rejects table. One map-side reason
    expression + one rollup shuffle."""
    p = table(spark, sf_dir, "part").select("p_partkey", "p_size", "p_name")
    t = p.withColumn("raw", _raw_col()).withColumn("t", typify(F.col("raw")))
    reason = _reason_col(
        F.col("t.tag"), F.col("t.long_val"), F.col("raw")
    ).alias("reason")
    return t.select(reason).groupBy("reason").agg(F.count("*").alias("n"))
