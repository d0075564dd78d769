"""Nested-type, JSON, and scalar-function plans (SURVEY.md §2 A11, B10, B11).

The reference extracts JSON arrays-of-structs out of HTML script blobs
(reference clients/exclusion_requests.py:100-106) and stores nested
maps/lists; these plans exercise from_json, explode, struct/map ops,
and the string/date scalar family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.plans.registry import register


@register(
    "nested_json_extract",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           -- NULLIF+TRY_CAST: malformed/empty props extract '' which a
           -- bare CAST rejects; the engine's from_json yields NULL for
           -- them (adversarial relational sweep)
           CAST(SUM(TRY_CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(TRY_CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
    tags=("A11", "B11"),
)
def nested_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload column → typed struct via from_json (A11 analog),
    then aggregate on the extracted field."""
    ev = table(spark, sf_dir, "events").withColumn(
        "p", F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p.k").alias("sum_k"),
        F.max("p.k").alias("max_k"),
    )


@register(
    "nested_from_json_explode",
    oracle="""
    SELECT n_nationkey, n_name AS OriginCountry
    FROM nation
    """,
    tags=("A11", "B11"),
)
def nested_from_json_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 'Source Countries' pattern end-to-end: build the
    inline-script JSON array string, regexp-extract it, from_json to
    array<struct>, explode back to rows
    (reference clients/exclusion_requests.py:100-103)."""
    n = table(spark, sf_dir, "nation")
    blob = F.concat(
        F.lit('var data = [{"OriginCountry": "'), F.col("n_name"), F.lit('"}];')
    )
    arr_schema = T.ArrayType(T.StructType([T.StructField("OriginCountry", T.StringType())]))
    parsed = n.withColumn(
        "countries",
        F.from_json(F.regexp_extract(blob, r'\[\{"OriginCountry"[^\]]*\]', 0), arr_schema),
    )
    return parsed.select(
        "n_nationkey", F.explode("countries").alias("c")
    ).select("n_nationkey", F.col("c.OriginCountry").alias("OriginCountry"))


@register(
    "nested_array_stats",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS n_dims,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))), 6) AS l2_sq,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS comp_sum
    FROM embeddings
    """,
    tags=("B11", "B13"),
)
def nested_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array reductions with higher-order functions (no explode, no
    shuffle — per-row aggregate inside codegen)."""
    e = table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    s = F.aggregate(F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_dims"),
        F.round(sq, 6).alias("l2_sq"),
        F.round(s, 6).alias("comp_sum"),
    )


@register(
    "nested_map_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST((CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)
              + (CASE WHEN l_discount*100 > 25 THEN 1 ELSE 0 END)
              + (CASE WHEN l_tax*100 > 25 THEN 1 ELSE 0 END) AS INTEGER) AS n_large,
           CAST(3 AS INTEGER) AS n_keys
    FROM lineitem WHERE l_orderkey < 1000
    """,
    tags=("B11",),
)
def nested_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column ops: build a map, map_filter it, count entries
    (the reference's dict-of-attributes record model, SURVEY.md §1.1;
    empty-value map_filter = A8)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"),
        F.lit("disc_pct"), F.col("l_discount") * 100,
        F.lit("tax_pct"), F.col("l_tax") * 100,
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.size(F.map_filter(m, lambda k, v: v > 25)).alias("n_large"),
        F.size(F.transform_keys(m, lambda k, v: F.upper(k))).alias("n_keys"),
    )


@register(
    "func_string_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mon,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
           CAST(regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS BIGINT) AS prio_num,
           lower(replace(o_orderpriority, '-', '_')) AS prio_slug,
           substr(trim(o_orderstatus), 1, 1) AS status_c
    FROM orders WHERE o_orderkey < 2000
    """,
    tags=("B10",),
)
def func_string_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date scalar family (B10): year/month/quarter/date_trunc/
    datediff + trim/replace/lower/substr/regexp_extract — the reference
    only ever strips and replaces strings (A7, A13 trim note)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        # trunc() stays in DATE space; DATE→NTZ is midnight, no session
        # TZ involved (date_trunc would round-trip date→LTZ→NTZ through
        # the session timezone)
        F.trunc("o_orderdate", "month").cast("timestamp_ntz").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        F.regexp_extract("o_orderpriority", r"^([0-9]+)", 1).cast("long").alias("prio_num"),
        F.lower(F.replace("o_orderpriority", F.lit("-"), F.lit("_"))).alias("prio_slug"),
        F.substring(F.trim(F.col("o_orderstatus")), 1, 1).alias("status_c"),
    )


@register(
    "nested_double_json",
    oracle="""
    SELECT event_id,
           -- json_valid guard: the engine's from_json returns NULL for
           -- malformed inner text; DuckDB json_extract raises
           -- (adversarial relational sweep)
           CASE WHEN json_valid(json_extract_string(
                  json_object('body', props), '$.body'))
                THEN CAST(json_extract(json_extract_string(
                       json_object('body', props), '$.body'), '$.k') AS BIGINT)
                END AS k
    FROM events WHERE event_id < 500
    """,
    tags=("A19", "B11"),
)
def nested_double_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-JSON-encoded payload decode — the reference's
    json.loads(json.loads(r.text)) pattern (reference
    clients/exclusion_requests.py:116,138): wrap props in an envelope
    whose body is a JSON *string*, then from_json twice — outer parse
    yields the inner JSON text, inner parse yields the typed struct."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    enveloped = ev.withColumn(
        "wire", F.to_json(F.struct(F.col("props").alias("body")))
    )
    outer = F.from_json(
        "wire", T.StructType([T.StructField("body", T.StringType())])
    )
    inner = F.from_json(
        outer["body"], T.StructType([T.StructField("k", T.LongType())])
    )
    return enveloped.select("event_id", inner["k"].alias("k"))


@register(
    "func_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(abs(l_extendedprice - 1000.0), 4) AS abs_delta,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil_q7,
           CAST(floor(sqrt(l_extendedprice)) AS BIGINT) AS floor_sqrt_p,
           ROUND(ln(l_extendedprice + 1.0), 6) AS ln_p,
           ROUND(pow(1.0 + l_discount, 3), 6) AS disc_cubed,
           CAST(l_partkey % 97 AS BIGINT) AS bucket97,
           CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign
    FROM lineitem WHERE l_orderkey < 1000
    """,
    tags=("B10",),
)
def func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar family (B10): abs/ceil/floor/sqrt/ln/pow/mod/sign —
    all codegen'd JVM expressions (arithmetic on measures, the
    reference's numeric-parse-only surface generalized)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 1000.0), 4).alias("abs_delta"),
        F.ceil(F.col("l_quantity") / 7.0).cast("long").alias("ceil_q7"),
        F.floor(F.sqrt("l_extendedprice")).cast("long").alias("floor_sqrt_p"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("ln_p"),
        F.round(F.pow(F.col("l_discount") + 1.0, 3), 6).alias("disc_cubed"),
        (F.col("l_partkey") % 97).cast("long").alias("bucket97"),
        F.signum(F.col("l_discount") - 0.05).cast("long").alias("disc_sign"),
    )


@register(
    "nested_variant_dynamic",
    oracle="""
    WITH src AS (
      SELECT event_id, event_type,
             TRY_CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '')
                      AS BIGINT) AS k
      FROM events WHERE event_id < 2000)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_objects,
           CAST(sum(CASE WHEN k % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_scalars,
           CAST(sum(k) AS BIGINT) AS sum_k
    FROM src GROUP BY event_type
    """,
    tags=("B11", "B15"),
)
def nested_variant_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType over a runtime-heterogeneous column — the
    engine-native generalization of the reference's dynamic type
    inference (A13, reference clients/dynamodb.py:51-72): even-k rows
    carry a JSON OBJECT {"k": n}, odd-k rows a bare JSON NUMBER, both
    parsed into ONE variant column with parse_json. Extraction is
    typed-at-read: try_variant_get('$.k') succeeds only on objects,
    try_variant_get('$') only on scalars, and coalescing the two
    recovers every value — no schema declared anywhere, exactly the
    open-schema ingest posture Variant exists for (binary-encoded,
    pushdown-capable at scale, unlike JSON strings). The oracle
    re-derives the same numbers from the branch arithmetic, so the
    variant path is fully value-checked."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    # nullif first: regexp_extract returns '' on no-match (malformed /
    # NULL-less props) and ANSI cast('') throws (adversarial sweep)
    k = F.nullif(
        F.regexp_extract("props", '"k": ([0-9]+)', 1), F.lit("")
    ).cast("long")
    payload = F.when(k % 2 == 0, F.col("props")).otherwise(k.cast("string"))
    v = F.parse_json(payload)
    k_obj = F.try_variant_get(v, "$.k", "long")
    k_scalar = F.try_variant_get(v, "$", "long")
    return (
        e.select(
            "event_type",
            k_obj.alias("ko"),
            k_scalar.alias("ks"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("ko").alias("n_objects"),
            F.count("ks").alias("n_scalars"),
            F.sum(F.coalesce(F.col("ko"), F.col("ks"))).alias("sum_k"),
        )
    )
