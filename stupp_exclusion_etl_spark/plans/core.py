"""Core scan/filter/project/sort/limit plans (SURVEY.md §2 A1-A10, A17, B1-B3, B7).

Each plan is the Spark-idiomatic form of a reference behavior; the
reference hand-implements pushdown at its HTTP source
(reference clients/exclusion_requests.py:78-90), Catalyst derives the
same rewrites for free over parquet (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.plans._shared import CODES, r4, revenue
from stupp_exclusion_etl_spark.plans.registry import register

_CODES_SQL = ", ".join(str(c) for c in CODES)


@register(
    "flagship_code_revenue",
    oracle=f"""
    SELECT p.p_size AS code,
           CAST(count(*) AS BIGINT) AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_size IN ({_CODES_SQL})
    GROUP BY p.p_size
    ORDER BY revenue DESC, code
    LIMIT 10
    """,
    tags=("A1", "A2", "A3", "A4", "A12", "A17", "B5", "B7"),
)
def flagship_code_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core semantic in one statement: code-list scan
    fan-out (A17) + equality pushdown (A2) + enrichment join (A12) +
    aggregate + server-side top-K (A3+A4).

    Scale notes: the `part` side after the `isin` filter is small →
    broadcast hash join (no shuffle of lineitem); the aggregation is a
    partial (map-side) hash agg before the single shuffle on p_size;
    top-K plans as TakeOrderedAndProject, never a global sort.
    """
    part = table(spark, sf_dir, "part").filter(F.col("p_size").isin(CODES))
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_size").alias("code"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            r4(F.sum(revenue())).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("code"))
        .limit(10)
    )


@register(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    """,
    tags=("A1", "A5", "B1", "B2"),
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + filter reaching the parquet scan: ReadSchema prunes
    to 4 columns, PushedFilters carries the shipdate bound (A5/B1)."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "point_lookup",
    oracle="""
    SELECT o_orderkey AS ID, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey = 42
    """,
    tags=("A15", "B3"),
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by primary key — the DynamoDB hash-key read the
    reference's table layout exists for (reference __main__.py:45,
    SURVEY.md §1.3). Parquet row-group stats prune the scan."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 42)
        .select(
            F.col("o_orderkey").alias("ID"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
        )
    )


@register(
    "filter_eq",
    oracle="""
    SELECT p_partkey, p_name, p_type, p_size
    FROM part WHERE p_type = 'ECONOMY'
    """,
    tags=("A2", "B3"),
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality predicate — the reference pushes HTSUSCode equality into
    its remote payload (reference clients/exclusion_requests.py:81-82);
    Catalyst pushes ours into parquet."""
    return (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey", "p_name", "p_type", "p_size")
    )


@register(
    "filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_discount > 0.05
      AND l_shipdate < TIMESTAMP '1998-01-01'
    """,
    tags=("B3",),
)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric + date range predicates — the thickness/diameter interval
    query surface implied by the reference's GSIs (__main__.py:40-43)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & (F.col("l_discount") > 0.05)
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "filter_in",
    oracle=f"""
    SELECT p_size AS code, CAST(count(*) AS BIGINT) AS n_parts
    FROM part WHERE p_size IN ({_CODES_SQL})
    GROUP BY p_size
    """,
    tags=("A17", "B3"),
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list scan: the reference's 83-way serial fan-out
    (reference __main__.py:47-48) as one partitioned filter."""
    return (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size").isin(CODES))
        .groupBy(F.col("p_size").alias("code"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


@register(
    "filter_like_regex",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE '%bolt%' AND regexp_matches(p_brand, '^Brand#1[0-9]$')
    """,
    tags=("B3", "B10"),
)
def filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String LIKE + regex predicates (B3)."""
    return (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%") & F.col("p_brand").rlike("^Brand#1[0-9]$"))
        .select("p_partkey", "p_name", "p_brand")
    )


@register(
    "filter_null_and_empty",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS priority
    FROM orders
    WHERE NULLIF(o_orderpriority, '4-NOT SPECIFIED') IS NOT NULL
      AND length(o_orderstatus) > 0
    """,
    tags=("A8", "B3"),
)
def filter_null_and_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-check + empty-value filter — the reference drops pairs whose
    stringified value is empty (reference clients/exclusion_requests.py:158)."""
    o = table(spark, sf_dir, "orders").withColumn(
        "priority", F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED"))
    )
    return o.filter(
        F.col("priority").isNotNull() & (F.length("o_orderstatus") > 0)
    ).select("o_orderkey", "priority")


@register(
    "project_rename_literal",
    oracle="""
    SELECT o_orderkey AS ID,
           o_totalprice AS total,
           'https://example.invalid/orders/' || CAST(o_orderkey AS VARCHAR) AS URL
    FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("A7", "A9", "A10", "B2"),
)
def project_rename_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename + drop + derived literal column: the reference strips key
    prefixes (A7, clients/exclusion_requests.py:45-48), deletes the
    CSRF token column (A9, :161-164) and adds a URL column (A10, :160)."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .withColumnRenamed("o_orderkey", "ID")
        .withColumn(
            "URL",
            F.concat(F.lit("https://example.invalid/orders/"), F.col("ID").cast("string")),
        )
        .select("ID", F.col("o_totalprice").alias("total"), "URL")
    )


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("A3", "A4", "B7"),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort+limit pushdown (A3/A4): plans as TakeOrderedAndProject —
    per-partition top-K then a single merge, no global sort shuffle."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "ingest_normalize_attrs",
    oracle="""
    SELECT p_partkey AS ID,
           p_name AS name,
           p_retailprice AS price,
           'https://example.test/part/' || CAST(p_partkey AS VARCHAR) AS URL
    FROM part
    WHERE p_retailprice > 0
    """,
    tags=("A6", "A7", "A8", "A9", "A10"),
)
def ingest_normalize_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scrape-normalization path end-to-end over a
    map<string,string> record column (sources.ingest): build raw attrs
    with prefixed keys ('BIS232Request.Name'), a CSRF token, and empty
    values — then strip prefixes (A7, transform_keys), drop the token
    (A9) and empties (A8, map_filter), keep URL provenance (A10), and
    promote entries back to typed columns with guarded casts
    (reference clients/exclusion_requests.py:39-54,153-165)."""
    from pyspark.sql import types as T

    from stupp_exclusion_etl_spark.sources.ingest import normalize_attrs, promote

    p = table(spark, sf_dir, "part")
    raw = p.select(
        F.create_map(
            F.lit("BIS232Request.ID"), F.col("p_partkey").cast("string"),
            F.lit("BIS232Request.Name"), F.col("p_name"),
            F.lit("JSONData.Price"), F.col("p_retailprice").cast("string"),
            F.lit("__RequestVerificationToken"), F.lit("tok-123"),
            F.lit("Comment"), F.lit(""),  # empty → dropped by A8
        ).alias("attrs"),
        F.concat(
            F.lit("https://example.test/part/"), F.col("p_partkey").cast("string")
        ).alias("URL"),
    )
    norm = normalize_attrs(raw, "attrs", "URL")
    typed = promote(
        norm,
        "attrs",
        {"ID": T.LongType(), "Name": T.StringType(), "Price": T.DoubleType()},
    )
    return typed.filter(F.col("Price") > 0).select(
        "ID", F.col("Name").alias("name"), F.col("Price").alias("price"), "URL"
    )


@register(
    "ingest_html_form_parse",
    oracle="""
    WITH g AS (
      SELECT o_orderkey,
             coalesce(CAST(o_custkey AS VARCHAR), 'None') AS ck_g,
             coalesce(o_orderpriority, 'None') AS pr_g,
             coalesce(o_orderstatus, 'None') AS st_g
      FROM orders)
    SELECT o_orderkey AS id,
           ck_g AS customer_id,
           NULLIF(pr_g, '') AS priority,
           -- empty pairs drop BEFORE the last-wins fold (reference
           -- :158 then :159), so '' status falls back to the earlier
           -- STALE input instead of erasing the key
           CASE WHEN st_g = '' THEN 'STALE' ELSE st_g END AS status,
           NULLIF(st_g, '') AS untitled3,
           'None' AS missing_value,
           CAST(NULL AS VARCHAR) AS empty_absent,
           NULLIF(pr_g, '') AS notes,
           'None' AS empty_notes,
           'https://example.invalid/detail/' || CAST(o_orderkey AS VARCHAR) AS url
    FROM g
    """,
    tags=("A6", "A7", "A8", "A9", "A10"),
)
def ingest_html_form_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's HTML form scrape (A6) as a pure-Catalyst parser:
    each order is rendered to a deterministic detail-page form (input
    tags exercising every key/value rule: title/name/Untitled-idx keys,
    prefixed keys, a CSRF token, an empty value, a missing value attr,
    a duplicate key, padded textarea text), then
    sources.ingest.parse_form_inputs inverts it back to a
    map<string,string> record (reference clients/exclusion_requests.py:
    39-54,153-165). The oracle computes the expected inversion directly
    from the source columns, so a hash match proves the parser is an
    exact inverse of the generator — including the 'None'/empty/token/
    last-wins quirks.

    Scale notes: generation+parse+promotion is one narrow map stage —
    no shuffle, no UDF, whole-stage codegen end to end."""
    from stupp_exclusion_etl_spark.sources.ingest import parse_form_inputs

    o = table(spark, sf_dir, "orders")
    # NULL source fields render as str(None) = 'None', like the
    # reference's str()-based pipeline — and so a NULL column can never
    # NULL out the whole concat'd document (adversarial sweep finding).
    ck = F.coalesce(F.col("o_custkey").cast("string"), F.lit("None"))
    pr = F.coalesce(F.col("o_orderpriority"), F.lit("None"))
    st = F.coalesce(F.col("o_orderstatus"), F.lit("None"))
    html = F.concat(
        F.lit('<form><input title="BIS232Request.CustomerId" value="'), ck,
        F.lit('"/><input name="Priority" value="'), pr,
        F.lit('"/><input title="Status" value="STALE"/>'),
        F.lit('<input value="'), st,
        F.lit('"/><input title="MissingValue"/>'),
        F.lit('<input title="Empty" value=""/>'),
        F.lit('<input title="__RequestVerificationToken" value="tok-abc"/>'),
        F.lit('<input title="JSONData.Status" value="'), st,
        F.lit('"/><textarea title="BIS232Objection.Notes">  '),
        pr,
        F.lit(" </textarea><textarea title=\"EmptyNotes\"></textarea></form>"),
    )
    url = F.concat(
        F.lit("https://example.invalid/detail/"), F.col("o_orderkey").cast("string")
    )
    parsed = o.select(
        F.col("o_orderkey").alias("id"),
        parse_form_inputs(html, url).alias("rec"),
    )
    g = lambda k: F.try_element_at(F.col("rec"), F.lit(k))  # noqa: E731
    return parsed.select(
        "id",
        g("CustomerId").alias("customer_id"),
        g("Priority").alias("priority"),
        g("Status").alias("status"),
        g("Untitled3").alias("untitled3"),
        g("MissingValue").alias("missing_value"),
        g("Empty").alias("empty_absent"),
        g("Notes").alias("notes"),
        g("EmptyNotes").alias("empty_notes"),
        g("URL").alias("url"),
    )


@register(
    "source_paged_filter_pushdown",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE lang = 'en' AND n_chars >= 200 AND source IN ('src1', 'src2', 'src3')
    """,
    tags=("A1", "A2", "A17", "B1", "B3"),
)
def source_paged_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's paginated scan-with-pushdown (A1/A2) as a REAL
    custom connector, not a parquet delegation: a Spark 4 Python
    DataSource whose partitions are pages (each task fetches one page —
    parallelized pagination, A17) and whose pushFilters() consumes the
    eq/range/IN predicate set a DataTables-style endpoint evaluates
    server-side (sources/paged.py; reference
    clients/exclusion_requests.py:78-90). The physical plan is a bare
    BatchScan with NO Filter node above it — Spark dropped the
    predicates because the source proved it handles them
    (tests/test_paged_source.py pins that plan shape)."""
    from stupp_exclusion_etl_spark.sources.paged import register_paged_source

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register_paged_source(spark)
    df = (
        spark.read.format("paged_documents")
        .option("path", f"{sf_dir}/documents.parquet")
        .option("page_size", "1500")
        .load()
    )
    return df.filter(
        (F.col("lang") == "en")
        & (F.col("n_chars") >= 200)
        & F.col("source").isin("src1", "src2", "src3")
    ).select("doc_id", "lang", "source", "n_chars")


@register(
    "source_session_double_json",
    oracle="""
    SELECT o_orderkey AS id,
           o_orderstatus AS status,
           o_orderpriority AS priority,
           o_totalprice AS total
    FROM orders
    """,
    tags=("A19", "A18", "A1", "B1"),
)
def source_session_double_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's authenticated-session source (A19) as a real
    connector: CSRF-login handshake once on the driver, session cookie
    shipped to executors, one paged authenticated fetch per partition,
    and the double json.loads decode of the wire body
    (sources/session_client.py; reference
    clients/exclusion_requests.py:56-75,109-117). The portal is an
    in-process deterministic emulation backed by the orders table (no
    network in this container), so the whole login→fetch→decode→type
    path is oracle-checked; unauthenticated fetches raise (pinned in
    tests/test_session_source.py)."""
    from stupp_exclusion_etl_spark.sources.session_client import (
        register_session_source,
    )

    register_session_source(spark)
    return (
        spark.read.format("session_filings")
        .option("path", f"{sf_dir}/orders.parquet")
        .option("page_size", "1200")
        .load()
    )
