"""The paginated Python DataSource (sources/paged.py): pushdown
contract, pagination-as-partitions, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture()
def paged(spark):
    from stupp_exclusion_etl_spark.sources.paged import register_paged_source

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register_paged_source(spark)

    def load(page_size=200, sf=SF_SMALL):
        return (
            spark.read.format("paged_documents")
            .option("path", f"{sf}/documents.parquet")
            .option("page_size", str(page_size))
            .load()
        )

    return load


def test_pushfilters_partitions_supported_from_unsupported():
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        In,
        IsNotNull,
        StringContains,
    )

    from stupp_exclusion_etl_spark.sources.paged import PagedDocumentsReader

    r = PagedDocumentsReader({"path": "unused"}, None)
    unsupported = list(
        r.pushFilters(
            [
                EqualTo(("lang",), "en"),
                GreaterThanOrEqual(("n_chars",), 10),
                In(("source",), ("src1", "src2")),
                IsNotNull(("text",)),
                StringContains(("text",), "foo"),  # endpoint can't do this
            ]
        )
    )
    assert [type(f).__name__ for f in unsupported] == ["StringContains"]
    assert len(r.pushed) == 4


def test_pages_become_partitions_and_rows_survive(spark, paged):
    df = paged(page_size=120)
    total = df.count()
    import duckdb

    want = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMALL}/documents.parquet'"
    ).fetchone()[0]
    assert total == want
    n_parts = df.rdd.getNumPartitions()
    assert n_parts == (want + 119) // 120  # one task per page


def test_pushed_filter_leaves_no_filter_node(spark, paged):
    from tests.harness import plan_str

    import re

    q = paged().filter((F.col("lang") == "en") & (F.col("n_chars") >= 100))
    plan = plan_str(q)
    # the source handled every predicate: no Filter OPERATOR above the
    # scan (the formatted plan always prints "RuntimeFilters: []", so
    # match the node form, not the substring)
    assert not re.search(r"\bFilter \(\d+\)", plan), plan
    rows = q.collect()
    import duckdb

    want = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMALL}/documents.parquet' "
        "WHERE lang = 'en' AND n_chars >= 100"
    ).fetchone()[0]
    assert len(rows) == want
    assert all(r.lang == "en" and r.n_chars >= 100 for r in rows)


def test_unsupported_residual_is_reapplied_by_spark(spark, paged):
    from tests.harness import plan_str

    import re

    q = paged().filter(
        (F.col("lang") == "en") & F.col("text").contains("the")
    )
    plan = plan_str(q)
    # residual Contains stays JVM-side as a real Filter node
    assert re.search(r"\bFilter \(\d+\)", plan), plan
    assert "Contains" in plan
    import duckdb

    want = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMALL}/documents.parquet' "
        "WHERE lang = 'en' AND contains(text, 'the')"
    ).fetchone()[0]
    assert q.count() == want
