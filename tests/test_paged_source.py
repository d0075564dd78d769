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


def test_datasource_api_surface_canary(spark, paged, tmp_path):
    """SPARK-CONTRACT CANARY (VERDICT r11 task #7 — the CDC canary
    discipline applied to the batch source). The paged connector's
    documented gap — no Limit/TopN pushdown (sources/paged.py module
    docstring) — is an API limitation of pyspark 4.1.x's Python
    DataSource, not a choice. Pin the observed contract so a pyspark
    bump that changes it fails HERE with a pointed message:

      1. DataSourceReader's overridable surface is exactly
         {partitions, pushFilters, read} — if a bump adds a
         limit/TopN/column-pruning hook (pushLimit, pushTopN,
         pruneColumns...), implement it in PagedDocumentsReader and
         update the module docstring before re-pinning;
      2. with filterPushdown enabled, the engine calls pushFilters at
         PLAN time, BEFORE partitions(), and hands the supported
         conjuncts over (observed via an instrumented run);
      3. a LIMIT over the source still plans every page partition —
         the observable consequence of the missing hook (if this
         starts pruning, the engine learned limit pushdown: claim
         it)."""
    import json
    import os

    from pyspark.sql.datasource import DataSource, DataSourceReader

    hooks = {m for m in dir(DataSourceReader) if not m.startswith("_")}
    assert hooks == {"partitions", "pushFilters", "read"}, (
        f"pyspark DataSourceReader surface changed: {sorted(hooks)} — "
        "a new pushdown hook is available; implement it in "
        "sources/paged.py (Limit/TopN was API-blocked, r11 VERDICT "
        "What's-missing #1) and re-pin this canary"
    )

    log = str(tmp_path / "calls.jsonl")

    from stupp_exclusion_etl_spark.sources.paged import (
        DOCS_SCHEMA,
        PagedDocumentsReader,
    )

    class _CanaryReader(PagedDocumentsReader):
        def _log(self, event):
            with open(log, "a") as fh:
                fh.write(json.dumps(event) + "\n")

        def pushFilters(self, filters):  # noqa: N802
            filters = list(filters)
            self._log({
                "call": "pushFilters",
                "n": len(filters),
                "types": sorted(type(f).__name__ for f in filters),
            })
            return super().pushFilters(filters)

        def partitions(self):
            parts = super().partitions()
            self._log({"call": "partitions", "n": len(parts)})
            return parts

    class _CanarySource(DataSource):
        @classmethod
        def name(cls):
            return "paged_documents_canary"

        def schema(self):
            return DOCS_SCHEMA

        def reader(self, schema):
            return _CanaryReader(self.options, schema)

    spark.dataSource.register(_CanarySource)
    df = (
        spark.read.format("paged_documents_canary")
        .option("path", f"{SF_SMALL}/documents.parquet")
        .option("page_size", "100")
        .load()
        .filter(F.col("lang") == "en")
    )
    n_filtered = df.count()
    assert n_filtered > 0
    calls = [json.loads(l) for l in open(log)]
    names = [c["call"] for c in calls]
    assert "pushFilters" in names, (
        "engine no longer calls pushFilters — paged.py's server-side "
        "filter contract is dead on this pyspark"
    )
    assert names.index("pushFilters") < names.index("partitions"), (
        "pushFilters no longer precedes partitions() at plan time"
    )
    pf = calls[names.index("pushFilters")]
    assert pf["n"] >= 1 and "EqualTo" in pf["types"], pf

    # 3: LIMIT still plans every page — the missing-hook consequence
    os.unlink(log)
    total_rows = 500  # sf0.001 documents
    (
        spark.read.format("paged_documents_canary")
        .option("path", f"{SF_SMALL}/documents.parquet")
        .option("page_size", "100")
        .load()
        .limit(3)
        .collect()
    )
    calls = [json.loads(l) for l in open(log)]
    parts = [c for c in calls if c["call"] == "partitions"]
    assert parts and parts[-1]["n"] == -(-total_rows // 100), (
        "LIMIT changed the planned partition count — pyspark may have "
        "gained limit pushdown for Python sources; implement it in "
        "sources/paged.py and update the A3/A4 parity note"
    )
