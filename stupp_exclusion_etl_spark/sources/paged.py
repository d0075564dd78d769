"""Paginated custom connector with REAL filter pushdown — the
reference's core source operator (A1/A2: paginated DataTables POST with
per-column server-side search filters, reference
clients/exclusion_requests.py:78-90) implemented as a Spark Python
DataSource (pyspark.sql.datasource, Spark 4) instead of being delegated
to the built-in parquet reader.

Shape mirrors the remote-endpoint reality the reference deals with:

- **Pages are partitions.** ``partitions()`` carves the table into
  fixed-size row ranges (``page_size``); each Spark task fetches one
  page — the engine parallelizes what the reference's ``while`` loop
  serializes (A17's lesson applied to A1).
- **Filters are pushed INTO the fetch.** ``pushFilters`` accepts the
  eq/range/IN/null-check subset a DataTables-style endpoint can express
  server-side and re-yields the rest for Spark to evaluate; accepted
  filters become pyarrow dataset expressions evaluated inside
  ``read()``, so filtered-out rows never cross into the JVM — the same
  contract as the reference's ``columns[i].search.value`` payload
  field. Row groups that don't intersect a page are never read
  (metadata offsets), so pagination also prunes I/O.
- **Limit/TopN**: the Python DataSource API (4.1) has no limit-pushdown
  hook yet; A3/A4 pushdown parity lives on the parquet path
  (``topk_orders`` → TakeOrderedAndProject).

At 100 TB the identical class fronts the real paged HTTP/REST endpoint:
``read()`` swaps the parquet slice for a POST with the page offset and
the pushed filters serialized into the search payload; retries ride on
Spark task retries (A18).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


@dataclass
class _Page(InputPartition):
    index: int
    start: int  # inclusive row offset
    end: int  # exclusive row offset


class PagedDocumentsReader(DataSourceReader):
    """One reader instance per query; Spark calls pushFilters at plan
    time, then partitions(), then read(page) on executors."""

    #: Filter shapes a DataTables-style endpoint can evaluate
    #: server-side (single-column search terms).
    SUPPORTED = (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
        In,
        IsNotNull,
    )

    def __init__(self, options, schema) -> None:
        self.path = options["path"]
        self.page_size = int(options.get("page_size", 2000))
        self.pushed: list[Filter] = []

    def pushFilters(self, filters):  # noqa: N802 — API name
        for f in filters:
            if isinstance(f, self.SUPPORTED) and len(f.attribute) == 1:
                self.pushed.append(f)
            else:
                yield f  # Spark re-applies what the endpoint can't

    def _filter_expr(self):
        import pyarrow.dataset as pds

        expr = None
        for f in self.pushed:
            col = pds.field(f.attribute[0])
            if isinstance(f, EqualTo):
                e = col == f.value
            elif isinstance(f, GreaterThan):
                e = col > f.value
            elif isinstance(f, GreaterThanOrEqual):
                e = col >= f.value
            elif isinstance(f, LessThan):
                e = col < f.value
            elif isinstance(f, LessThanOrEqual):
                e = col <= f.value
            elif isinstance(f, In):
                e = col.isin(list(f.value))
            else:  # IsNotNull
                e = ~col.is_null()
            expr = e if expr is None else expr & e
        return expr

    def partitions(self):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).metadata.num_rows
        return [
            _Page(i, s, min(s + self.page_size, n))
            for i, s in enumerate(range(0, n, self.page_size))
        ] or [_Page(0, 0, 0)]

    def read(self, partition: _Page):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(self.path)
        meta = pf.metadata
        # Row-group pruning by page range: only groups intersecting
        # [start, end) are fetched — pagination prunes I/O too.
        groups, off = [], 0
        first_row = None
        for g in range(meta.num_row_groups):
            rows = meta.row_group(g).num_rows
            if off < partition.end and off + rows > partition.start:
                if first_row is None:
                    first_row = off
                groups.append(g)
            off += rows
        if not groups:
            return
        tbl = pf.read_row_groups(groups)
        tbl = tbl.slice(
            partition.start - first_row, partition.end - partition.start
        )
        expr = self._filter_expr()
        if expr is not None:
            tbl = tbl.filter(expr)
        yield from tbl.to_batches()


class PagedDocumentsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_documents"

    def schema(self) -> str:
        return DOCS_SCHEMA

    def reader(self, schema) -> PagedDocumentsReader:
        return PagedDocumentsReader(self.options, schema)


def register_paged_source(spark) -> None:
    """Idempotent registration (the driver's vanilla session has no
    sources pre-registered)."""
    spark.dataSource.register(PagedDocumentsDataSource)
