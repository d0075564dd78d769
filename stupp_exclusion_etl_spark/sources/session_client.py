"""Authenticated-session source connector (A19) — the reference's
CSRF-login + cookie-session + double-JSON-encoded POST handlers
(reference clients/exclusion_requests.py:56-75 login, :109-117/:131-139
GetMyOFs/GetMySRs with ``json.loads(json.loads(r.text))``) implemented
as a Spark Python DataSource against an in-process fake portal.

The container has no network, so the PORTAL is a deterministic local
emulation (``FakePortal``: login page with embedded CSRF token →
credential POST → session cookie → paged handler responses that are
double-JSON-encoded, exactly the reference's wire quirk). Every
CONNECTOR concern is real and tested:

- the login handshake runs ONCE on the driver (parse CSRF out of the
  login page, POST it back, hold the session cookie) — the reference's
  ``login()`` flow;
- the cookie ships to executors inside the reader (session reuse across
  page fetches, like one ``requests.Session`` across the scrape);
- each partition fetches one page through the authenticated handler;
  an invalid/expired cookie raises — and Spark task retries (A18)
  re-run the fetch, not the login;
- the response body is decoded with the double ``json.loads`` the
  reference needs (A19's signature quirk), then typed.

At 100 TB / production the FakePortal swaps for the real HTTPS
endpoint: ``_login`` does the two requests, ``fetch_page`` the POST;
nothing else changes. Data is derived from the orders table so the
whole path is oracle-checkable.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FILINGS_SCHEMA = "id bigint, status string, priority string, total double"


class FakePortal:
    """Deterministic stand-in for the exclusion portal: CSRF-token
    login -> cookie -> paged, double-JSON-encoded handler responses
    backed by the orders parquet."""

    def __init__(self, orders_path: str, page_size: int = 1000):
        self.orders_path = orders_path
        self.page_size = page_size
        self._salt = hashlib.md5(orders_path.encode()).hexdigest()[:8]
        self._table = None  # lazy per-process cache (never pickled)

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_table"] = None  # the cached table must not ship to tasks
        return state

    # -- the two login round-trips (reference :56-75) ----------------------
    def login_page(self) -> str:
        token = hashlib.md5(f"csrf:{self._salt}".encode()).hexdigest()
        return (
            '<form action="/login"><input name="__RequestVerificationToken" '
            f'value="{token}"/></form>'
        )

    def login(self, csrf_token: str, user: str, password: str) -> str:
        want = hashlib.md5(f"csrf:{self._salt}".encode()).hexdigest()
        if csrf_token != want or not user:
            raise PermissionError("bad CSRF token or credentials")
        return hashlib.md5(f"cookie:{self._salt}:{user}".encode()).hexdigest()

    # -- the authenticated paged handler (reference :109-117) --------------
    def n_pages(self) -> int:
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.orders_path).metadata.num_rows
        return max(1, (n + self.page_size - 1) // self.page_size)

    def _load(self):
        # One read+sort per PROCESS, not per page fetch (a task serves
        # one page, so this is one read per task — the local-emulation
        # floor; the production portal is a remote server where each
        # fetch is O(page) server-side). Code review r3.
        if self._table is None:
            import pyarrow.parquet as pq

            self._table = pq.read_table(
                self.orders_path,
                columns=["o_orderkey", "o_orderstatus", "o_orderpriority",
                         "o_totalprice"],
            ).sort_by("o_orderkey")
        return self._table

    def fetch_page(self, cookie: str, page: int) -> str:
        if cookie != hashlib.md5(
            f"cookie:{self._salt}:etl".encode()
        ).hexdigest():
            raise PermissionError("not logged in")
        t = self._load()
        sl = t.slice(page * self.page_size, self.page_size)
        records = [
            {
                "id": sl.column(0)[i].as_py(),
                "status": sl.column(1)[i].as_py(),
                "priority": sl.column(2)[i].as_py(),
                "total": sl.column(3)[i].as_py(),
            }
            for i in range(sl.num_rows)
        ]
        # the reference's wire quirk: the JSON body is itself a JSON
        # string -> consumers need json.loads(json.loads(text))
        return json.dumps(json.dumps(records))


@dataclass
class _PagePart(InputPartition):
    page: int


class SessionFilingsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.portal = FakePortal(
            options["path"], int(options.get("page_size", 1000))
        )
        # A19 handshake, ONCE, driver-side: parse the CSRF token out of
        # the login page and post it back for the session cookie.
        page = self.portal.login_page()
        token = page.split('value="')[1].split('"')[0]
        self.cookie = self.portal.login(token, "etl", "hunter2")

    def partitions(self):
        return [_PagePart(p) for p in range(self.portal.n_pages())]

    def read(self, partition: _PagePart):
        body = self.portal.fetch_page(self.cookie, partition.page)
        for rec in json.loads(json.loads(body)):  # the double decode
            yield (
                rec["id"],
                rec["status"],
                rec["priority"],
                float(rec["total"]) if rec["total"] is not None else None,
            )


class SessionFilingsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "session_filings"

    def schema(self) -> str:
        return FILINGS_SCHEMA

    def reader(self, schema) -> SessionFilingsReader:
        return SessionFilingsReader(self.options)


def register_session_source(spark) -> None:
    spark.dataSource.register(SessionFilingsDataSource)
