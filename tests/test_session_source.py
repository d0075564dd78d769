"""Auth-session connector (sources/session_client.py): CSRF handshake,
cookie gating, pagination, and the double-JSON decode."""

from __future__ import annotations

import json

import pytest

from tests.conftest import SF_SMALL

ORDERS = f"{SF_SMALL}/orders.parquet"


def test_portal_handshake_and_gating():
    from stupp_exclusion_etl_spark.sources.session_client import FakePortal

    p = FakePortal(ORDERS, page_size=300)
    token = p.login_page().split('value="')[1].split('"')[0]
    with pytest.raises(PermissionError):
        p.login("wrong-token", "etl", "x")
    cookie = p.login(token, "etl", "hunter2")
    with pytest.raises(PermissionError):
        p.fetch_page("stale-cookie", 0)
    body = p.fetch_page(cookie, 0)
    # wire body is double-encoded: one loads yields a STRING
    inner = json.loads(body)
    assert isinstance(inner, str)
    recs = json.loads(inner)
    assert isinstance(recs, list) and recs[0]["id"] == 0


def test_session_source_matches_orders(spark):
    from stupp_exclusion_etl_spark.sources.session_client import (
        register_session_source,
    )

    register_session_source(spark)
    df = (
        spark.read.format("session_filings")
        .option("path", ORDERS)
        .option("page_size", "300")
        .load()
    )
    # pagination: one partition per page
    import pyarrow.parquet as pq

    n = pq.ParquetFile(ORDERS).metadata.num_rows
    assert df.rdd.getNumPartitions() == (n + 299) // 300
    got = {r.id: (r.status, r.priority, r.total) for r in df.collect()}
    want = {
        r.o_orderkey: (r.o_orderstatus, r.o_orderpriority, r.o_totalprice)
        for r in spark.read.parquet(ORDERS).collect()
    }
    assert got == want
