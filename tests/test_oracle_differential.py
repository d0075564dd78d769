"""The primary correctness gate: every registered query vs its DuckDB
oracle at sf0.001 (fast) — mirrors the driver's sf0.01 comparison."""

from __future__ import annotations

import pytest

from stupp_exclusion_etl_spark.plans import REGISTRY
from tests.harness import check

ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_dir, name):
    problems = check(spark, sf_dir, name)
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.slow  # round-exit tier (see pytest.ini)
def test_every_query_has_rows(spark, sf_dir):
    """Smoke: queries should produce ≥1 row at sf0.001 so the
    comparison is meaningful (empty-vs-empty passes trivially)."""
    empty = []
    for name, q in REGISTRY.items():
        if name in ("dedup_minhash_lsh", "dedup_ngram_jaccard", "join_anti"):
            continue  # legitimately near-empty on tiny random data
        n = q.fn(spark, "/root/testdata/sf0.001").count()
        if n == 0:
            empty.append(name)
    assert not empty, f"queries returned 0 rows: {empty}"
