"""Empty-input robustness sweep: at 100 TB a partition-pruned or
freshly-created table is legitimately empty, and a query that crashes
on it (ANSI divide-by-zero, .first()[0] on nothing, None bounds) is a
production incident. Every registered query must either return an
empty/degenerate result or raise a deliberate, clearly-worded
ValueError — never an arbitrary exception."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL

from stupp_exclusion_etl_spark.plans import REGISTRY

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: Queries whose plan construction NEEDS data rows by design, with the
#: documented ValueError they must raise on empty input.
DATA_DEPENDENT = {
    "sim_pq_adc_topk": "need vec ids 1..16 as PQ seeds",
    "sim_ivf_pq_topk": "need vec ids 1..16 as PQ seeds",
    # building an ANN index over nothing is the documented refusal
    "sim_index_incremental": "empty corpus: nothing to index",
    "sim_index_batch_topk": "empty corpus: nothing to index",
}


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in TABLES:
        src = f"{SF_SMALL}/{t}.parquet"
        con.execute(
            f"COPY (SELECT * FROM '{src}' LIMIT 0) "
            f"TO '{d / t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(d)


@pytest.mark.slow  # round-exit tier (see pytest.ini)
def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name in sorted(REGISTRY):
        try:
            REGISTRY[name].fn(spark, empty_sf_dir).count()
        except ValueError as e:
            expected = DATA_DEPENDENT.get(name)
            if not (expected and expected in str(e)):
                failures.append(f"{name}: unexpected ValueError: {e}")
        except Exception as e:  # noqa: BLE001 — the sweep's whole point
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
    assert not failures, "\n".join(failures)
