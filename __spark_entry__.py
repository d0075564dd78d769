"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``stupp_exclusion_etl_spark`` package;
this module only adapts its query registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stupp_exclusion_etl_spark.plans import REGISTRY, ordered_registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["flagship_code_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Dict order is the driver's sampling order: positions 1-50 are the
    curated ``DRIVER_WINDOW`` (every §2 component and every
    LLM-pipeline family represented by a full-oracle query; rows-only
    queries pushed past 50), the remaining queries follow in
    registration order."""
    return {name: q.fn for name, q in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-testable query; queries
    without an entry here (engine-specific sketches, true streaming)
    get the driver's rows-only check."""
    return {
        name: q.oracle
        for name, q in ordered_registry().items()
        if q.oracle is not None
    }
