"""The declared query surface.

Importing this package populates ``REGISTRY`` with every implemented
query (one per operator family from SURVEY.md §2). ``__spark_entry__``
exposes the registry to the driver harness.
"""

from stupp_exclusion_etl_spark.plans.registry import (
    DRIVER_WINDOW,
    REGISTRY,
    Query,
    ordered_registry,
    register,
)

# Import for registration side effects — order defines display order.
from stupp_exclusion_etl_spark.plans import core  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import joins  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import aggregates  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import windows  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import setops  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import nested  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import coercion  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import dedup  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import text  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import similarity  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import events  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import multimodal  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import subqueries  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import corpus  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import analytics  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import graph  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import profile  # noqa: E402,F401
from stupp_exclusion_etl_spark.plans import ml  # noqa: E402,F401

__all__ = ["DRIVER_WINDOW", "REGISTRY", "Query", "ordered_registry", "register"]
