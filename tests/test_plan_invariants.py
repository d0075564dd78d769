"""Engine-wide physical-plan invariants over EVERY registered query:

- no CartesianProduct (a non-broadcast cross join means an operator
  forgot its bucket/equi-join decomposition — at 100 TB that's a dead
  job, not a slow one);
- no BatchEvalPython (row-at-a-time Python UDF — the only sanctioned
  Python is Arrow-batched: MapInPandas / FlatMapGroupsInPandasWithState);
- every parquet scan prunes columns (ReadSchema never the full
  16-column lineitem when fewer are used).

Plans are compiled, not executed — this sweeps all queries in seconds.
"""

from __future__ import annotations

import pytest

from stupp_exclusion_etl_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMALL

# fn() of streaming queries executes a real streaming job; compile-only
# sweep skips them (their semantics are covered by dedicated tests).
_SKIP = (
    "stream_stateful_user_sessions",
    "stream_tumbling_micro_batch",
    "stream_atomic_upsert",
)

ALL = [n for n in sorted(REGISTRY) if n not in _SKIP]


@pytest.mark.parametrize("name", ALL)
def test_plan_invariants(spark, name):
    df = REGISTRY[name].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # full-width lineitem scans are always a pruning bug: no registered
    # query selects all 16 columns
    for line in plan.splitlines():
        if "ReadSchema" in line and "l_comment" in line and "l_shipmode" in line:
            raise AssertionError(f"unpruned lineitem scan in {name}: {line}")
