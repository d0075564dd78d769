"""At-scale AQE final-plan guard (VERDICT r9 next-round task #2): the
sf0.001 compile-time snapshots cannot see what AQE does at runtime,
and plan shape is scale-sensitive (the r9 probe-hint OOM was a plan
fine at sf0.1). Every heavy-set query's FINAL adaptive plan at sf1 —
plus the skew-split and above-cap-probe scenarios — must match the
committed normalized snapshot and the structural invariants:

- no CartesianProduct, no row-at-a-time Python after AQE re-planning;
- ``aqe_skew_probe``: the skew-join split ENGAGED (skew=true);
- ``atomic_above_cap_probe``: a >1M-key probe does NOT broadcast.

Intentional plan changes: python tools/plan_scale.py and review the
diff. Env-gated: needs /tmp/scaled/sf1 (tools/gen_scale.py).
"""

from __future__ import annotations

import difflib
import json
import os

import pytest

from tools.bench_scale10_lc import HEAVY
from tools.plan_scale import (
    FORBIDDEN,
    MUST_CONTAIN,
    MUST_NOT_CONTAIN,
    SCENARIOS,
    SF1,
    SNAPSHOT_PATH,
    final_adaptive_plan,
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF1),
    reason="sf1 fixture missing — python tools/gen_scale.py",
)

SNAPS = (
    json.load(open(SNAPSHOT_PATH)) if os.path.exists(SNAPSHOT_PATH) else {}
)


def _check(name: str, plan: str) -> None:
    for tok in FORBIDDEN:
        assert tok not in plan, f"{name}: forbidden {tok} in final plan"
    for tok in MUST_CONTAIN.get(name, ()):
        assert tok in plan, f"{name}: expected {tok} in final plan\n{plan}"
    for tok in MUST_NOT_CONTAIN.get(name, ()):
        assert tok not in plan, f"{name}: forbidden {tok}\n{plan}"
    assert name in SNAPS, (
        f"{name} missing from plan_snapshots_scale.json — run "
        f"tools/plan_scale.py"
    )
    if plan != SNAPS[name]:
        diff = "\n".join(
            difflib.unified_diff(
                SNAPS[name].splitlines(), plan.splitlines(),
                "snapshot", "current", lineterm="",
            )
        )
        raise AssertionError(
            f"FINAL adaptive plan of {name} changed at sf1 — if "
            f"intentional, run tools/plan_scale.py and review:\n{diff}"
        )


def test_scale_snapshot_covers_heavy_set():
    assert sorted(SNAPS) == sorted([*HEAVY, *SCENARIOS])


@pytest.mark.parametrize("name", HEAVY)
def test_heavy_final_plan_at_sf1(spark, name):
    from stupp_exclusion_etl_spark.plans import REGISTRY

    _check(name, final_adaptive_plan(REGISTRY[name].fn(spark, SF1)))


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_scale_scenario_final_plan(spark, name):
    _check(name, SCENARIOS[name](spark))
