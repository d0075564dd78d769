"""Physical-plan snapshot regression guard: every registered query's
compiled plan must equal the committed normalized snapshot. A failure
means the plan SHAPE changed — a dropped PushedFilters, a broadcast
that became a shuffle, a new exchange. If the change is intentional,
regenerate and review the diff:

    python tools/gen_plan_snapshots.py && git diff tests/plan_snapshots.json
"""

from __future__ import annotations

import difflib
import json
import os

import pytest

from stupp_exclusion_etl_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMALL
from tests.plan_guard import SKIP, SNAPSHOT_PATH, compiled_plan

_SNAPS_FILE = os.path.join(os.path.dirname(os.path.dirname(__file__)), SNAPSHOT_PATH)
with open(_SNAPS_FILE) as _fh:
    SNAPS = json.load(_fh)

ALL = [n for n in sorted(REGISTRY) if n not in SKIP]


def test_snapshot_covers_registry():
    """A new query must ship with its snapshot (regenerate the file)."""
    assert sorted(SNAPS) == ALL


@pytest.mark.parametrize("name", ALL)
def test_plan_matches_snapshot(spark, name):
    if name not in SNAPS:
        pytest.skip("covered by test_snapshot_covers_registry")
    current = compiled_plan(REGISTRY[name].fn(spark, SF_SMALL))
    if current != SNAPS[name]:
        diff = "\n".join(
            difflib.unified_diff(
                SNAPS[name].splitlines(),
                current.splitlines(),
                "snapshot",
                "current",
                lineterm="",
            )
        )
        raise AssertionError(
            f"physical plan of {name} changed — if intentional, run "
            f"tools/gen_plan_snapshots.py and review the diff:\n{diff}"
        )
