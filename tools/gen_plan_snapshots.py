#!/usr/bin/env python
"""(Re)generate tests/plan_snapshots.json — the committed normalized
physical plan of every registered query at sf0.001 under the pinned
test session config. Run ONLY when a plan change is intentional, then
review the diff like code:

    python tools/gen_plan_snapshots.py
    git diff tests/plan_snapshots.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from stupp_exclusion_etl_spark.plans.registry import REGISTRY  # noqa: E402
from stupp_exclusion_etl_spark.session import get_spark  # noqa: E402
from tests.plan_guard import SKIP, SNAPSHOT_PATH, compiled_plan  # noqa: E402

SF = "/root/testdata/sf0.001"


def main() -> None:
    # identical config to the tests/conftest.py session fixture —
    # plan shape depends on cores/shuffle partitions
    spark = get_spark(app_name="gen-plan-snapshots", cpus=8, shuffle_partitions=8)
    snaps = {}
    for name in sorted(REGISTRY):
        if name in SKIP:
            continue
        df = REGISTRY[name].fn(spark, SF)
        snaps[name] = compiled_plan(df)
    out = os.path.join(REPO, SNAPSHOT_PATH)
    with open(out, "w") as fh:
        json.dump(snaps, fh, indent=1, sort_keys=True)
    print(f"wrote {len(snaps)} plan snapshots to {out}")


if __name__ == "__main__":
    main()
