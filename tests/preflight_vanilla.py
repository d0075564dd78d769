"""Pre-flight: run every registered query under a VANILLA SparkSession
(no session.py tuning — mimics the driver's environment) at sf0.01 and
compare against the DuckDB oracle with the strict local harness.

Usage:  python tests/preflight_vanilla.py [sf_dir]

Exits non-zero if any query fails; prints a one-line verdict per query.
This is the repo-side rehearsal for CORRECTNESS_r{N}.json (VERDICT.md
round-1 item 1: the driver runs a vanilla session, so parity must not
depend on our tuned session config).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from tests import harness


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("preflight-vanilla")
        .getOrCreate()
    )
    from stupp_exclusion_etl_spark.plans import REGISTRY

    failures: dict[str, list[str]] = {}
    t0 = time.time()
    for name in sorted(REGISTRY):
        t = time.time()
        try:
            problems = harness.check(spark, sf_dir, name)
        except Exception:
            problems = ["exception:\n" + traceback.format_exc()]
        status = "ok" if not problems else "FAIL"
        print(f"{status:4s} {name:40s} {time.time() - t:6.2f}s", flush=True)
        if problems:
            failures[name] = problems
    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} green in {time.time() - t0:.0f}s")
    for name, problems in failures.items():
        print(f"\n=== {name} ===")
        for p in problems[:3]:
            print(p)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
