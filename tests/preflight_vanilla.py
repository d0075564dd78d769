"""Pre-flight: run every registered query under a VANILLA SparkSession
(no session.py tuning — mimics the driver's environment) at sf0.01 and
compare against the DuckDB oracle with the strict local harness.

Usage:  python tests/preflight_vanilla.py [sf_dir] [--out PREFLIGHT.json]
            [--master MASTER]

``--master local-cluster[4,8,8192]`` runs the identical sweep with
REAL executor processes (separate JVMs, real serialization, real
shuffle transport, python workers spawned by executors) — the
distributed-execution rehearsal (VERDICT r7 next-round #1): Python
DataSources under remote pickling, broadcasts over a real transport,
Arrow pandas-UDF batches crossing process boundaries. PYTHONPATH is
propagated to executor python workers via spark.executorEnv.

Exits non-zero if any query fails; prints a one-line verdict per query
and (with --out, default PREFLIGHT_r03.json at the repo root) writes a
driver-format JSON — the same per-query record shape as
CORRECTNESS_r{N}.json but over ALL registered queries, not just the
50-slot window — so the judge can diff self-reported vs driver signal
(VERDICT r2, Next round #4).

This is the repo-side rehearsal for CORRECTNESS_r{N}.json (VERDICT.md
round-1 item 1: the driver runs a vanilla session, so parity must not
depend on our tuned session config).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession

from tests import harness


def main() -> int:
    argv = sys.argv[1:]
    out_path = os.path.join(REPO, "PREFLIGHT_r03.json")
    master = "local[32]"
    positional: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--out" and i + 1 < len(argv):
            out_path = argv[i + 1]
            i += 2  # consume the value too — it is NOT the sf_dir
        elif argv[i] == "--master" and i + 1 < len(argv):
            master = argv[i + 1]
            i += 2
        else:
            positional.append(argv[i])
            i += 1
    sf_dir = positional[0] if positional else "/root/testdata/sf0.01"
    builder = (
        SparkSession.builder.master(master)
        .appName("preflight-vanilla")
    )
    if master.startswith("local-cluster"):
        # executor JVMs spawn their own python workers; they need the
        # repo importable to unpickle DataSources/UDF closures that
        # reference package modules
        builder = builder.config(
            "spark.executorEnv.PYTHONPATH",
            REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
    spark = builder.getOrCreate()
    from stupp_exclusion_etl_spark.plans import REGISTRY, ordered_registry

    failures: dict[str, list[str]] = {}
    records: dict[str, dict] = {}
    t0 = time.time()
    # Driver sampling order (window first), so positions here mirror
    # what CORRECTNESS_r{N}.json will sample.
    for name in ordered_registry():
        t = time.time()
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            spark_pdf, oracle_pdf = harness.run_query(spark, sf_dir, name)
            rec["spark_rows"] = len(spark_pdf)
            if oracle_pdf is None:
                rec["err"] = "no_oracle"
                problems = (
                    [] if len(spark_pdf) > 0 else ["rows-only query returned 0 rows"]
                )
            else:
                rec["oracle_rows"] = len(oracle_pdf)
                problems = harness.compare(spark_pdf, oracle_pdf)
                rec["rows_match"] = len(spark_pdf) == len(oracle_pdf)
                rec["schema_match"] = sorted(spark_pdf.columns) == sorted(
                    oracle_pdf.columns
                )
                # strict cell-equality pass implies the driver's
                # value-hash match
                rec["hash_match"] = not problems
        except Exception:
            problems = ["exception:\n" + traceback.format_exc()]
            rec["err"] = "exception"
        records[name] = rec
        status = "ok" if not problems else "FAIL"
        print(f"{status:4s} {name:40s} {time.time() - t:6.2f}s", flush=True)
        if problems:
            failures[name] = problems
    print(
        f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} green "
        f"in {time.time() - t0:.0f}s"
    )
    with open(out_path, "w") as fh:
        json.dump(records, fh, indent=2)
    print(f"wrote {out_path}")
    for name, problems in failures.items():
        print(f"\n=== {name} ===")
        for p in problems[:3]:
            print(p)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
