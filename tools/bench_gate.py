#!/usr/bin/env python
"""Cross-round bench regression gate (VERDICT r6 directed task #5).

The median-of-3 tiers made bench numbers stable; this tool makes them
ENFORCEABLE: diff a new bench_detail.json against a previous round's
committed copy and fail on a warm-tier regression for queries whose
PHYSICAL PLAN did not change — using the committed normalized plan
snapshot (tests/plan_snapshots.json) as the "unchanged" key, so a
deliberate plan change (new operator shape, reviewed via
gen_plan_snapshots) never false-positives, and a silent slowdown on an
identical plan always trips.

A query regresses when BOTH hold (ratio alone flags sub-second jitter;
absolute alone flags big queries' noise):

    new_warm > old_warm * --ratio     (default 1.25)
    new_warm - old_warm > --floor     (default 0.30 s)

Usage:
    python tools/bench_gate.py --old-ref <git-ref> [--new-ref <git-ref>]
        [--ratio 1.25] [--floor 0.30]

`--old-ref` is a commit containing the baseline bench_detail.json +
tests/plan_snapshots.json (e.g. the previous round's final commit).
Without --new-ref the working tree's files are the candidate. Exits 1
on any regression; prints a one-line JSON summary either way.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(ref: str | None, rel: str) -> dict:
    if ref is None:
        with open(os.path.join(REPO, rel)) as fh:
            return json.load(fh)
    out = subprocess.run(
        ["git", "-C", REPO, "show", f"{ref}:{rel}"],
        capture_output=True, text=True,
    )
    if out.returncode != 0:  # file absent at that ref (pre-r6 snapshots)
        return {}
    return json.loads(out.stdout)


def gate(
    old_detail: dict,
    new_detail: dict,
    old_snaps: dict,
    new_snaps: dict,
    ratio: float,
    floor: float,
    allow: list[str] | None = None,
) -> dict:
    old_warm = old_detail.get("queries_warm", {})
    new_warm = new_detail.get("queries_warm", {})
    plan_baseline = "old-ref"
    if not old_snaps:
        # the baseline ref predates the snapshot guard: every common
        # query is gated (strictest fallback — a deliberate plan change
        # since then must be justified by the numbers, not skipped)
        old_snaps = new_snaps
        plan_baseline = "candidate-only"
    allow = set(allow or ())
    unchanged, changed_plans, regressions, improvements = [], [], [], []
    allowed_hits = []
    for name in sorted(set(old_warm) & set(new_warm)):
        if old_snaps.get(name) != new_snaps.get(name):
            changed_plans.append(name)
            continue
        unchanged.append(name)
        ow, nw = old_warm[name], new_warm[name]
        if nw > ow * ratio and nw - ow > floor:
            hit = {"query": name, "old_warm": ow, "new_warm": nw,
                   "ratio": round(nw / max(ow, 1e-9), 2)}
            (allowed_hits if name in allow else regressions).append(hit)
        elif ow > nw * ratio and ow - nw > floor:
            improvements.append(
                {"query": name, "old_warm": ow, "new_warm": nw,
                 "ratio": round(nw / max(ow, 1e-9), 2)}
            )
    # a single-shot baseline (pre-r6 bench protocol, no `reps` field)
    # is exactly the noise the median-of-3 tiers were introduced to
    # kill (VERDICT r5 task #4): its comparisons are ADVISORY — printed
    # but not enforced. Median-vs-median rounds enforce.
    enforced = (old_detail.get("reps") or 1) >= 2
    return {
        "metric": "bench_gate",
        "plan_baseline": plan_baseline,
        "enforced": enforced,
        "compared": len(unchanged),
        "plan_changed_skipped": changed_plans,
        "regressions": regressions,
        "allowed_regressions": allowed_hits,
        "improvements": improvements,
        "old_warm_total": round(sum(old_warm[q] for q in unchanged), 2),
        "new_warm_total": round(sum(new_warm[q] for q in unchanged), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-ref", required=True,
                    help="git ref holding the baseline bench_detail.json")
    ap.add_argument("--new-ref", default=None,
                    help="git ref for the candidate (default: working tree)")
    ap.add_argument("--ratio", type=float, default=1.25)
    ap.add_argument("--floor", type=float, default=0.30)
    ap.add_argument(
        "--allow", nargs="*", default=[],
        help="reviewed exceptions: queries whose slowdown is a known, "
             "deliberate trade (e.g. a new guard's estimate job that "
             "runs before the unchanged plan) — reported, not fatal",
    )
    a = ap.parse_args()

    report = gate(
        _load(a.old_ref, "bench_detail.json"),
        _load(a.new_ref, "bench_detail.json"),
        _load(a.old_ref, "tests/plan_snapshots.json"),
        _load(a.new_ref, "tests/plan_snapshots.json"),
        a.ratio,
        a.floor,
        a.allow,
    )
    print(json.dumps(report))
    if report["regressions"] and report["enforced"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
