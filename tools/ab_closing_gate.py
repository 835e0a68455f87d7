"""Closing-battery regression gate (round 10 — the r9 verdict's ask
#3, formalizing what §29.5 concluded): cross-round ABSOLUTE bench
sums on this box are weather (±10-15% day-to-day drift with zero code
change), so the ONLY admissible regression evidence is the
bias-corrected same-process A/B (tools/ab_query_drift.py, symmetric
within-pair order, self-A/B noise floor ~1.06 on min-ratio). This
script is the required closing step that applies that rule:

1. Compare the current round's representative window medians against
   the prior round's representative window (common keys only).
2. Any key whose median moved more than THRESHOLD (default 1.25x)
   is FLAGGED — absolute drift alone convicts nothing.
3. Every flagged key gets a bias-corrected A/B vs the prior-round
   pinned checkout in ONE JVM; a key is a REGRESSION only if its
   A/B median ratio also exceeds THRESHOLD, otherwise it is
   exonerated as drift (the r8->r9 pattern: three 1.4-1.7x window
   moves, all <=1.1x under the corrected A/B).

Usage:
    python tools/ab_closing_gate.py PRIOR.json CURRENT.json \
        [--sf /root/testdata/sf0.1] [--threshold 1.25] \
        [--pin-dir .ab_r9] [--pin-ref <commit>] [--runs 8]

The pin dir must be a checkout of the tree that PRODUCED the prior
window; with --pin-ref the script creates it as a detached git
worktree when missing (gitignored, like .ab_r6/.ab_r7 before it).
Exit code: 0 = gate passed (no flags, or every flag exonerated),
1 = at least one confirmed regression. One JSON line either way,
recorded in SCALE.md's closing-battery table.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def medians(bench: dict) -> dict[str, float]:
    """Per-query medians of a bench.py JSON record (older records
    lack queries_median; fall back to the min-of-runs figures)."""
    return bench.get("queries_median") or bench["queries"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("prior", help="prior round's representative BENCH json")
    ap.add_argument("current", help="this round's representative BENCH json")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--threshold", type=float, default=1.25)
    ap.add_argument("--pin-dir", default=".ab_r9")
    ap.add_argument("--pin-ref", default=None,
                    help="git ref to create the pin worktree from if absent")
    ap.add_argument("--runs", type=int, default=8)
    args = ap.parse_args()

    prior = json.loads(Path(args.prior).read_text())
    current = json.loads(Path(args.current).read_text())
    pm, cm = medians(prior), medians(current)
    common = sorted(set(pm) & set(cm))
    flagged = [
        q for q in common
        if pm[q] > 0 and cm[q] / pm[q] > args.threshold
    ]
    out: dict = {
        "gate": "pass",
        "threshold": args.threshold,
        "n_common": len(common),
        "prior": args.prior,
        "current": args.current,
        "current_window_valid": current.get("window_valid"),
        "flagged": {
            q: {"prior_median": pm[q], "current_median": cm[q],
                "window_ratio": round(cm[q] / pm[q], 3)}
            for q in flagged
        },
        "regressions": [],
    }
    if not flagged:
        print(json.dumps(out))
        return 0

    pin = REPO / args.pin_dir
    if not pin.exists():
        if not args.pin_ref:
            out["gate"] = "error"
            out["error"] = (
                f"pin dir {pin} missing and no --pin-ref to create it"
            )
            print(json.dumps(out))
            return 1
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(pin), args.pin_ref],
            cwd=REPO, check=True, capture_output=True,
        )

    env = dict(os.environ, RUNS=str(args.runs), AB_PIN=args.pin_dir)
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "ab_query_drift.py"),
         args.sf, *flagged],
        cwd=REPO, env=env, capture_output=True, text=True, check=True,
    )
    ab = json.loads(proc.stdout.strip().splitlines()[-1])
    out["ab"] = ab["queries"]
    for q in flagged:
        r = ab["queries"][q]["ratio_head_over_pin_median"]
        out["flagged"][q]["ab_median_ratio"] = r
        if r > args.threshold:
            out["regressions"].append(q)
        else:
            out["flagged"][q]["verdict"] = "exonerated: drift"
    if out["regressions"]:
        out["gate"] = "fail"
    print(json.dumps(out))
    return 1 if out["regressions"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
