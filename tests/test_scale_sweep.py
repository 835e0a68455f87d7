"""Cross-parallelism determinism sweep (opt-in: pytest -m scale_sweep).

SCALE.md claims every oracle-backed query is bit-exact under any
local[N] / shuffle-partition combination. This encodes the claim as a
failing test: each parallelism level computes a canonical hash of every
query's sorted result rows in its own subprocess (own SparkContext),
and any per-query hash drift across levels fails with the culprit
named. The class of bug this catches: an order-dependent float sum, a
keep-one/top-k missing its total-order tiebreaker.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
LEVELS = ["local[2]", "local[4]", "local[16]"]


def _hashes(master: str) -> dict[str, str]:
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "scale_hash.py"), master],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.mark.scale_sweep
def test_all_oracle_queries_bit_exact_across_parallelism():
    base_level, *rest = LEVELS
    base = _hashes(base_level)
    assert base, "no oracle-backed queries hashed"
    for level in rest:
        got = _hashes(level)
        assert set(got) == set(base)
        drifted = sorted(q for q in base if got[q] != base[q])
        assert not drifted, (
            f"partitioning-dependent results between {base_level} and "
            f"{level}: {drifted}"
        )


@pytest.mark.deep_sweep
def test_full_oracle_sweep_at_bench_scale():
    """The deep tier: every oracle-backed query bit-exact at sf0.1.
    This scale caught two real defects in round 4 (a cross-engine
    round() tie, a mis-broadcast salted-join replica) that
    sf0.001/0.01 could not — keep it runnable so it cannot rot."""
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "check_oracle.py"),
            "/root/testdata/sf0.1",
        ],
        capture_output=True,
        text=True,
        timeout=2400,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "0 failures" in proc.stdout, proc.stdout[-3000:]
