"""One-shot verification battery: everything the external driver and
the judge check, in one command with a one-page summary.

    python tools/run_all_checks.py [--fast]

Runs, in order:
1. bench.py                    (headline wall times @ sf0.1)
2. pytest tests/ (full suite; skipped with --fast)
3. tools/check_correctness.py  (DuckDB-oracle sweep @ sf0.01)
4. tools/check_types.py        (Arrow-level output-type parity)
5. tools/verify_driver_contract.py (vanilla-session driver gate)

BENCH RUNS FIRST — measured before anything heats the machine. The
r9 battery ran bench last and recorded contention residue as
apparent per-query regressions the judge had to adjudicate away
(BENCH_r09.json vs the controlled re-run); the wall-time artifact
must be the steady-state number, and the cheapest way to guarantee
that is to take it on the cold machine. bench.py additionally
records loadavg at start/end so any remaining contention is visible
in the JSON instead of masquerading as a code regression.

Exit code 0 only if every stage passes.
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run(label: str, cmd: list[str], timeout: int = 2400) -> tuple[str, bool, str]:
    t0 = time.perf_counter()
    try:
        p = subprocess.run(
            cmd, cwd=ROOT, timeout=timeout,
            capture_output=True, text=True,
        )
        ok = p.returncode == 0
        tail = (p.stdout.strip().splitlines() or ["<no output>"])[-1]
    except subprocess.TimeoutExpired:
        ok, tail = False, f"TIMEOUT after {timeout}s"
    return label, ok, f"{tail}  [{time.perf_counter() - t0:.0f}s]"


def main() -> int:
    fast = "--fast" in sys.argv
    py = sys.executable
    stages = [("bench", [py, "bench.py"])]
    if not fast:
        stages.append(("pytest", [py, "-m", "pytest", "tests/", "-q"]))
    stages += [
        ("oracle sweep", [py, "tools/check_correctness.py",
                          "/root/testdata/sf0.01"]),
        ("type parity", [py, "tools/check_types.py"]),
        ("driver contract", [py, "tools/verify_driver_contract.py",
                             "/root/testdata/sf0.01"]),
        ("plan signals", [py, "tools/plan_signals_all.py",
                          "/root/testdata/sf0.01"]),
    ]
    results = [run(label, cmd) for label, cmd in stages]
    print("\n== verification summary ==")
    worst = 0
    for label, ok, tail in results:
        print(f"{'PASS' if ok else 'FAIL':4} {label:16} {tail}")
        worst |= (not ok)
    return worst


if __name__ == "__main__":
    raise SystemExit(main())
