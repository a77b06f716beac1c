#!/usr/bin/env python3
"""One-command verification: pytest + the full DuckDB oracle gate (+
optionally the bench), with a single PASS/FAIL verdict line.

Usage:
    python tools/verify_all.py             # tests + oracle gates at
                                           #   sf0.01 AND sf0.1 (~25 min)
    python tools/verify_all.py --sf01-only # skip the sf0.1 gate
    python tools/verify_all.py --bench     # also run bench.py at sf0.1
    python tools/verify_all.py --quick     # tests -x only (~5 min)
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(label: str, cmd: list[str], timeout: int) -> tuple[bool, str]:
    t0 = time.time()
    try:
        p = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
        )
    except subprocess.TimeoutExpired:
        return False, f"{label}: TIMEOUT after {timeout}s"
    dt = time.time() - t0
    tail = "\n".join((p.stdout + p.stderr).strip().splitlines()[-3:])
    ok = p.returncode == 0
    return ok, f"{label}: {'ok' if ok else 'FAIL'} ({dt:.0f}s)\n  {tail}"


def main() -> int:
    quick = "--quick" in sys.argv
    with_bench = "--bench" in sys.argv
    results = []

    # docs-of-record drift gate (cheap, runs first): registry counts in
    # COVERAGE.md vs queries()/oracle_sql()/BENCH_QUERIES
    results.append(
        run("registry", [sys.executable, "tools/check_registry.py"], 120)
    )

    pytest_cmd = [sys.executable, "-m", "pytest", "tests/", "-q"]
    if quick:
        pytest_cmd.append("-x")
    # 600+ tests run ~14-15 min on a quiet machine; 900 s started
    # false-flagging TIMEOUT as the suite grew (r11), and 1500 s
    # false-flagged again at 770+ tests on a slowed host (r16)
    results.append(run("pytest", pytest_cmd, 2400))

    if not quick:
        # both scale factors: float-summation-order bugs only show where
        # groups are big enough to flip a rounding boundary (sf0.1 caught
        # the a9_time_rollup divergence that sf0.01 missed)
        sfs = ["/root/testdata/sf0.01"]
        if "--sf01-only" not in sys.argv:
            sfs.append("/root/testdata/sf0.1")
        for sf in sfs:
            ok, msg = run(
                f"oracle-gate {sf.rsplit('/', 1)[-1]}",
                [sys.executable, "tools/check_correctness.py", sf],
                1800,
            )
            # the gate exits 0 only when every query matches
            results.append((ok, msg))

    if with_bench:
        results.append(run("bench", [sys.executable, "bench.py"], 900))

    print()
    for _, msg in results:
        print(msg)
    passed = all(ok for ok, _ in results)
    print("\nVERDICT:", "PASS" if passed else "FAIL")
    return 0 if passed else 1


if __name__ == "__main__":
    sys.exit(main())
