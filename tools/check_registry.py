#!/usr/bin/env python3
"""Docs-of-record drift check (VERDICT r7 item 5): the registry counts
stated in COVERAGE.md must match the shipping code, every oracle key
must have a query, and every bench headline query must exist.

Run: python tools/check_registry.py   (exit 0 = in sync)

Pure-Python import checks — no SparkSession is started.
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402
import bench  # noqa: E402


def main() -> int:
    failures: list[str] = []
    qs = entry.queries()
    osql = entry.oracle_sql()

    extra_oracle = sorted(set(osql) - set(qs))
    if extra_oracle:
        failures.append(f"oracle_sql keys with no queries() entry: {extra_oracle}")

    missing_bench = sorted(set(bench.BENCH_QUERIES) - set(qs))
    if missing_bench:
        failures.append(f"BENCH_QUERIES not in queries(): {missing_bench}")

    cov = (REPO / "COVERAGE.md").read_text()
    m = re.search(r"\*\*(\d+) driver queries", cov)
    if not m:
        failures.append("COVERAGE.md: no '**N driver queries' totals line")
    elif int(m.group(1)) != len(qs):
        failures.append(
            f"COVERAGE.md says {m.group(1)} driver queries; "
            f"queries() has {len(qs)}"
        )

    readme = (REPO / "README.md").read_text()
    m = re.search(r"driver contract: (\d+) queries", readme)
    if m and int(m.group(1)) != len(qs):
        failures.append(
            f"README.md says {m.group(1)} driver queries; "
            f"queries() has {len(qs)}"
        )

    no_oracle = sorted(set(qs) - set(osql))
    print(f"queries: {len(qs)}  oracled: {len(osql)}  "
          f"rows-only (documented non-SQL-expressible): {no_oracle}")
    if failures:
        for f in failures:
            print("FAIL:", f)
        return 1
    print("registry and docs-of-record in sync")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
