#!/usr/bin/env python3
"""Empirical scaling curve: run representative headline queries at
every available scale factor and report the time ratio per 10× data.

A query whose cost is dominated by scans/hash-aggs should scale
sub-linearly wall-clock on fixed cores (more rows per task amortizes
fixed overhead); a super-linear ratio flags an operator whose plan
degrades with data size — the thing the 100 TB question actually asks.

Usage: python tools/scaling_curve.py [query ...]
Prints one JSON line: {query: {sf: sec, ..., "ratio_0.01_to_0.1": r}}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]

#: scans, windows, joins, dedup bucketing, ANN, text — one per family
DEFAULT = [
    "s1_raw_scan",
    "a1_bucket_stats",
    "w1_gauge_rate",
    "w4_sessions",
    "j6_interval_join",
    "tpch_q5",
    "tpch_q21",
    "dedup_minhash_lsh",
    "dedup_exact",
    "embed_lsh_topk",
    "text_quality",
    "text_tfidf",
    "o4_topk_per_group",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="scaling-curve")
    qs = entry.queries()
    out: dict[str, dict] = {}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        if not Path(sf_dir).exists():
            continue
        # warm file listings so ratios measure query work, not metadata
        for t in ("events", "lineitem", "documents", "embeddings"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        for name in names:
            best = None
            for _ in range(2):  # best-of-2 damps JIT/GC noise
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            out.setdefault(name, {})[sf] = round(best, 3)
            print(f"# sf{sf} {name}: {best:.2f}s", file=sys.stderr)
    for name, row in out.items():
        if "0.01" in row and "0.1" in row:
            row["ratio_0.01_to_0.1"] = round(row["0.1"] / max(row["0.01"], 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
