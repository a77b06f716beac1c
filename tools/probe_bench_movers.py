#!/usr/bin/env python3
"""Isolated best-of-3 latency probe for named bench queries — the
attribution tool for round-over-round movers (VERDICT r10 item 2 /
r9's ingest-KPI precedent): run the query alone on a quiet machine,
one discarded warm-up then best of 3, with loadavg stamped so the
result is self-evidently quiet.

Usage: python tools/probe_bench_movers.py [query ...]
       (default: text_classify tpch_q4 — the r10 watch items)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or ["text_classify", "tpch_q4"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=32)
    qs = entry.queries()
    load0 = open("/proc/loadavg").read().split()[0]
    out = {}
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).count()  # discarded warm-up (listing + JIT)
        best = None
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    load1 = open("/proc/loadavg").read().split()[0]
    print(json.dumps({
        "isolated_best_of_3": out,
        "load_start": load0,
        "load_end": load1,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
