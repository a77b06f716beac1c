#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion (collect/count) after a warm-up of
the input file listing; per-query wall time includes planning.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402

#: the headline subset run per-round by the driver (kept fast enough to
#: finish in minutes at sf0.1 while covering scans, window functions,
#: multi-level aggs, joins, dedup joins, and vector search)
BENCH_QUERIES = [
    "s1_raw_scan",
    "a1_bucket_stats",
    "w1_gauge_rate",
    "w1_rate_stats",
    "a2_availability_stats",
    "w2_periods",
    "a3_stacked_stats",
    "a5_tagged_stats",
    "b1_slice_rollup",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embed_cosine_topk",
    "text_quality",
    "doc_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="rhq-metrics-spark-bench")

    qs = entry.queries()
    # warm up the JVM + file listings so fixed session cost isn't charged
    # to whichever query happens to run first
    for t in ("events", "lineitem", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
