#!/usr/bin/env python3
"""Super-node smoke for dup_clusters: one 100k-degree hub (a power-law
worst case — e.g. every page linking a boilerplate doc) plus a 10k
chain, forced onto the distributed path.  The hub must route to
large-star/small-star contraction automatically and converge without
OOM; the chain checks multi-hop components survive the same run.

Usage: python tools/supernode_smoke.py [hub_degree] [chain_len]
Prints one JSON line with timing + verification.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from rhq_metrics_spark.pipelines.dedup import dup_clusters  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402


def main() -> None:
    hub_degree = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    spark = get_spark(app_name="supernode-smoke")
    n = hub_degree + 1 + chain_len
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    # star: node 0 — {1..hub_degree}; chain: hub_degree+1 — ... — n-1
    star = spark.range(1, hub_degree + 1).select(
        F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b")
    )
    chain = spark.range(hub_degree + 1, n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    pairs = star.unionByName(chain)

    t0 = time.time()
    out = dup_clusters(ids, pairs, driver_threshold=0)
    counts = {
        r["cluster_id"]: r["c"]
        for r in out.groupBy("cluster_id").agg(F.count("*").alias("c")).collect()
    }
    dt = time.time() - t0

    ok = counts == {0: hub_degree + 1, hub_degree + 1: chain_len}
    print(
        json.dumps(
            {
                "hub_degree": hub_degree,
                "chain_len": chain_len,
                "clusters": len(counts),
                "exact": ok,
                "seconds": round(dt, 1),
            }
        )
    )
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
