#!/usr/bin/env python3
"""Connected-components scale smoke: dup_clusters on a synthetic pair
graph — evidence the iterative label propagation (path halving +
localCheckpoint) converges at node counts far beyond the documents
testdata.

Graph: n nodes; 80% isolated, 20% in chains of length ~chain_len
(adversarial for propagation depth — real near-dup clusters are
shallower).  Usage: python tools/cc_scale_smoke.py [n_nodes] [chain_len]
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
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(app_name="cc-scale-smoke")

    ids = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    # chain edges i -> i+1 inside every (id // chain_len) block, for the
    # first 20% of blocks
    in_chain = (F.col("id") / chain_len).cast("long") % 5 == 0
    not_block_end = (F.col("id") % chain_len) != (chain_len - 1)
    pairs = (
        spark.range(n_nodes - 1)
        .filter(in_chain & not_block_end)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    n_pairs = pairs.count()

    t0 = time.time()
    # force the DISTRIBUTED loop — this smoke exists to prove the
    # superstep path converges at scale, not the driver shortcut
    out = dup_clusters(ids, pairs, max_iters=30, driver_threshold=0)
    n_clusters = out.select("cluster_id").distinct().count()
    dt = round(time.time() - t0, 2)

    # every chain of length L collapses to 1 cluster: expected clusters =
    # isolated nodes + number of chain blocks
    n_blocks = (n_nodes // chain_len + 4) // 5
    expected = n_nodes - n_blocks * chain_len + n_blocks
    ok = abs(n_clusters - expected) <= chain_len  # boundary blocks
    print(
        json.dumps(
            {
                "n_nodes": n_nodes,
                "n_pairs": n_pairs,
                "chain_len": chain_len,
                "n_clusters": n_clusters,
                "expected_clusters": expected,
                "converged_correctly": ok,
                "seconds": dt,
            }
        )
    )
    spark.stop()
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
