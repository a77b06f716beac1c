#!/usr/bin/env python3
"""×100 checkpoint for the r13 product-analytics families (VERDICT r13
item 8) — third decade on top of tools/r13b_scale_smoke.py:

- active_users: 1M → 10M → 100M events (~20 ev/user) — the distinct
  (user, period) reduction plus the ±1 delta spine; the one
  single-partition window runs over the #periods spine (20 rows here),
  never events.
- frequent_paths: 1M → 10M → 100M events — the path TYPE table under
  the synth's 8-type alphabet stays 8³-bounded; the user-key window
  carries the volume.
- pagerank_weighted: 100k → 1M → 10M nodes at 3 edges/node with ppm
  weights, 8 supersteps — confirms the ≤2-live-snapshot discipline
  (eager localCheckpoint + unpersist-previous) holds with the extra
  weight column at the decade where the unweighted loop once OOMed.

Usage: python tools/r14_scale_x100.py [family ...]   (run QUIET)
Families: active_users frequent_paths pagerank_weighted (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from rhq_metrics_spark.operators.funnel import (  # noqa: E402
    active_users,
    frequent_paths,
)
from rhq_metrics_spark.pipelines.graph import pagerank_weighted  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402
from tools.r13_scale_smoke import synth_events  # noqa: E402


def main() -> None:
    fams = set(sys.argv[1:]) or {
        "active_users", "frequent_paths", "pagerank_weighted",
    }
    spark = get_spark(app_name="r14-scale-x100")
    out: dict = {"loadavg": round(os.getloadavg()[0], 1)}

    if fams & {"active_users", "frequent_paths"}:
        for n in (1_000_000, 10_000_000, 100_000_000):
            ev = synth_events(spark, n)
            if "active_users" in fams:
                t0 = time.time()
                au = active_users(ev, period_ms=1, windows=(1, 3, 7)).count()
                out[f"active_users_{n}_sec"] = round(time.time() - t0, 1)
                assert au == 20 * 3
            if "frequent_paths" in fams:
                t0 = time.time()
                fp = frequent_paths(ev, length=3, k=20).collect()
                out[f"frequent_paths_{n}_sec"] = round(time.time() - t0, 1)
                assert len(fp) == 20

    if "pagerank_weighted" in fams:
        for n in (100_000, 1_000_000, 10_000_000):
            ids = spark.range(n).select(F.col("id").alias("doc_id"))
            pairs = (
                spark.range(n * 3)
                .select(
                    (F.col("id") % n).alias("id_a"),
                    (F.abs(F.xxhash64(F.col("id"))) % n).alias("id_b"),
                    (F.abs(F.xxhash64(F.col("id") + 1)) % 1_000_000 + 1)
                    .alias("w"),
                )
                .filter("id_a != id_b")
            )
            t0 = time.time()
            assert pagerank_weighted(ids, pairs, iters=8).count() == n
            out[f"pagerank_weighted_{n}_sec"] = round(time.time() - t0, 1)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
