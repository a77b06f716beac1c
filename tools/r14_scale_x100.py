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

Third decades for the NEW r14 operators (run as explicit families —
not in the default set, which reproduces the VERDICT item-8 scope):

- lpa: label_propagation at 100k → 1M → 10M nodes (3 edges/node, 10
  rounds) — the ≤2-snapshot superstep discipline with an argmax window
  instead of a sum.
- bm25: bm25_topk at 100k → 1M → 10M head-skewed docs × 3 queries.
- fs_em: fs_em_weights at 1M → 10M → 100M unlabeled pairs.

Usage: python tools/r14_scale_x100.py [family ...]   (run QUIET)
Families: active_users frequent_paths pagerank_weighted lpa bm25 fs_em
(default: active_users frequent_paths pagerank_weighted)
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

    if "lpa" in fams:
        from rhq_metrics_spark.pipelines.graph import label_propagation

        for n in (100_000, 1_000_000, 10_000_000):
            ids = spark.range(n).select(F.col("id").alias("doc_id"))
            pairs = (
                spark.range(n * 3)
                .select(
                    (F.col("id") % n).alias("id_a"),
                    (F.abs(F.xxhash64(F.col("id"))) % n).alias("id_b"),
                )
                .filter("id_a != id_b")
            )
            t0 = time.time()
            assert label_propagation(ids, pairs, iters=10).count() == n
            out[f"lpa_{n}_sec"] = round(time.time() - t0, 1)

    if "bm25" in fams:
        from rhq_metrics_spark.pipelines.retrieval import bm25_topk
        from tools.r13_scale_smoke import synth_skewed_docs

        qdf = spark.createDataFrame(
            [(0, "w0 w7 w13"), (1, "w1 w2"), (2, "w3 w11 w29")],
            "query_id long, query string",
        )
        for n in (100_000, 1_000_000, 10_000_000):
            d = synth_skewed_docs(spark, n)
            t0 = time.time()
            assert bm25_topk(d, qdf, k=10).count() == 30
            out[f"bm25_{n}_sec"] = round(time.time() - t0, 1)

    if "fs_em" in fams:
        from rhq_metrics_spark.pipelines.dedup import fs_em_weights

        n_docs = 200_000
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 20).cast("string")).alias(
                "source"
            ),
            (F.abs(F.xxhash64("id")) % 40 + 1).cast("int").alias("len_bucket"),
        )
        for n in (1_000_000, 10_000_000, 100_000_000):
            cands = spark.range(n).select(
                (F.abs(F.xxhash64(F.col("id") * 5)) % n_docs).alias("id_a"),
                (F.abs(F.xxhash64(F.col("id") * 5 + 1)) % n_docs).alias("id_b"),
            ).filter("id_a != id_b")
            t0 = time.time()
            em = fs_em_weights(docs, cands, ("source", "len_bucket")).collect()
            out[f"fs_em_{n}_sec"] = round(time.time() - t0, 1)
            assert len(em) == 2 and em[0]["n_pairs"] > 0

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
