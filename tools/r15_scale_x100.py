#!/usr/bin/env python3
"""×100 checkpoint for the r15 operators — third decade on top of
tools/r15_scale_smoke.py:

- bm25_index: build at 100k → 1M → 10M head-skewed docs, then SERVE
  head- and tail-term query batches against each index.  The claim
  under test: build is corpus-linear (paid once, out-of-band), serve
  is postings-sized — tail-term serve stays ~flat across TWO decades
  while the corpus grows 100×.
- er_unsup: the composed unsupervised-ER chain (EM + scoring) at
  1M → 10M → 100M candidate pairs over a 200k-doc side — r14 measured
  fs_em_weights alone flat to 100M (ratio 1.1); the chain adds the
  pair-linear scoring leg, so the third decade is where a hidden
  pair-quadratic term would surface.
- communities: community_clusters at 100k → 1M → 10M nodes (3
  edges/node, 10 rounds) — label_propagation held the ≤2-snapshot
  discipline at 10M in r14 (326.8 s); the v3 stage adds one min
  window over the node table, which must not change the decade.

Usage: python tools/r15_scale_x100.py [family ...]   (run QUIET)
Families: bm25_index er_unsup communities   (default: all three)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from rhq_metrics_spark.session import get_spark  # noqa: E402
from tools.r13_scale_smoke import synth_skewed_docs  # noqa: E402

N_DOCS = 200_000


def main() -> None:
    fams = set(sys.argv[1:]) or {"bm25_index", "er_unsup", "communities"}
    spark = get_spark(app_name="r15-scale-x100")
    out: dict = {"loadavg": round(os.getloadavg()[0], 1)}

    if "bm25_index" in fams:
        from rhq_metrics_spark.pipelines.retrieval import (
            bm25_against_index,
            bm25_index,
            bm25_topk,
        )

        _wd = synth_skewed_docs(spark, 10_000).select("doc_id", "text")
        bm25_topk(
            _wd,
            spark.createDataFrame([(0, "w0 w1")], "query_id long, query string"),
            k=5,
        ).count()
        q_head = spark.createDataFrame(
            [(0, "w0 w7 w13"), (1, "w1 w2"), (2, "w3 w11 w29")],
            "query_id long, query string",
        )
        q_tail = spark.createDataFrame(
            [(0, "w20011 w20077"), (1, "w20501 w21117"), (2, "w23003 w24999")],
            "query_id long, query string",
        )
        idx_root = tempfile.mkdtemp(prefix="r15_bm25_x100_")
        try:
            for n in (100_000, 1_000_000, 10_000_000):
                d = synth_skewed_docs(spark, n).select("doc_id", "text")
                path = f"{idx_root}/idx{n}"
                t0 = time.time()
                bm25_index(d, path)
                out[f"bm25_build_{n}_sec"] = round(time.time() - t0, 1)
                t0 = time.time()
                nh = bm25_against_index(spark, path, q_head, k=10).count()
                out[f"bm25_serve_head_{n}_sec"] = round(time.time() - t0, 1)
                assert nh == 30, nh
                t0 = time.time()
                bm25_against_index(spark, path, q_tail, k=10).count()
                out[f"bm25_serve_tail_{n}_sec"] = round(time.time() - t0, 1)
                # serve must not read the whole postings set: the tail
                # batch prunes to its term buckets
                shutil.rmtree(path, ignore_errors=True)
        finally:
            shutil.rmtree(idx_root, ignore_errors=True)
        out["bm25_build_x100_ratio"] = round(
            out["bm25_build_10000000_sec"]
            / max(out["bm25_build_100000_sec"], 0.1),
            1,
        )
        out["bm25_serve_tail_x100_ratio"] = round(
            out["bm25_serve_tail_10000000_sec"]
            / max(out["bm25_serve_tail_100000_sec"], 0.1),
            2,
        )

    if "er_unsup" in fams:
        from rhq_metrics_spark.pipelines.dedup import (
            fs_em_as_rates,
            fs_em_weights,
            fs_score_pairs,
        )

        docs = spark.range(N_DOCS).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 20).cast("string")).alias(
                "source"
            ),
            (F.abs(F.xxhash64("id")) % 40 + 1).cast("int").alias("len_bucket"),
        ).persist()
        docs.count()
        pair_root = tempfile.mkdtemp(prefix="r15_er_pairs_")
        try:
            for n in (1_000_000, 10_000_000, 100_000_000):
                # the pair spine the chain consumes TWICE (EM + scoring)
                # is a DISK artifact, not a heap snapshot: the first
                # attempt used an eager localCheckpoint and OOM'd the
                # 8 GiB local JVM at the 100M decade (measured negative
                # result — see SCALE.md); a parquet write + read is the
                # shape a real pipeline shares a 100M-pair table in,
                # and it completes the decade
                pp = f"{pair_root}/p{n}"
                (
                    spark.range(n)
                    .select(
                        (F.abs(F.xxhash64(F.col("id") * 3)) % N_DOCS).alias(
                            "id_a"
                        ),
                        (F.abs(F.xxhash64(F.col("id") * 3 + 1)) % N_DOCS).alias(
                            "id_b"
                        ),
                    )
                    .filter("id_a != id_b")
                    .write.mode("overwrite")
                    .parquet(pp)
                )
                cands = spark.read.parquet(pp)
                n_cands = cands.count()
                t0 = time.time()
                em = fs_em_weights(
                    docs, cands, ("source", "len_bucket"), iters=20
                )
                got = fs_score_pairs(
                    docs, cands, fs_em_as_rates(em), ("source", "len_bucket")
                ).count()
                out[f"er_unsup_{n}_sec"] = round(time.time() - t0, 1)
                assert got == n_cands, (got, n_cands)
                shutil.rmtree(pp, ignore_errors=True)
        finally:
            shutil.rmtree(pair_root, ignore_errors=True)
        out["er_unsup_x100_ratio"] = round(
            out["er_unsup_100000000_sec"] / out["er_unsup_1000000_sec"], 1
        )
        docs.unpersist()

    if "communities" in fams:
        from rhq_metrics_spark.pipelines.graph import community_clusters

        for n in (100_000, 1_000_000, 10_000_000):
            ids = spark.range(n).select(F.col("id").alias("doc_id"))
            pairs = (
                spark.range(n * 3)
                .select(
                    (F.col("id") % n).alias("id_a"),
                    (F.abs(F.xxhash64("id")) % n).alias("id_b"),
                )
                .filter("id_a != id_b")
                .localCheckpoint(eager=True)
            )
            t0 = time.time()
            cl = community_clusters(ids, pairs, iters=10)
            out[f"communities_{n}_canonicals"] = cl.filter(
                "is_canonical"
            ).count()
            out[f"communities_{n}_sec"] = round(time.time() - t0, 1)
            pairs.unpersist()
        out["communities_x100_ratio"] = round(
            out["communities_10000000_sec"] / out["communities_100000_sec"], 1
        )

    out["loadavg_end"] = round(os.getloadavg()[0], 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
