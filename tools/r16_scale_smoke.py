#!/usr/bin/env python3
"""Quiet two-decade scale smoke for the r16 operators:

- BM25 STORE serve (root + stream pieces + tombstones): 100k and 1M
  skewed docs — bootstrap 90%, two committed stream pieces (5% each),
  1% tombstoned.  The serve must stay ~flat across the decade for
  tail-term queries (bucket-pruned postings + a pushed NOT IN over a
  bounded tombstone list); consolidation cost is corpus-linear and
  out-of-band; post-fold serve re-measured (piece count 3 -> 2).
- hybrid SERVED stack, serve-only: both standing artifacts built out
  of timing at each decade, then the per-batch cost of
  bm25_against_index + full-probe ivf_query_index + rrf_fuse — the
  repeated-serving cost a production user pays (VERDICT r15 item 1's
  "serve smoke": per-batch cost artifact-sized, not corpus-sized;
  note the dense full-probe leg IS corpus-linear by design — the
  partial-probe dial below is the scale path).
- ivf_seeded_topk (the oracled partial probe): 60k and 600k clustered
  64-dim vectors, 64 seeded cells, probe 4/64 — assignment is one
  scan-fused pass (corpus-linear), per-query scoring restricted to
  ~1/16 of the corpus.

Usage: python tools/r16_scale_smoke.py   (run QUIET)
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


def main() -> None:
    spark = get_spark(app_name="r16-scale-smoke")
    out: dict = {"loadavg": round(os.getloadavg()[0], 1)}

    from rhq_metrics_spark.pipelines.embeddings import (
        synthetic_clustered_embeddings_distributed as synth_emb,
    )
    from rhq_metrics_spark.pipelines.hybrid import rrf_fuse
    from rhq_metrics_spark.pipelines.retrieval import (
        bm25_against_index,
        bm25_delete,
        bm25_index,
        bm25_topk,
    )
    from rhq_metrics_spark.pipelines.similarity import (
        ivf_build_index,
        ivf_query_index,
        ivf_seeded_topk,
    )
    from rhq_metrics_spark.streaming.retrieval import (
        bm25_consolidate,
        process_bm25_batch,
    )

    # warm the session once (codegen/Arrow/shuffle) — the r15 lesson:
    # without this the small decade eats first-call JVM cost and reads
    # SLOWER than the large one
    _wd = synth_skewed_docs(spark, 10_000).select("doc_id", "text")
    _wq = spark.createDataFrame([(0, "w0 w1")], "query_id long, query string")
    bm25_topk(_wd, _wq, k=5).count()
    _we = synth_emb(spark, 10_000, dim=32, n_clusters=8, seed=5)
    ivf_seeded_topk(
        _we, _we.filter("vec_id < 2"), centroid_ids=range(8), k=5, n_probe=2
    ).count()

    # mixed batch: one head-vocab query (worst case — fat postings),
    # two tail-ish (the contract case)
    qdf = spark.createDataFrame(
        [(0, "w1 w7"), (1, "w93 w5821"), (2, "w17320 w2441 w12")],
        "query_id long, query string",
    )

    for n in (100_000, 1_000_000):
        tag = f"{n // 1000}k"
        docs = synth_skewed_docs(spark, n).select("doc_id", "text")
        store = tempfile.mkdtemp(prefix=f"r16_store_{tag}_")
        try:
            t0 = time.time()
            bm25_index(docs.filter(f"doc_id < {int(n * 0.9)}"), store)
            out[f"store_build_{tag}_sec"] = round(time.time() - t0, 1)
            lo = int(n * 0.9)
            mid = int(n * 0.95)
            t0 = time.time()
            process_bm25_batch(
                spark,
                docs.filter(f"doc_id >= {lo} and doc_id < {mid}"),
                0, store,
            )
            process_bm25_batch(spark, docs.filter(f"doc_id >= {mid}"), 1, store)
            out[f"store_2pieces_{tag}_sec"] = round(time.time() - t0, 1)
            t0 = time.time()
            bm25_delete(spark, store, list(range(0, n, 100)))  # 1%
            out[f"store_delete1pct_{tag}_sec"] = round(time.time() - t0, 1)

            def serve() -> float:
                t0 = time.time()
                bm25_against_index(spark, store, qdf, k=10).collect()
                return time.time() - t0

            serve()  # warm listings/plans
            out[f"store_serve_{tag}_sec"] = round(min(serve(), serve()), 2)
            t0 = time.time()
            bm25_consolidate(spark, store)
            out[f"store_consolidate_{tag}_sec"] = round(time.time() - t0, 1)
            out[f"store_serve_postfold_{tag}_sec"] = round(
                min(serve(), serve()), 2
            )

            # hybrid served stack, serve-only (artifacts standing)
            emb = synth_emb(spark, n // 10, dim=64, n_clusters=64, seed=7)
            ivf_dir = tempfile.mkdtemp(prefix=f"r16_ivf_{tag}_")
            try:
                t0 = time.time()
                ivf_build_index(emb, ivf_dir, n_cells=64)
                out[f"ivf_build_{tag}_sec"] = round(time.time() - t0, 1)
                qv = emb.filter("vec_id < 3")

                def serve_hybrid() -> float:
                    t0 = time.time()
                    lex = bm25_against_index(spark, store, qdf, k=10).select(
                        "query_id", "doc_id", "rank"
                    )
                    dense = ivf_query_index(
                        spark, ivf_dir, qv, k=10,
                        query_id_col="vec_id", n_probe=4,
                    ).select(
                        F.col("query_id").cast("long").alias("query_id"),
                        F.col("neighbor_id").alias("doc_id"),
                        "rank",
                    )
                    rrf_fuse(
                        {"dense": dense, "lex": lex},
                        query_cols=("query_id",), top_k=10,
                    ).collect()
                    return time.time() - t0

                serve_hybrid()
                out[f"hybrid_serve_{tag}_sec"] = round(
                    min(serve_hybrid(), serve_hybrid()), 2
                )

                # the oracled partial probe at scale
                def seeded() -> float:
                    t0 = time.time()
                    ivf_seeded_topk(
                        emb, qv, centroid_ids=range(64), k=10, n_probe=4
                    ).collect()
                    return time.time() - t0

                seeded()
                out[f"seeded_partial_{tag}_sec"] = round(
                    min(seeded(), seeded()), 2
                )
            finally:
                shutil.rmtree(ivf_dir, ignore_errors=True)
        finally:
            shutil.rmtree(store, ignore_errors=True)

    for k in (
        "store_serve", "store_serve_postfold", "hybrid_serve",
        "seeded_partial",
    ):
        a, b = out.get(f"{k}_100k_sec"), out.get(f"{k}_1000k_sec")
        if a and b:
            out[f"{k}_x10_ratio"] = round(b / a, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
