#!/usr/bin/env python3
"""×100 third decade for the r16 BM25 store: 100k → 1M → 10M docs,
store = bootstrap 90% + two committed stream pieces + a CONSTANT
1000-doc takedown (takedown lists are bounded by contract — they do
not scale with the corpus; the tombstone_ppm dial forces a rebuild
long before they could).  Measures per-batch serve (the FLAT claim at
its third decade, now with pieces AND tombstones in the plan),
consolidation cost (corpus-linear, out-of-band), and post-fold serve.

Usage: python tools/r16_scale_x100.py   (run QUIET)
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

from rhq_metrics_spark.session import get_spark  # noqa: E402
from tools.r13_scale_smoke import synth_skewed_docs  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="r16-scale-x100")
    out: dict = {"loadavg": round(os.getloadavg()[0], 1)}

    from rhq_metrics_spark.pipelines.retrieval import (
        bm25_against_index,
        bm25_delete,
        bm25_index,
        bm25_topk,
    )
    from rhq_metrics_spark.streaming.retrieval import (
        bm25_consolidate,
        process_bm25_batch,
    )

    _wd = synth_skewed_docs(spark, 10_000).select("doc_id", "text")
    _wq = spark.createDataFrame([(0, "w0 w1")], "query_id long, query string")
    bm25_topk(_wd, _wq, k=5).count()

    qdf = spark.createDataFrame(
        [(0, "w1 w7"), (1, "w93 w5821"), (2, "w17320 w2441 w12")],
        "query_id long, query string",
    )
    for n in (100_000, 1_000_000, 10_000_000):
        tag = f"{n // 1000}k"
        docs = synth_skewed_docs(spark, n).select("doc_id", "text")
        store = tempfile.mkdtemp(prefix=f"r16x_store_{tag}_")
        try:
            t0 = time.time()
            bm25_index(docs.filter(f"doc_id < {int(n * 0.9)}"), store)
            out[f"build_{tag}_sec"] = round(time.time() - t0, 1)
            lo, mid = int(n * 0.9), int(n * 0.95)
            process_bm25_batch(
                spark, docs.filter(f"doc_id >= {lo} and doc_id < {mid}"),
                0, store,
            )
            process_bm25_batch(spark, docs.filter(f"doc_id >= {mid}"), 1, store)
            bm25_delete(spark, store, list(range(0, 5000, 5)))  # 1000 ids

            def serve() -> float:
                t0 = time.time()
                bm25_against_index(spark, store, qdf, k=10).collect()
                return time.time() - t0

            serve()
            out[f"serve_{tag}_sec"] = round(min(serve(), serve()), 2)
            t0 = time.time()
            bm25_consolidate(spark, store)
            out[f"consolidate_{tag}_sec"] = round(time.time() - t0, 1)
            out[f"serve_postfold_{tag}_sec"] = round(min(serve(), serve()), 2)
        finally:
            shutil.rmtree(store, ignore_errors=True)
    for k in ("serve", "serve_postfold"):
        a, c = out.get(f"{k}_100k_sec"), out.get(f"{k}_10000k_sec")
        if a and c:
            out[f"{k}_x100_ratio"] = round(c / a, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
