#!/usr/bin/env python3
"""Quiet scale smoke for the r11 PQ family at 200k x 64-dim vectors
(the distributed clustered fixture): codebook training + encoding,
then ADC top-k with exact re-rank for 16 queries.

Usage: python tools/r11b_scale_smoke.py [n_vecs]   (run QUIET)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from rhq_metrics_spark.pipelines.embeddings import (  # noqa: E402
    synthetic_clustered_embeddings_distributed,
)
from rhq_metrics_spark.pipelines.similarity import (  # noqa: E402
    pq_adc_topk,
    pq_codebook,
    pq_train_encode,
)
from rhq_metrics_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="r11b-scale-smoke")
    out: dict = {"n_vecs": n}

    emb = synthetic_clustered_embeddings_distributed(
        spark, n=n, dim=64, n_clusters=64, seed=5
    ).persist()
    emb.count()

    t0 = time.time()
    codes = pq_train_encode(emb, m=8, k=16, iters=2).persist()
    n_codes = codes.count()
    out["pq_train_encode_sec"] = round(time.time() - t0, 1)
    assert n_codes == n * 8

    t0 = time.time()
    cb = pq_codebook(emb, codes, m=8).persist()
    cb_rows = cb.count()
    out["pq_codebook_sec"] = round(time.time() - t0, 1)
    assert cb_rows == 8 * 16

    queries = emb.filter("vec_id < 16").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t0 = time.time()
    topk = pq_adc_topk(
        codes, cb, queries, k_top=10, m=8, rerank_with=emb, shortlist=100
    )
    rows = topk.count()
    out["pq_adc_rerank_sec"] = round(time.time() - t0, 1)
    assert rows == 16 * 10
    # memory story: codes replace floats
    out["bytes_per_vec_codes"] = 8  # m one-byte codes
    out["bytes_per_vec_floats"] = 64 * 4
    emb.unpersist(); codes.unpersist(); cb.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
