#!/usr/bin/env python3
"""Quiet two-decade scale smoke for the r14 operators:

- fs_score_pairs: 100k and 1M candidate pairs over a 200k-doc side
  table (weights from fs_field_weights on a 100k labeled subset) —
  verifies the scoring leg stays pair-linear: two id joins + ONE
  broadcast m/u row + a scan-fused score expression.
- hard_negatives_ann: 100k and 1M clustered corpus vectors × 20
  queries, 64 cells / 4-probe — the ANN-composed leg whose per-query
  scan cost is ~n_probe/n_cells of the corpus (the exact brute leg was
  smoked in r13b and is honestly linear by design).
- fs_em_weights: 1M and 10M UNLABELED pairs over the same doc side —
  the EM's only distributed work is the double id join + one
  agreement-pattern hash-agg (2^F output rows); the 20 EM iterations
  are driver-side over that bounded table.
- bm25_topk (log2-idf): 100k and 1M docs × 3 queries — only the query
  terms' postings survive the scan-side broadcast join; idf (the
  exact-integer log2 chain) runs over ≤ |query terms| rows.
- label_propagation: 100k and 1M nodes at 3 edges/node, 10 synchronous
  rounds — per round one |edges| join + one vote hash-agg + one argmax
  window; ≤ 2 label snapshots live.

Usage: python tools/r14_scale_smoke.py   (run QUIET)
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

from rhq_metrics_spark.pipelines.dedup import (  # noqa: E402
    fs_field_weights,
    fs_score_pairs,
)
from rhq_metrics_spark.pipelines.embeddings import (  # noqa: E402
    synthetic_clustered_embeddings_distributed,
)
from rhq_metrics_spark.pipelines.similarity import (  # noqa: E402
    hard_negatives_ann,
)
from rhq_metrics_spark.session import get_spark  # noqa: E402

N_DOCS = 200_000


def main() -> None:
    spark = get_spark(app_name="r14-scale-smoke")
    out: dict = {"loadavg": round(os.getloadavg()[0], 1)}

    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 20).cast("string")).alias("source"),
        (F.abs(F.xxhash64("id")) % 40 + 1).cast("int").alias("len_bucket"),
    ).persist()
    docs.count()
    labeled = spark.range(100_000).select(
        (F.abs(F.xxhash64(F.col("id") * 2)) % N_DOCS).alias("id_a"),
        (F.abs(F.xxhash64(F.col("id") * 2 + 1)) % N_DOCS).alias("id_b"),
        (F.col("id") % 10 == 0).alias("is_match"),
    ).filter("id_a != id_b")
    weights = fs_field_weights(
        docs, labeled, ("source", "len_bucket")
    ).persist()
    assert weights.count() == 4
    for n in (100_000, 1_000_000):
        cands = spark.range(n).select(
            (F.abs(F.xxhash64(F.col("id") * 3)) % N_DOCS).alias("id_a"),
            (F.abs(F.xxhash64(F.col("id") * 3 + 1)) % N_DOCS).alias("id_b"),
        ).filter("id_a != id_b")
        n_cands = cands.count()
        t0 = time.time()
        scored = fs_score_pairs(
            docs, cands, weights, ("source", "len_bucket")
        )
        got = scored.count()
        out[f"fs_score_{n}_sec"] = round(time.time() - t0, 1)
        assert got == n_cands, (got, n_cands)
    out["fs_score_x10_ratio"] = round(
        out["fs_score_1000000_sec"] / out["fs_score_100000_sec"], 2
    )
    weights.unpersist()

    from rhq_metrics_spark.pipelines.dedup import fs_em_weights

    for n in (1_000_000, 10_000_000):
        cands = spark.range(n).select(
            (F.abs(F.xxhash64(F.col("id") * 5)) % N_DOCS).alias("id_a"),
            (F.abs(F.xxhash64(F.col("id") * 5 + 1)) % N_DOCS).alias("id_b"),
        ).filter("id_a != id_b")
        t0 = time.time()
        em = fs_em_weights(docs, cands, ("source", "len_bucket")).collect()
        out[f"fs_em_{n}_sec"] = round(time.time() - t0, 1)
        assert len(em) == 2 and em[0]["n_pairs"] > 0
    out["fs_em_x10_ratio"] = round(
        out["fs_em_10000000_sec"] / out["fs_em_1000000_sec"], 2
    )
    docs.unpersist()

    for n in (100_000, 1_000_000):
        emb = synthetic_clustered_embeddings_distributed(
            spark, n=n, dim=32, n_clusters=64, seed=7
        ).persist()
        emb.count()
        q = emb.filter("vec_id < 20")
        t0 = time.time()
        hn = hard_negatives_ann(
            emb, q, k=5, max_cosine=0.99, n_cells=64, n_probe=4
        ).count()
        out[f"hn_ann_{n}_sec"] = round(time.time() - t0, 1)
        assert hn == 20 * 5, hn
        emb.unpersist()
    out["hn_ann_x10_ratio"] = round(
        out["hn_ann_1000000_sec"] / out["hn_ann_100000_sec"], 2
    )

    from rhq_metrics_spark.pipelines.retrieval import bm25_topk
    from tools.r13_scale_smoke import synth_skewed_docs

    qdf = spark.createDataFrame(
        [(0, "w0 w7 w13"), (1, "w1 w2"), (2, "w3 w11 w29")],
        "query_id long, query string",
    )
    for n in (100_000, 1_000_000):
        d = synth_skewed_docs(spark, n).persist()
        d.count()
        t0 = time.time()
        got = bm25_topk(d, qdf, k=10).count()
        out[f"bm25_{n}_sec"] = round(time.time() - t0, 1)
        assert got == 30, got
        d.unpersist()
    out["bm25_x10_ratio"] = round(
        out["bm25_1000000_sec"] / out["bm25_100000_sec"], 2
    )

    from rhq_metrics_spark.pipelines.graph import label_propagation

    for n in (100_000, 1_000_000):
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
        got = label_propagation(ids, pairs, iters=10).count()
        out[f"lpa_{n}_sec"] = round(time.time() - t0, 1)
        assert got == n
    out["lpa_x10_ratio"] = round(
        out["lpa_1000000_sec"] / out["lpa_100000_sec"], 2
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
