#!/usr/bin/env python3
"""Quiet two-decade scale smoke for the r15 operators:

- bm25 direct vs STANDING-INDEX serve: 100k and 1M skewed docs.  The
  direct leg re-measures the r14 worst case after the r15 plan fix
  (query-term filter BEFORE the tf agg; dl carried through the agg;
  postings built once) — the 1M number should move vs the 18.4 s r14
  row.  The index leg splits build (once, out-of-band) from serve:
  HEAD-term queries are the worst case (their postings are ~1/50 of
  all token positions at every corpus size, so serve grows with the
  corpus but skips the tokenize), TAIL-term queries are the contract
  case (tiny postings → the term-bucket partition prune makes serve
  ~flat across the decade).
- er_unsupervised_bands chain (EM + scoring over the same pairs): 1M
  and 10M unlabeled candidate pairs over a 200k-doc side — the only
  distributed work is two double-id joins + one 2^F pattern hash-agg
  + the scan-fused score; EM itself is driver-side.
- community_clusters (curation v3's stage): 100k and 1M nodes at 3
  edges/node — label_propagation's ≤2-snapshot rounds + ONE min
  window over the node table.
- hybrid_multiquery_rrf production shape: bm25_topk + PARTIAL-probe
  IVF (4/64 — the serving dial, not the full-probe oracle identity)
  → rrf_fuse at 100k and 1M docs+vectors; fusion input is bounded by
  Σ mode-top-k per query, so the ratio is the component legs'.

Usage: python tools/r15_scale_smoke.py   (run QUIET)
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
    spark = get_spark(app_name="r15-scale-smoke")
    out: dict = {"loadavg": round(os.getloadavg()[0], 1)}

    # ---- bm25: direct (post-plan-fix) vs standing-index serve --------
    from rhq_metrics_spark.pipelines.retrieval import (
        bm25_against_index,
        bm25_index,
        bm25_topk,
    )
    from rhq_metrics_spark.pipelines.similarity import ivf_cosine_topk

    # warm the session ONCE (codegen, Arrow, shuffle service) so the
    # small decade doesn't eat the first-call JVM cost — without this
    # the 100k legs read SLOWER than the 1M legs (measured: direct
    # 10.7 s at 100k vs 7.4 s at 1M on a cold session)
    _wd = synth_skewed_docs(spark, 10_000).select("doc_id", "text")
    q_warm = spark.createDataFrame(
        [(0, "w0 w1")], "query_id long, query string"
    )
    bm25_topk(_wd, q_warm, k=5).count()
    from rhq_metrics_spark.pipelines.embeddings import (
        synthetic_clustered_embeddings_distributed as _synth_emb,
    )

    _we = _synth_emb(spark, 10_000, dim=32, n_clusters=8, seed=5)
    ivf_cosine_topk(
        _we, _we.filter("vec_id < 2"), k=5, n_cells=8, n_probe=2
    ).count()

    q_head = spark.createDataFrame(
        [(0, "w0 w7 w13"), (1, "w1 w2"), (2, "w3 w11 w29")],
        "query_id long, query string",
    )
    # tail vocab ids ≥ 50 never collide with the head vocab
    q_tail = spark.createDataFrame(
        [(0, "w20011 w20077"), (1, "w20501 w21117"), (2, "w23003 w24999")],
        "query_id long, query string",
    )
    idx_root = tempfile.mkdtemp(prefix="r15_bm25_")
    try:
        for n in (100_000, 1_000_000):
            d = synth_skewed_docs(spark, n).select("doc_id", "text").persist()
            d.count()
            t0 = time.time()
            direct = {
                tuple(r) for r in bm25_topk(d, q_head, k=10).collect()
            }
            out[f"bm25_direct_{n}_sec"] = round(time.time() - t0, 1)
            path = f"{idx_root}/idx{n}"
            t0 = time.time()
            bm25_index(d, path)
            out[f"bm25_build_{n}_sec"] = round(time.time() - t0, 1)
            t0 = time.time()
            served = {
                tuple(r)
                for r in bm25_against_index(spark, path, q_head, k=10).collect()
            }
            out[f"bm25_serve_head_{n}_sec"] = round(time.time() - t0, 1)
            assert served == direct, "index serve != direct"
            t0 = time.time()
            tail_rows = bm25_against_index(spark, path, q_tail, k=10).count()
            out[f"bm25_serve_tail_{n}_sec"] = round(time.time() - t0, 1)
            assert tail_rows >= 0
            d.unpersist()
        for leg in ("direct", "build", "serve_head", "serve_tail"):
            out[f"bm25_{leg}_x10_ratio"] = round(
                out[f"bm25_{leg}_1000000_sec"]
                / max(out[f"bm25_{leg}_100000_sec"], 0.1),
                2,
            )
    finally:
        shutil.rmtree(idx_root, ignore_errors=True)

    # ---- unsupervised ER end-to-end chain ----------------------------
    from rhq_metrics_spark.pipelines.dedup import (
        fs_em_as_rates,
        fs_em_weights,
        fs_score_pairs,
    )

    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 20).cast("string")).alias("source"),
        (F.abs(F.xxhash64("id")) % 40 + 1).cast("int").alias("len_bucket"),
    ).persist()
    docs.count()
    for n in (1_000_000, 10_000_000):
        cands = (
            spark.range(n)
            .select(
                (F.abs(F.xxhash64(F.col("id") * 3)) % N_DOCS).alias("id_a"),
                (F.abs(F.xxhash64(F.col("id") * 3 + 1)) % N_DOCS).alias("id_b"),
            )
            .filter("id_a != id_b")
            .localCheckpoint(eager=True)
        )
        n_cands = cands.count()
        t0 = time.time()
        em = fs_em_weights(docs, cands, ("source", "len_bucket"), iters=20)
        got = fs_score_pairs(
            docs, cands, fs_em_as_rates(em), ("source", "len_bucket")
        ).count()
        out[f"er_unsup_{n}_sec"] = round(time.time() - t0, 1)
        assert got == n_cands, (got, n_cands)
        cands.unpersist()
    out["er_unsup_x10_ratio"] = round(
        out["er_unsup_10000000_sec"] / out["er_unsup_1000000_sec"], 2
    )
    docs.unpersist()

    # ---- curation v3 cluster stage ------------------------------------
    from rhq_metrics_spark.pipelines.graph import community_clusters

    for n in (100_000, 1_000_000):
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
        n_canon = cl.filter("is_canonical").count()
        out[f"community_clusters_{n}_sec"] = round(time.time() - t0, 1)
        out[f"community_clusters_{n}_canonicals"] = n_canon
        pairs.unpersist()
    out["community_clusters_x10_ratio"] = round(
        out["community_clusters_1000000_sec"]
        / out["community_clusters_100000_sec"],
        2,
    )

    # ---- hybrid production shape (partial probe, not the oracle) ------
    from rhq_metrics_spark.pipelines.embeddings import (
        synthetic_clustered_embeddings_distributed,
    )
    from rhq_metrics_spark.pipelines.hybrid import rrf_fuse

    for n in (100_000, 1_000_000):
        d = synth_skewed_docs(spark, n).select("doc_id", "text").persist()
        emb = synthetic_clustered_embeddings_distributed(
            spark, n, dim=32, n_clusters=64, seed=5
        ).persist()
        d.count(), emb.count()
        t0 = time.time()
        lex = bm25_topk(d, q_head, k=10).select("query_id", "doc_id", "rank")
        dense = ivf_cosine_topk(
            emb, emb.filter("vec_id < 3"), k=10, n_cells=64, n_probe=4
        ).select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("neighbor_id").alias("doc_id"),
            "rank",
        )
        fused = rrf_fuse(
            {"dense": dense, "lex": lex}, query_cols=("query_id",),
            top_k=10,
        ).count()
        out[f"hybrid_{n}_sec"] = round(time.time() - t0, 1)
        assert fused == 30, fused
        d.unpersist(), emb.unpersist()
    out["hybrid_x10_ratio"] = round(
        out["hybrid_1000000_sec"] / out["hybrid_100000_sec"], 2
    )

    out["loadavg_end"] = round(os.getloadavg()[0], 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
