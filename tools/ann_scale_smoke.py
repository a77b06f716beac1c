#!/usr/bin/env python3
"""ANN crossover smoke: at a corpus size where scan cost dominates
fixed overhead, IVF partial probe must BEAT brute force on wall-clock
while holding recall — the demonstration the 8k-vector bench fixture
can't give (there, two Arrow assignment passes cost more than the whole
brute scan; the bench reports candidate fraction instead, SCALE.md).

600k × 64-dim clustered vectors (counter-based deterministic
generation, any partitioning), 20 queries, 64 cells, probe 4.  At this
size the probe's ~4s fixed cost amortizes: measured ~2× wall-clock win
at recall 1.0 scanning 6% of pairs; the gap widens linearly with N.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from rhq_metrics_spark.session import get_spark  # noqa: E402

N, DIM, CELLS, PROBE, K, NQ = 600_000, 64, 64, 4, 5, 20


def main() -> None:
    spark = get_spark(app_name="ann-scale-smoke")
    from rhq_metrics_spark.pipelines.embeddings import (
        synthetic_clustered_embeddings_distributed,
    )
    from rhq_metrics_spark.pipelines.similarity import (
        cosine_topk,
        ivf_candidate_fraction,
        ivf_cosine_topk,
        ivf_train_centroids,
        topk_recall,
    )

    t0 = time.time()
    emb = synthetic_clustered_embeddings_distributed(
        spark, N, dim=DIM, n_clusters=CELLS, seed=7
    ).persist()
    n = emb.count()
    gen_s = round(time.time() - t0, 2)
    queries = emb.filter(f"vec_id < {NQ}").persist()
    queries.count()
    # Arrow worker-pool warmup so neither timed path pays it
    emb.limit(1000).mapInPandas(lambda it: it, emb.schema).count()

    t0 = time.time()
    cents = ivf_train_centroids(emb, n_cells=CELLS)
    train_s = round(time.time() - t0, 2)

    t0 = time.time()
    ivf = ivf_cosine_topk(
        emb, queries, k=K, n_cells=CELLS, n_probe=PROBE, centroids=cents
    ).persist()
    ivf.count()
    ivf_s = round(time.time() - t0, 2)

    t0 = time.time()
    truth = cosine_topk(emb, queries, k=K).persist()
    truth.count()
    brute_s = round(time.time() - t0, 2)

    # the persisted-index serving path: cell-partitioned parquet, the
    # probed cells resolved to a literal IN-list -> partition-pruned
    # scan reads ~probe/cells of the bytes (build cost amortized)
    import tempfile

    from rhq_metrics_spark.pipelines.similarity import (
        ivf_build_index,
        ivf_query_index,
    )

    idx_dir = tempfile.mkdtemp(prefix="ann_idx_")
    t0 = time.time()
    ivf_build_index(emb, idx_dir, n_cells=CELLS)
    build_s = round(time.time() - t0, 2)
    t0 = time.time()
    idx_res = ivf_query_index(
        spark, idx_dir, queries, k=K, n_probe=PROBE
    ).persist()
    idx_res.count()
    index_query_s = round(time.time() - t0, 2)
    index_recall = round(topk_recall(truth, idx_res), 3)

    recall = round(topk_recall(truth, ivf), 3)
    frac = round(ivf_candidate_fraction(emb, queries, cents, n_probe=PROBE), 4)
    out = {
        "n": n, "dim": DIM, "cells": CELLS, "probe": PROBE,
        "gen_s": gen_s, "train_s": train_s,
        "ivf_partial_probe_s": ivf_s, "brute_force_s": brute_s,
        "speedup": round(brute_s / ivf_s, 2) if ivf_s else None,
        "recall_at_5": recall, "candidate_fraction": frac,
        "index_build_s": build_s, "index_query_s": index_query_s,
        "index_speedup": round(brute_s / index_query_s, 2) if index_query_s else None,
        "index_recall_at_5": index_recall,
    }
    print(json.dumps(out))
    assert recall >= 0.9 and index_recall >= 0.9
    assert ivf_s < brute_s, "no ad-hoc crossover at this size"
    assert index_query_s < brute_s, "no indexed crossover at this size"
    import shutil

    shutil.rmtree(idx_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
