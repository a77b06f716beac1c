#!/usr/bin/env python3
"""Scale smoke for the round-8 embedding-family operators (VERDICT r8
item 6): kmeans_assign and lm_bigram_score are driver-green at sf0.1
but had no large-N evidence in SCALE.md.  Runs >=1M vectors / >=1M
docs, times each leg, and asserts the plans keep their 100 TB shape:

- kmeans assignment: broadcast centroids + per-row HOF argmin — the
  exchange count is a small constant (centroid collect + per-iteration
  k x dim update aggs), independent of corpus size; no sort-merge join
- lm_bigram_score: one hash-agg on the bigram key, context totals as a
  window over the COUNTS table, vocabulary scalar broadcast — no
  cartesian product, exchange count constant in doc count

Usage: python tools/r9_scale_smoke.py [n_vectors] [n_docs]
Prints one JSON line with timings + plan facts.
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
    kmeans_assign,
    synthetic_clustered_embeddings_distributed,
)
from rhq_metrics_spark.pipelines.text import lm_bigram_score  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    n_vec = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark(app_name="r9-scale-smoke")
    out: dict = {"n_vectors": n_vec, "n_docs": n_docs}

    # ---- k-means assignment at n_vec (dim 64, k 16, 2 Lloyd iters)
    emb = synthetic_clustered_embeddings_distributed(spark, n_vec).persist()
    emb.count()
    for iters in (0, 2):
        t0 = time.time()
        assigned = kmeans_assign(emb, k=16, iters=iters)
        n = assigned.count()
        out[f"kmeans_iters{iters}_sec"] = round(time.time() - t0, 2)
        assert n == n_vec, (n, n_vec)
    plan = _plan(assigned)
    # the fixture generator's repartition() rides the (cached) lineage
    # into every re-computed subtree, so count only the OPERATOR's real
    # shuffles: hash exchanges are the k x dim update aggs (2 per
    # iteration: partial/final pair shows as one hashpartitioning per
    # agg), single-partition exchanges the centroid collect rows
    out["kmeans_hash_exchanges"] = plan.count("Exchange hashpartitioning")
    out["kmeans_single_exchanges"] = plan.count("Exchange SinglePartition")
    assert "SortMergeJoin" not in plan, "kmeans assignment must broadcast"
    assert "Exchange rangepartitioning" not in plan, "no global sorts"
    assert out["kmeans_hash_exchanges"] <= 2 * 2 + 1, plan  # per-iter aggs
    assert out["kmeans_single_exchanges"] <= 1 + 2, plan    # centroid rows
    emb.unpersist()

    # ---- bigram LM score over n_docs (~21 tokens each, 5k vocab)
    docs = (
        spark.range(n_docs)
        .repartition(spark.sparkContext.defaultParallelism)
        .selectExpr(
            "id AS doc_id",
            "concat_ws(' ', transform(sequence(0, 20),"
            " i -> concat('w', pmod(xxhash64(id * 31 + i), 5000)))) AS text",
        )
        .persist()
    )
    docs.count()
    t0 = time.time()
    scored = lm_bigram_score(docs)
    n = scored.count()
    out["lm_score_sec"] = round(time.time() - t0, 2)
    assert n == n_docs, (n, n_docs)
    plan = _plan(scored)
    out["lm_exchanges"] = plan.count("Exchange")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, (
        "vocabulary scalar must broadcast"
    )
    docs.unpersist()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
