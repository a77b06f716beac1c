#!/usr/bin/env python3
"""Isolated probe of the clustered-IVF bench KPIs (guide §1.4): times the
train / partial-probe / full-scan legs exactly as bench.py does, with job
labels, plus a per-phase breakdown of the partial probe (corpus assignment
leg, query assignment leg, full query via noop sink) and an executed-plan
dump."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rhq_metrics_spark.session import get_spark


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    spark = get_spark("probe-ivf-clustered")
    sc = spark.sparkContext
    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.embeddings import synthetic_clustered_embeddings
    from rhq_metrics_spark.pipelines.similarity import (
        _as_double,
        _cell_assignment_udf,
        cosine_topk,
        ivf_cosine_topk,
        ivf_train_centroids,
    )

    cemb = synthetic_clustered_embeddings(spark, n=8000, dim=64, n_clusters=64, seed=7).persist()
    cemb.count()
    cq = cemb.filter("vec_id < 10")

    sc.setJobDescription("ivf: train centroids")
    t0 = time.time()
    cents = ivf_train_centroids(cemb, n_cells=64)
    print(f"train: {time.time()-t0:.3f}s", flush=True)

    # Phase attribution BEFORE the first full call (cold python workers,
    # like the bench's first touch of the assignment UDF on this data).
    assign1 = _cell_assignment_udf(cents, 1)
    assignp = _cell_assignment_udf(cents, 4)
    c = cemb.select(
        F.col("vec_id").alias("neighbor_id"), _as_double(F.col("embedding")).alias("_cv")
    ).select("neighbor_id", "_cv", F.explode(assign1(F.col("_cv"))).alias("_cell"))
    q = cq.select(
        F.col("vec_id").alias("query_id"), _as_double(F.col("embedding")).alias("_qv")
    ).select("query_id", "_qv", F.explode(assignp(F.col("_qv"))).alias("_cell"))

    sc.setJobDescription("ivf: corpus assignment leg (noop)")
    t0 = time.time()
    noop(c)
    print(f"phase corpus_assign_noop: {time.time()-t0:.3f}s", flush=True)

    sc.setJobDescription("ivf: query assignment leg (noop)")
    t0 = time.time()
    noop(q)
    print(f"phase query_assign_noop: {time.time()-t0:.3f}s", flush=True)

    sc.setJobDescription("ivf: full partial probe (noop)")
    t0 = time.time()
    noop(ivf_cosine_topk(cemb, cq, k=5, n_cells=64, n_probe=4, centroids=cents))
    print(f"phase full_query_noop: {time.time()-t0:.3f}s", flush=True)

    for rep in range(3):
        sc.setJobDescription(f"ivf: partial probe rep{rep} (bench methodology)")
        t0 = time.time()
        civf = ivf_cosine_topk(cemb, cq, k=5, n_cells=64, n_probe=4, centroids=cents).persist()
        n = civf.count()
        print(f"partial_probe rep{rep}: {time.time()-t0:.3f}s rows={n}", flush=True)
        civf.unpersist()

    sc.setJobDescription("ivf: full scan")
    t0 = time.time()
    ctruth = cosine_topk(cemb, cq, k=5).persist()
    ctruth.count()
    print(f"full_scan: {time.time()-t0:.3f}s", flush=True)
    ctruth.unpersist()

    if "--explain" in sys.argv:
        plan = ivf_cosine_topk(cemb, cq, k=5, n_cells=64, n_probe=4, centroids=cents)
        print(explain(plan))

    spark.stop()


if __name__ == "__main__":
    main()
