#!/usr/bin/env python3
"""r17 isolated probe of the embed_ivfpq_query_sec KPI (guide §1): replays
the bench's clustered IVF+PQ section exactly — build outside timing, one
COLD query call (the bench methodology) then warm repeats — and attributes
the cost: job count per call (statusTracker job-group ids), index file
counts, and phase timings.  Run on a quiet host."""
from __future__ import annotations

import os
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rhq_metrics_spark.session import get_spark


def main() -> None:
    spark = get_spark("probe-ivfpq-r17")
    sc = spark.sparkContext
    st = sc.statusTracker()

    from rhq_metrics_spark.pipelines.embeddings import (
        synthetic_clustered_embeddings,
    )
    from rhq_metrics_spark.pipelines.similarity import ivfpq_build_index, ivfpq_query_index

    cemb = synthetic_clustered_embeddings(
        spark, n=8000, dim=64, n_clusters=64, seed=7
    ).persist()
    cemb.count()
    cq = cemb.filter("vec_id < 10")

    ivfpq_dir = tempfile.mkdtemp(prefix="probe_ivfpq_")
    try:
        t0 = time.time()
        ivfpq_build_index(cemb, ivfpq_dir, n_cells=64, m=8, k_codes=16, iters=2)
        print(f"build: {time.time()-t0:.2f}s", flush=True)
        for comp in ("cells", "centroids", "codebook"):
            files = list(pathlib.Path(f"{ivfpq_dir}/{comp}").rglob("*.parquet"))
            tot = sum(f.stat().st_size for f in files)
            print(f"  {comp}: {len(files)} parquet files, {tot/1024:.0f} KiB")

        for rep in range(4):
            grp = f"ivfpq-rep{rep}"
            sc.setJobGroup(grp, f"ivfpq query rep {rep}")
            t0 = time.time()
            ipq = ivfpq_query_index(
                spark, ivfpq_dir, cq, cemb, k=5, m=8, n_probe=4, shortlist=60
            ).persist()
            ipq.count()
            dt = time.time() - t0
            jobs = st.getJobIdsForGroup(grp)
            print(
                f"rep{rep}: {dt:.3f}s  jobs={len(jobs)}", flush=True
            )
            ipq.unpersist()
        # phase attribution on a warm call
        t0 = time.time()
        out = ivfpq_query_index(
            spark, ivfpq_dir, cq, cemb, k=5, m=8, n_probe=4, shortlist=60
        )
        t_plan = time.time() - t0
        t0 = time.time()
        out.write.format("noop").mode("overwrite").save()
        t_exec = time.time() - t0
        print(f"warm plan-construction: {t_plan:.3f}s  noop-exec: {t_exec:.3f}s")
        txt = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        print(f"plan: {txt.count('Exchange')} Exchange refs, "
              f"{txt.count('ArrowEvalPython')} ArrowEvalPython, "
              f"{txt.count('BroadcastHashJoin')} BHJ")
        with open("/tmp/ivfpq_query_plan_r17.txt", "w") as fh:
            fh.write(txt)
    finally:
        shutil.rmtree(ivfpq_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
