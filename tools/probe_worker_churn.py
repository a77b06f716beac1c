#!/usr/bin/env python3
"""Python-worker supply probe (r17 session 2; guide §1.1/§4).

Demonstrates the mechanics behind the in-bench ANN KPI storms:

1. Spark kills — never pools — any Python worker whose stream is not
   fully drained, so a ``limit``-style early exit over a Python-stage
   subtree nukes its whole worker wave (with
   ``spark.sql.limit.initialNumPartitions = cores`` the take is
   core-count wide).
2. The next fully-drained Python stage then re-forks a fresh wave
   INSIDE its own runtime: a serialized daemon fork queue plus each
   worker's first-batch imports.

With the stock daemon the post-kill full-drain call measured ~1.05 s on
an idle host (and 2.4–4.2 s per task inside a loaded bench pass, per
the event-log task accumulables quoted in OPTIMIZATION_r17.md); with
``rhq_metrics_spark.pydaemon`` preloading numpy/pandas/pyarrow it reads
~0.65 s.  Run under both by flipping the session conf.

Usage: SPARK_GRAFT_CPUS=32 python tools/probe_worker_churn.py [stock]
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rhq_metrics_spark.session import get_spark  # noqa: E402


def n_workers() -> int:
    out = subprocess.run(["ps", "-eo", "cmd"], capture_output=True, text=True).stdout
    return sum(
        1 for ln in out.splitlines() if "pyspark.daemon" in ln or "pydaemon" in ln
    )


def main() -> None:
    extra = {}
    if len(sys.argv) > 1 and sys.argv[1] == "stock":
        extra["spark.python.daemon.module"] = "pyspark.daemon"
    spark = get_spark("probe-worker-churn", extra_conf=extra)
    print("daemon module:", spark.conf.get("spark.python.daemon.module"))

    import numpy as np
    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.similarity import _cell_assignment_udf

    cents = np.random.RandomState(0).rand(64, 64).astype(np.float64)
    df = (
        spark.range(8000)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 64),"
                " x -> cast(pmod(id * x, 97) as double) / 97.0)"
            ).alias("emb"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    df.count()

    def full_drain(tag: str) -> None:
        assign = _cell_assignment_udf(cents, 1)
        t0 = time.time()
        (
            df.select(F.explode(assign(F.col("emb"))).alias("c"))
            .groupBy("c")
            .count()
            .count()
        )
        print(
            f"{tag}: full-drain {time.time() - t0:6.3f}s workers={n_workers()}",
            flush=True,
        )

    def partial_drain(tag: str) -> None:
        assign = _cell_assignment_udf(cents, 1)
        t0 = time.time()
        df.select(F.explode(assign(F.col("emb"))).alias("c")).limit(5).collect()
        print(
            f"{tag}: partial-drain {time.time() - t0:6.3f}s workers={n_workers()}",
            flush=True,
        )

    full_drain("warm0")
    full_drain("warm1")
    for i in range(4):
        partial_drain(f"round{i}")  # kills the whole wave (watch workers drop)
        time.sleep(1)
        print(f"  after sleep workers={n_workers()}", flush=True)
        full_drain(f"round{i}")  # re-forks the wave inside its own runtime


if __name__ == "__main__":
    main()
