#!/usr/bin/env python3
"""Leg-by-leg breakdown of the hybrid (watermark-crossing) serving
constant — VERDICT r8 item 2: stats_hybrid_latency_p50_ms 297 vs routed
164; where do the ~130 ms go?

Replicates bench.py's dense-store hybrid KPI setup, then times one
hybrid gauge_stats call split into:
  plan      — DataFrame construction (service + store Python/Py4J)
  analyze   — first .columns access (Spark analysis)
  execute   — .collect()
and counts Spark jobs per call via the status tracker.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from rhq_metrics_spark.model import Buckets  # noqa: E402
from rhq_metrics_spark.service import MetricsService  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402
from rhq_metrics_spark.sources.store import MetricsStore  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-hybrid")
    sc = spark.sparkContext

    pts = entry._events_points(spark, sf_dir).select(
        F.lit("bench").alias("tenant_id"), "metric", "ts", "value",
        F.lit(None).cast("map<string,string>").alias("tags"),
    )
    lo = pts.agg(F.min("ts")).collect()[0][0]
    window_ms = 8 * 3_600_000
    dense = pts.withColumn(
        "ts", (F.lit(lo) + (F.col("ts") - lo) % window_ms).cast("long")
    ).withColumn(
        "metric",
        F.concat(F.col("metric"), F.lit("_"), (F.col("ts") % 20).cast("string")),
    )
    workdir = tempfile.mkdtemp(prefix="probe_hybrid_")
    try:
        store = MetricsStore(spark, workdir)
        store.add_data_points("gauge", dense)
        store.compact("gauge", closed_before_ms=2**62)
        svc = MetricsService(spark, store)

        rollup_win = 600_000
        rollup_dir = tempfile.mkdtemp(prefix="probe_rollup_")
        (
            store.points("gauge")
            .groupBy("tenant_id", "metric",
                     F.window(F.timestamp_millis(F.col("ts")),
                              f"{rollup_win // 1000} seconds").alias("win"))
            .agg(F.min("value").alias("min"), F.avg("value").alias("avg"),
                 F.max("value").alias("max"), F.sum("value").alias("sum"),
                 F.count("value").alias("samples"))
            .select("tenant_id", "metric",
                    F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "min", "avg", "max", "sum", "samples")
            .write.mode("overwrite").parquet(rollup_dir)
        )
        step = 1_800_000
        rlo = lo if lo % step == 0 else lo - (lo % step) + step
        cut = rlo + 10 * step
        truncated = spark.read.parquet(rollup_dir).filter(
            F.unix_millis(F.col("window_end")) <= cut
        )
        svc.attach_rollup("gauge", truncated, rollup_win)
        svc.hybrid_min_prefix_points = 0
        bks = Buckets.from_step(rlo, rlo + 14 * step, step)

        metrics = sorted(
            r["metric"] for r in store.points("gauge")
            .select("metric").distinct().limit(200).collect()
        )

        # warm
        for _ in range(4):
            svc.gauge_stats("bench", metrics[0], bks,
                            include_median=False).collect()

        def one(i: int):
            m = metrics[(i * 7) % len(metrics)]
            j0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            t0 = time.time()
            df = svc.gauge_stats("bench", m, bks, include_median=False)
            t1 = time.time()
            _ = df.columns  # force analysis
            t2 = time.time()
            df.collect()
            t3 = time.time()
            j1 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            return (t1 - t0, t2 - t1, t3 - t2, j1 - j0)

        rows = [one(i) for i in range(20)]
        rows.sort(key=lambda r: r[0] + r[1] + r[2])
        mid = rows[len(rows) // 2]
        print(f"plan={mid[0]*1000:.1f}ms analyze={mid[1]*1000:.1f}ms "
              f"execute={mid[2]*1000:.1f}ms jobs={mid[3]}")
        for lbl, idx in (("plan", 0), ("analyze", 1), ("execute", 2)):
            vals = sorted(r[idx] for r in rows)
            print(f"  {lbl}: p50={vals[10]*1000:.1f} p95={vals[18]*1000:.1f}")

        # leg timings inside plan construction
        t0 = time.time()
        parts = svc._window_partials(svc._rollups["gauge"][0], "bench",
                                     metrics[0], bks)
        t1 = time.time()
        hi = svc._rollups["gauge"][2]
        tail = svc._tail_partials("gauge", "bench", metrics[0], bks, hi)
        t2 = time.time()
        u = parts.unionByName(tail)
        zeros = spark.range(bks.count).select(
            F.col("id").alias("bucket_idx"),
            *[F.lit(None).cast("double").alias(c) for c in ("min", "max", "sum")],
            F.lit(0).cast("long").alias("samples"))
        rolled = u.unionByName(zeros).groupBy("bucket_idx").agg(
            F.min("min").alias("min"), F.max("max").alias("max"),
            F.sum("sum").alias("sum"), F.sum("samples").alias("samples"))
        t3 = time.time()
        print(f"window_partials={1000*(t1-t0):.1f}ms tail_partials="
              f"{1000*(t2-t1):.1f}ms union+agg={1000*(t3-t2):.1f}ms")

        # inside tail_partials: store read vs filters
        t0 = time.time()
        raw = store.find_data_points("gauge", "bench", metrics[0],
                                     hi, bks.end, order=None)
        t1 = time.time()
        print(f"  find_data_points={1000*(t1-t0):.1f}ms")
        t0 = time.time()
        store._read_layer("gauge", "cold")
        t1 = time.time()
        print(f"  _read_layer(cold, cached)={1000*(t1-t0):.1f}ms")
        _ = raw
        shutil.rmtree(rollup_dir, ignore_errors=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
