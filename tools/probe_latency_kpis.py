#!/usr/bin/env python3
"""Isolated quiet-machine probe for the r11 perf-weak latency KPIs
(VERDICT r11 item 1): ``stats_pct_hist_latency_p95_ms`` (500.9 ms in
the r11 pass, 2.54x best-ever 197.2) and ``stats_query_100m_sec``
(1.0 s, 1.56x best 0.64).

Replicates exactly the bench's dense-store setup (bench.py:760-785)
and the two KPI sections (bench.py:266-286 and :392-397), but runs
them ALONE — no preceding 50-query pass, no ingest sections — with
loadavg stamped at the boundaries so the result is self-evidently
quiet.  Methodology matches the bench sections that already earned the
debt-shed treatment: full GC before sampling, best-of-2 twenty-sample
sections for the latency pair, warm + best-of-2 for the seconds KPI.

Usage: python tools/probe_latency_kpis.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402


def main() -> None:
    import shutil

    import pyspark.sql.functions as F

    from rhq_metrics_spark.model import Buckets
    from rhq_metrics_spark.service import MetricsService
    from rhq_metrics_spark.sources.store import MetricsStore

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=32)
    load0 = open("/proc/loadavg").read().split()[0]

    # dense-store setup, verbatim from bench.py:730-785
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
    dense_dir = tempfile.mkdtemp(prefix="probe_store_dense_")
    out = {}
    try:
        store = MetricsStore(spark, dense_dir)
        store.add_data_points("gauge", dense)
        store.compact("gauge", closed_before_ms=2**62)
        svc = MetricsService(spark, store)
        sources = sorted(
            r["metric"] for r in store.points("gauge")
            .select(F.split("metric", "_")[0].alias("metric")).distinct().collect()
        )
        metrics = [f"{s}_{i}" for s in sources for i in range(20)]
        bks = Buckets.from_count(lo, lo + window_ms, 60)

        def _latency(fn, n=20, warmup=2):
            for _ in range(warmup):
                fn(0)
            lat = []
            for i in range(n):
                t0 = time.time()
                fn(i)
                lat.append(time.time() - t0)
            lat.sort()
            return (
                round(lat[len(lat) // 2] * 1000, 1),
                round(lat[int(n * 0.95) - 1] * 1000, 1),
            )

        def _latency_best2(fn, **kw):
            a = _latency(fn, **kw)
            spark.sparkContext._jvm.System.gc()
            b = _latency(fn, **kw)
            return min(a, b)

        # hist-percentile serving setup, verbatim from bench.py:193-284
        rollup_win = 600_000
        rollup_dir = tempfile.mkdtemp(prefix="probe_rollup_")
        (
            store.points("gauge")
            .groupBy(
                "tenant_id", "metric",
                F.window(
                    F.timestamp_millis(F.col("ts")), f"{rollup_win // 1000} seconds"
                ).alias("win"),
            )
            .agg(
                F.min("value").alias("min"), F.avg("value").alias("avg"),
                F.max("value").alias("max"), F.sum("value").alias("sum"),
                F.count("value").alias("samples"),
            )
            .select(
                "tenant_id", "metric",
                F.col("win.start").alias("window_start"),
                F.col("win.end").alias("window_end"),
                "min", "avg", "max", "sum", "samples",
            )
            .write.mode("overwrite").parquet(rollup_dir)
        )
        svc.attach_rollup("gauge", rollup_dir, rollup_win)
        step = 1_800_000
        rlo = lo if lo % step == 0 else lo - (lo % step) + step
        routed_bks = Buckets.from_step(rlo, rlo + 12 * step, step)
        hist_dir = tempfile.mkdtemp(prefix="probe_hist_")
        lo_v, hi_v, n_bins = 0.0, 250.0, 125
        svc.build_histogram_rollup(
            "gauge", rollup_win, lo_v, hi_v, n_bins
        ).write.mode("overwrite").parquet(hist_dir)
        svc.attach_histogram_rollup(
            "gauge", hist_dir, rollup_win, lo_v, hi_v, n_bins)
        probe = svc.gauge_stats(
            "bench", metrics[0], routed_bks, percentiles=(90, 95, 99),
            percentile_impl="hist",
        )
        assert not any("points" in f for f in probe.inputFiles()), "not routed"

        spark.sparkContext._jvm.System.gc()
        p50, p95 = _latency_best2(lambda i: svc.gauge_stats(
            "bench", metrics[(i * 7) % len(metrics)], routed_bks,
            percentiles=(90, 95, 99), percentile_impl="hist",
        ).collect(), warmup=4)
        out["stats_pct_hist_latency_p50_ms"] = p50
        out["stats_pct_hist_latency_p95_ms"] = p95
        shutil.rmtree(hist_dir, ignore_errors=True)
        shutil.rmtree(rollup_dir, ignore_errors=True)

        # stats_query_100m (bench.py:392-397) — warm + best-of-2
        def _q100m(stacked: bool) -> float:
            t0 = time.time()
            svc.stats_query("bench", bks, {"gauge": metrics}, stacked=stacked)
            return time.time() - t0

        _q100m(True)  # warm (file listing + codegen)
        out["stats_query_100m_stacked_sec"] = round(min(_q100m(True), _q100m(True)), 3)
        out["stats_query_100m_sec"] = round(min(_q100m(False), _q100m(False)), 3)
    finally:
        shutil.rmtree(dense_dir, ignore_errors=True)

    load1 = open("/proc/loadavg").read().split()[0]
    print(json.dumps({
        "isolated": out, "load_start": load0, "load_end": load1,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
