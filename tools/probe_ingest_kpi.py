#!/usr/bin/env python3
"""Isolated replica of bench.py's ingest KPI sections (VERDICT r9 item
1: ingest_dense_points_per_sec fell 218.6k -> 122.4k with zero
write-path changes in the diff; attribute before alarming).

Runs ONLY the ingest measurements — same shapes, same median-of-3 —
on an otherwise idle session, printing per-run times and loadavg so a
loaded pass is self-evident.  Usage:

    python tools/probe_ingest_kpi.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402
from rhq_metrics_spark.sources.store import MetricsStore  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="probe-ingest")
    pts = entry._events_points(spark, sf_dir).select(
        F.lit("bench").alias("tenant_id"),
        "metric",
        "ts",
        "value",
        F.lit(None).cast("map<string,string>").alias("tags"),
    )
    n_pts = pts.count()
    print(f"points: {n_pts}; loadavg at start: {os.getloadavg()}")

    def run(df, tag: str) -> float:
        dts = []
        for _ in range(n_runs):
            d = tempfile.mkdtemp(prefix=f"probe_{tag}_")
            t0 = time.time()
            MetricsStore(spark, d).add_data_points("gauge", df)
            dts.append(time.time() - t0)
            shutil.rmtree(d, ignore_errors=True)
        med = sorted(dts)[len(dts) // 2]
        print(
            f"{tag}: runs={[round(x, 2) for x in dts]} median={med:.2f}s "
            f"-> {n_pts / med:,.0f} pts/s  (load {os.getloadavg()[0]:.1f})"
        )
        return n_pts / med

    # backfill shape: 30-day span -> ~360 slices (per-slice commit bound)
    run(pts, "backfill")  # noqa: the warmed tail is the steady state
    # dense shape: same rows in an 8h window, metrics fanned x20
    lo = pts.agg(F.min("ts")).collect()[0][0]
    window_ms = 8 * 3_600_000
    dense = pts.withColumn(
        "ts", (F.lit(lo) + (F.col("ts") - lo) % window_ms).cast("long")
    ).withColumn(
        "metric",
        F.concat(F.col("metric"), F.lit("_"), (F.col("ts") % 20).cast("string")),
    )
    run(dense, "dense")
    spark.stop()


if __name__ == "__main__":
    main()
