#!/usr/bin/env python3
"""Scale smoke for the round-3 operators: interval join, rolling
z-score, multi-grain rollup, top-k per group — synthesized 10M points
and 100k intervals, far beyond the sf0.1 testdata, to show the plans
hold (no per-key cross products, windows stay one-shuffle, rollup stays
one Expand).

Usage: python tools/ops_scale_smoke.py [n_points] [n_series]
Prints one JSON line with per-stage timings.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from rhq_metrics_spark.operators import (  # noqa: E402
    interval_join,
    rolling_zscore,
    time_rollup,
)
from rhq_metrics_spark.session import get_spark  # noqa: E402

T0 = 1_700_000_000_000
HOUR = 3_600_000


def main() -> None:
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_series = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark(app_name="ops-scale-smoke")
    out: dict[str, float] = {"n_points": n_points, "n_series": n_series}

    # ~48h of points across n_series keys, deterministic values
    pts = spark.range(n_points).select(
        (F.col("id") % n_series).alias("key"),
        (T0 + (F.col("id") / n_series).cast("long") * (48 * HOUR * n_series // n_points)).alias("ts"),
        (F.pmod(F.xxhash64("id"), 10_000) / 100.0).alias("value"),
    ).persist()
    pts.count()

    # 10 intervals per key (~2h each) derived deterministically
    n_iv = n_series * 10
    iv = spark.range(n_iv).select(
        (F.col("id") % n_series).alias("key"),
        (T0 + (F.col("id") / n_series).cast("long") * 4 * HOUR).alias("start"),
        (T0 + (F.col("id") / n_series).cast("long") * 4 * HOUR + 2 * HOUR).alias("end"),
        F.col("id").alias("iv_id"),
    )

    t = time.time()
    n = interval_join(pts, iv, on=["key"], bucket_ms=2 * HOUR).count()
    out["interval_join_sec"] = round(time.time() - t, 2)
    out["interval_join_rows"] = n

    t = time.time()
    n = (
        rolling_zscore(pts, on=["key"], order=["ts", "value"], window_n=20)
        .filter(F.col("is_anomaly"))
        .count()
    )
    out["rolling_zscore_sec"] = round(time.time() - t, 2)
    out["anomalies"] = n

    t = time.time()
    out["time_rollup_rows"] = time_rollup(
        pts.withColumnRenamed("key", "metric")
    ).count()
    out["time_rollup_sec"] = round(time.time() - t, 2)

    from pyspark.sql import Window

    t = time.time()
    w = Window.partitionBy("key").orderBy(
        F.col("value").desc(), F.col("ts").asc()
    )
    out["topk_rows"] = (
        pts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .count()
    )
    out["topk_sec"] = round(time.time() - t, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
