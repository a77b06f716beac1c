#!/usr/bin/env python3
"""Scale smoke: synthesize N points (default 10M) across many series,
write them through the store's partitioned layout, and time the core
operators — evidence that the plans hold beyond the sf0.1 testdata.

Usage: python tools/scale_smoke.py [n_points] [n_series]
Prints one JSON line with per-stage timings.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from rhq_metrics_spark.model import Buckets  # noqa: E402
from rhq_metrics_spark.operators import (  # noqa: E402
    numeric_bucket_stats,
    periods,
    predicate,
    rate,
    stacked_stats,
)
from rhq_metrics_spark.session import get_spark  # noqa: E402
from rhq_metrics_spark.sources.store import MetricsStore  # noqa: E402

T0 = 1_700_000_000_000


def main() -> None:
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_series = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark(app_name="scale-smoke")
    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 2)
        print(f"# {name}: {timings[name]}s -> {out}", file=sys.stderr)

    # deterministic synthetic series: n_series metrics, ~10s cadence,
    # 48h span, mixed tenants — generated fully distributed (spark.range)
    span_ms = 48 * 3_600_000
    pts = spark.range(n_points).select(
        F.concat(F.lit("t"), (F.col("id") % 4).cast("string")).alias("tenant_id"),
        F.concat(F.lit("m"), (F.col("id") % n_series).cast("string")).alias("metric"),
        (F.lit(T0) + (F.col("id") * span_ms) / n_points).cast("long").alias("ts"),
        (F.sin(F.col("id") / 1000.0) * 100 + (F.col("id") % 7)).alias("value"),
        F.lit(None).cast("map<string,string>").alias("tags"),
    )

    workdir = tempfile.mkdtemp(prefix="scale_smoke_")
    try:
        store = MetricsStore(spark, workdir)
        timed("ingest", lambda: store.add_data_points("gauge", pts) or n_points)
        timed("compact_all", lambda: len(store.compact("gauge", 2**62)))

        view = store.points("gauge")
        buckets = Buckets.from_step(T0, T0 + span_ms, 3_600_000)
        timed(
            "bucket_stats_per_series",
            lambda: numeric_bucket_stats(
                view, buckets, group_cols=["tenant_id", "metric"], approx=True
            ).count(),
        )
        timed(
            "stacked_stats",
            lambda: stacked_stats(view, buckets).count(),
        )
        timed("rate_all_series", lambda: rate(view).count())
        timed(
            "periods",
            lambda: periods(view, predicate("gt", 90.0)).count(),
        )
        timed(
            "pruned_single_series_scan",
            lambda: store.find_data_points(
                "gauge", "t1", "m101", T0, T0 + 6 * 3_600_000
            ).count(),
        )

        # dense-slice storage efficiency (Gorilla axis): bytes per point
        # in the compacted cold layer — here each 2h slice holds
        # ~n_points/24 rows, so parquet encoding, not per-file overhead,
        # dominates (contrast with bench.py's sparse-backfill number)
        cold_bytes = sum(
            f.stat().st_size
            for f in Path(workdir).rglob("*.parquet")
            if "/cold/" in str(f)
        )
        timings["cold_bytes_per_point"] = round(cold_bytes / n_points, 3)
        print(f"# cold_bytes_per_point: {timings['cold_bytes_per_point']}", file=sys.stderr)

        # as-of alignment across ALL series (2×n_points rows through the
        # single keyed shuffle of operators/asof.py)
        from rhq_metrics_spark.operators.asof import asof_join  # noqa: E402
        from rhq_metrics_spark.operators.sessions import session_stats  # noqa: E402

        # both asof sides derive from the same store view — persist it
        # once (as a real pipeline would) so the LWW read doesn't run
        # twice inside the join
        base = view.select("tenant_id", "metric", "ts", "value").persist()
        timed("points_cache_materialize", lambda: base.count())
        left = base
        right = base.select(
            "tenant_id", "metric", (F.col("ts") - 1).alias("ts"),
            F.col("value").alias("prev_value"),
        )
        # count the MATCHED column (not plain count()) — otherwise column
        # pruning elides the last-value window and the timing is a lie
        timed(
            "asof_join_all_series",
            lambda: asof_join(
                left, right, on=["tenant_id", "metric"], right_cols=["prev_value"]
            )
            .agg(F.count("prev_value_right"))
            .collect()[0][0],
        )
        # realistic: gap > the ~173s series cadence -> one session/series
        timed(
            "sessionize_all_series",
            lambda: session_stats(
                left, on=["tenant_id", "metric"], gap_ms=200_000
            ).count(),
        )
        # sessionization with gap < cadence -> every point its own
        # session: worst-case session cardinality through the rollup
        timed(
            "sessionize_worst_case",
            lambda: session_stats(
                left, on=["tenant_id", "metric"], gap_ms=100_000
            ).count(),
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    print(json.dumps({"n_points": n_points, "n_series": n_series, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
