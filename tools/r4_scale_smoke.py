#!/usr/bin/env python3
"""Scale smoke for the round-4 operators: pairwise correlation, linear
trend, distinct-cardinality rollup (exact + HLL sketch path), SymSpell
fuzzy join, and heavy hitters — synthesized inputs far beyond the sf0.1
testdata, to show the plans hold (correlation's bucket join stays
per-bucket-bounded, the sketch path touches slices not points, the
fuzzy join stays linear, MG state stays O(1/phi)).

Usage: python tools/r4_scale_smoke.py [n_points] [n_series] [n_strings]
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

from rhq_metrics_spark.operators.cardinality import (  # noqa: E402
    distinct_from_sketches,
    distinct_rollup,
    hll_sketch_rollup,
)
from rhq_metrics_spark.operators.correlate import (  # noqa: E402
    linear_trend,
    metric_correlation,
)
from rhq_metrics_spark.pipelines.fuzzy import fuzzy_self_join  # noqa: E402
from rhq_metrics_spark.pipelines.sketches import heavy_hitters  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402

T0 = 1_700_000_000_000
HOUR = 3_600_000
DAY = 24 * HOUR


def main() -> None:
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_series = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_strings = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    spark = get_spark(app_name="r4-scale-smoke")
    out: dict[str, float] = {
        "n_points": n_points, "n_series": n_series, "n_strings": n_strings
    }

    # 30 days of points across n_series metrics (correlation fanout is
    # series^2 per bucket — 100 series x 720 hourly buckets = 3.6M pairs
    # rows, the curated-set contract)
    pts = spark.range(n_points).select(
        F.concat(F.lit("m"), (F.col("id") % n_series)).alias("metric"),
        (T0 + (F.col("id") / n_series).cast("long")
         * (30 * DAY * n_series // n_points)).alias("ts"),
        (F.pmod(F.xxhash64("id"), 10_000) / 100.0).alias("value"),
        F.concat(F.lit("u"), F.pmod(F.xxhash64("id", F.lit(7)), 500_000)).alias("user_id"),
    ).persist()
    pts.count()

    t = time.time()
    n = metric_correlation(pts, HOUR).count()
    out["correlation_sec"] = round(time.time() - t, 2)
    out["correlation_pairs"] = n

    t = time.time()
    n = linear_trend(pts, HOUR).count()
    out["trend_sec"] = round(time.time() - t, 2)

    t = time.time()
    n = distinct_rollup(pts, DAY).count()
    out["distinct_exact_sec"] = round(time.time() - t, 2)
    out["distinct_rows"] = n

    t = time.time()
    sk = hll_sketch_rollup(pts, 2 * HOUR).persist()
    n_sk = sk.count()
    out["sketch_build_sec"] = round(time.time() - t, 2)
    out["sketch_rows"] = n_sk
    t = time.time()
    distinct_from_sketches(sk, DAY).count()
    out["sketch_serve_sec"] = round(time.time() - t, 2)
    sk.unpersist()
    pts.unpersist()

    # fuzzy join over n_strings synthetic words (vocab-scale input);
    # ~36^4 4-grams means heavy collision structure, the hard case
    words = spark.range(n_strings).select(
        F.lower(F.conv(F.pmod(F.xxhash64("id"), 36 ** 5).cast("string"), 10, 36)).alias("w")
    ).persist()
    words.count()
    t = time.time()
    n = fuzzy_self_join(words, "w", max_distance=1).count()
    out["fuzzy_sec"] = round(time.time() - t, 2)
    out["fuzzy_pairs"] = n
    words.unpersist()

    # heavy hitters over a zipf-ish stream: hash-spread tail + hot head
    vals = spark.range(n_points).select(
        F.when(F.pmod(F.xxhash64("id"), 100) < 5,
               F.concat(F.lit("hot"), F.pmod(F.xxhash64("id", F.lit(3)), 3)))
        .otherwise(F.concat(F.lit("t"), F.pmod(F.xxhash64("id", F.lit(5)), 1_000_000)))
        .alias("t")
    )
    t = time.time()
    hh = heavy_hitters(vals, "t", phi=0.01)
    out["heavy_hitters_found"] = hh.count()
    out["heavy_hitters_sec"] = round(time.time() - t, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
