#!/usr/bin/env python3
"""Scale smoke for the round-10 wave-2 operators: URL canonical dedup,
tokenizer fertility, importance sampling, mean-shift changepoints,
anomalous-series triage, and seasonal forecast bands.  Times each leg
at >= 1M rows and asserts the plans keep their 100 TB shape:

- url_canonical_dedup: canonicalization scan-fused, ONE hash-agg on
  the canonical key
- tokenizer_fertility: scan-fused counts, one tiny group agg
- importance_sample: one scalar agg BROADCAST onto the corpus, hash
  filter fused with the scan (no data shuffle)
- mean_shift_changepoints: ONE exchange on the series key (six frame
  aggregates share one sort)
- rank_anomalous_series: the z-score exchange collapses to one row per
  series; the global top-k ranks #series rows, never points
- seasonal_forecast_bands: pure projection over the profile partials

Usage: python tools/r10b_scale_smoke.py [n_rows]
Run QUIET (no concurrent pytest/bench — VERDICT r9 item 7).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from rhq_metrics_spark.operators.anomaly import (  # noqa: E402
    _seasonal_binned,
    mean_shift_changepoints,
    rank_anomalous_series,
    seasonal_forecast_bands,
    seasonal_profile,
)
from rhq_metrics_spark.pipelines.sampling import importance_sample  # noqa: E402
from rhq_metrics_spark.pipelines.text import (  # noqa: E402
    tokenizer_fertility,
    url_canonical_dedup,
)
from rhq_metrics_spark.session import get_spark  # noqa: E402


def _plan(df) -> str:
    # after execution AQE's toString appends an "== Initial Plan =="
    # section that would double-count every exchange
    p = df._jdf.queryExecution().executedPlan().toString()
    return p.split("== Initial Plan ==")[0]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="r10b-scale-smoke")
    out: dict = {"n_rows": n}

    # ---- URL canonical dedup: n URLs over n/50 pages, every rule hot
    urls = spark.range(n, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % 3 == 0, F.lit("HTTPS://WWW.")).otherwise(
                F.lit("https://")
            ),
            F.lit("site"), (F.col("id") % (n // 50)).cast("string"),
            F.lit(".com"),
            F.when(F.col("id") % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
            F.lit("/p"), (F.col("id") % (n // 50)).cast("string"),
            F.when(F.col("id") % 5 == 0, F.lit("?utm_source=m")).otherwise(
                F.lit("")
            ),
            F.when(F.col("id") % 7 == 0, F.lit("#f")).otherwise(F.lit("")),
        ).alias("url"),
    )
    t0 = time.time()
    uc = url_canonical_dedup(urls)
    n_canon = uc.count()
    out["url_canon_sec"] = round(time.time() - t0, 2)
    assert n_canon <= n // 50 * 2, n_canon
    plan = _plan(uc)
    out["url_canon_hash_exchanges"] = plan.count("Exchange hashpartitioning")
    assert out["url_canon_hash_exchanges"] == 1, plan
    assert "SortMergeJoin" not in plan

    # ---- fertility over n docs, 8 langs
    docs = spark.range(n, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("l"), (F.col("id") % 8)).alias("lang"),
        F.concat(
            F.lit("word"), F.col("id").cast("string"),
            F.lit(" can't stop 123 x."),
        ).alias("text"),
    ).persist()
    docs.count()
    t0 = time.time()
    fert = tokenizer_fertility(docs)
    rows = fert.collect()
    out["fertility_sec"] = round(time.time() - t0, 2)
    assert len(rows) == 8 and all(r["tokens_per_word_ppm"] > 0 for r in rows)
    plan = _plan(fert)
    assert plan.count("Exchange hashpartitioning") == 1, plan

    # ---- importance sampling over n docs, weights 1..1000
    weighted = docs.select(
        "doc_id", ((F.col("doc_id") % 1000) + 1).cast("long").alias("w")
    )
    t0 = time.time()
    kept = importance_sample(weighted, "w", 1_000_000)
    n_kept = kept.count()
    out["importance_sec"] = round(time.time() - t0, 2)
    assert 0 < n_kept < n
    plan = _plan(kept)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    out["importance_kept"] = n_kept

    # ---- changepoints + triage: 10k series x (n/10k) points
    n_series = 10_000
    pts = spark.range(n, numPartitions=32).select(
        (F.col("id") % n_series).cast("string").alias("key"),
        (F.col("id") / n_series).cast("long").alias("ts"),
        (
            (F.col("id") % 37).cast("double")
            + F.when((F.col("id") / n_series).cast("long") > (n // n_series) // 2,
                     100.0).otherwise(0.0)
        ).alias("value"),
    ).persist()
    pts.count()
    t0 = time.time()
    cp = mean_shift_changepoints(pts, on=["key"], order=["ts"], window_n=10)
    n_cp = cp.count()
    out["changepoint_sec"] = round(time.time() - t0, 2)
    assert n_cp == n
    plan = _plan(cp)
    assert plan.count("Exchange hashpartitioning") == 1, plan

    t0 = time.time()
    tri = rank_anomalous_series(
        pts, on=["key"], order=["ts"], window_n=20, top_k=25
    )
    n_tri = tri.count()
    out["triage_sec"] = round(time.time() - t0, 2)
    assert n_tri == 25

    # ---- seasonal forecast bands over a 100k-series profile
    binned = _seasonal_binned(
        pts.select(F.col("key").alias("metric"),
                   (F.col("ts") * 3_600_000).alias("ts"), "value"),
        "ts", "value", 86_400_000, 24, 100,
    )
    prof = seasonal_profile(binned, ["metric"]).persist()
    prof.count()
    t0 = time.time()
    bands = seasonal_forecast_bands(prof, ["metric"])
    n_bands = bands.count()
    out["forecast_bands_sec"] = round(time.time() - t0, 2)
    assert n_bands == prof.count()
    # finalization is a pure projection: no NEW exchange beyond the
    # cached profile's own aggregation
    assert "Exchange hashpartitioning" not in _plan(
        bands
    ).split("InMemoryTableScan")[0], "bands must be a projection"

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
