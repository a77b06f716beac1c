#!/usr/bin/env python3
"""Quiet two-decade scale smoke for the r13 operator waves:

- active_users (exact interval-merge) + active_users_hll (register
  twin): 1M and 10M events.
- frequent_paths: 1M and 10M events (one user-key window for all
  leads, one path hash-agg).
- attribution: 1M and 10M events (one last-ignore-nulls window).
- funnel_step_latency: 1M and 10M events over a 3-step funnel.
- collocations: 100k and 1M docs (bigram+unigram hash-aggs).
- hard_negatives: 100k and 1M corpus vectors x 10 queries (brute
  force by design — the ANN-shortlist composition is the scale path;
  this measures the honest exact leg).

Usage: python tools/r13b_scale_smoke.py   (run QUIET)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from rhq_metrics_spark.operators.funnel import (  # noqa: E402
    active_users,
    active_users_hll,
    attribution,
    frequent_paths,
    funnel_step_latency,
)
from rhq_metrics_spark.pipelines.similarity import hard_negatives  # noqa: E402
from rhq_metrics_spark.pipelines.text import collocations  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402
from tools.r13_scale_smoke import synth_events, synth_skewed_docs  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="r13b-scale-smoke")
    out: dict = {"loadavg": round(os.getloadavg()[0], 1)}

    for n in (1_000_000, 10_000_000):
        ev = synth_events(spark, n).persist()
        ev.count()

        t0 = time.time()
        au = active_users(ev, period_ms=1, windows=(1, 3, 7)).count()
        out[f"active_users_{n}_sec"] = round(time.time() - t0, 1)
        assert au == 20 * 3  # 20 ts periods x 3 windows

        t0 = time.time()
        ah = active_users_hll(ev, period_ms=1, windows=(1, 3, 7)).count()
        out[f"active_users_hll_{n}_sec"] = round(time.time() - t0, 1)
        assert ah == 20 * 3

        t0 = time.time()
        fp = frequent_paths(ev, length=3, k=20).collect()
        out[f"frequent_paths_{n}_sec"] = round(time.time() - t0, 1)
        assert len(fp) == 20

        t0 = time.time()
        at = attribution(ev, "ev0", ["ev1", "ev2"], lookback_ms=5).collect()
        out[f"attribution_{n}_sec"] = round(time.time() - t0, 1)
        assert sum(r["conversions"] for r in at) > 0

        t0 = time.time()
        sl = funnel_step_latency(ev, ["ev0", "ev1", "ev2"]).collect()
        out[f"step_latency_{n}_sec"] = round(time.time() - t0, 1)
        assert [r["step_idx"] for r in sl] == [2, 3]
        ev.unpersist()
    for op in ("active_users", "active_users_hll", "frequent_paths",
               "attribution", "step_latency"):
        out[f"{op}_x10_ratio"] = round(
            out[f"{op}_10000000_sec"] / out[f"{op}_1000000_sec"], 2
        )

    for n in (100_000, 1_000_000):
        docs = synth_skewed_docs(spark, n).persist()
        docs.count()
        t0 = time.time()
        cc = collocations(docs, k=20, min_count=5).collect()
        out[f"collocations_{n}_sec"] = round(time.time() - t0, 1)
        assert len(cc) == 20
        docs.unpersist()
    out["collocations_x10_ratio"] = round(
        out["collocations_1000000_sec"] / out["collocations_100000_sec"], 2
    )

    dim = 16
    for n in (100_000, 1_000_000):
        emb = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    ((F.abs(F.xxhash64(F.col("id") * dim + j)) % 1000)
                     / 1000.0 + 0.001).cast("double")
                    for j in range(dim)
                ]
            ).alias("embedding"),
        ).persist()
        emb.count()
        q = emb.filter(F.col("vec_id") < 10)
        t0 = time.time()
        hn = hard_negatives(emb, q, k=5, max_cosine=0.999).count()
        out[f"hard_negatives_{n}_sec"] = round(time.time() - t0, 1)
        assert hn == 50
        emb.unpersist()
    out["hard_negatives_x10_ratio"] = round(
        out["hard_negatives_1000000_sec"] / out["hard_negatives_100000_sec"], 2
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
