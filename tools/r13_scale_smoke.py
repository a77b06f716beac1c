#!/usr/bin/env python3
"""Quiet scale smoke for the four late-r12 operators that landed after
the r12 smoke pass (VERDICT r12 item 2) — two decades each for a
measured per-10x wall ratio:

- event_transitions (W17): 1M and 10M events, ~20 events/user over 8
  event types — exercises the user-key window + the (from, to) pair
  hash-agg (from-totals ride a window over the #type^2-row pair table).
- ngram_diversity: 100k and 1M docs with deliberate HEAD-GRAM SKEW
  (30% of positions drawn from a 50-word head vocabulary) — exercises
  the per-(group, n) count_distinct agg under the skew its map-side
  partials must absorb.
- readability_scores: 100k and 1M docs — scan-fused, zero exchanges;
  the ratio should be ~linear-or-flat (fixed job overhead dominates).
- priority_sample_per_group: 1M and 10M rows over 10k groups, k=10 —
  verifies the WindowGroupLimit rewrite caps the shuffle (asserted in
  the executed plan) and that wall tracks the scan, not the window.

Usage: python tools/r13_scale_smoke.py   (run QUIET)
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

from rhq_metrics_spark.operators.funnel import event_transitions  # noqa: E402
from rhq_metrics_spark.pipelines.profile import ngram_diversity  # noqa: E402
from rhq_metrics_spark.pipelines.sampling import (  # noqa: E402
    priority_sample_per_group,
)
from rhq_metrics_spark.pipelines.text import readability_scores  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402

EVENTS_PER_USER = 20
N_TYPES = 8
WORDS_PER_DOC = 16
VOCAB = 40_000
HEAD_VOCAB = 50  # every 3rd position draws from this head set


def synth_events(spark, n: int):
    """~20 events/user over 8 types; ts strictly increasing per user so
    the window order is unique (the operator's determinism contract)."""
    return spark.range(n).select(
        (F.col("id") % (n // EVENTS_PER_USER)).alias("user_id"),
        F.concat(
            F.lit("ev"), (F.abs(F.xxhash64("id")) % N_TYPES).cast("string")
        ).alias("metric"),
        (F.col("id") / (n // EVENTS_PER_USER)).cast("long").alias("ts"),
        ((F.col("id") % 1000) / 10.0).alias("value"),
    )


def synth_skewed_docs(spark, n: int):
    """Docs with head-gram skew: positions divisible by 3 draw from a
    50-word head vocab, the rest from 40k — so unigram/bigram hash-agg
    keys concentrate hard on the head."""
    words = []
    for j in range(WORDS_PER_DOC):
        vocab = HEAD_VOCAB if j % 3 == 0 else VOCAB
        words.append(
            F.concat(
                F.lit("w"),
                (F.abs(F.xxhash64(F.col("id") * WORDS_PER_DOC + j)) % vocab).cast(
                    "string"
                ),
            )
        )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"),
        F.concat(F.lit("s"), (F.col("id") % 10).cast("string")).alias("source"),
    )


def main() -> None:
    spark = get_spark(app_name="r13-scale-smoke")
    out: dict = {"loadavg": round(os.getloadavg()[0], 1)}

    for n in (1_000_000, 10_000_000):
        ev = synth_events(spark, n).persist()
        ev.count()
        t0 = time.time()
        rows = event_transitions(ev).collect()
        out[f"w17_{n}_sec"] = round(time.time() - t0, 1)
        assert len(rows) == N_TYPES * N_TYPES
        assert sum(r["transitions"] for r in rows) == n - n // EVENTS_PER_USER
        ev.unpersist()
    out["w17_x10_ratio"] = round(
        out["w17_10000000_sec"] / out["w17_1000000_sec"], 2
    )

    for n in (100_000, 1_000_000):
        docs = synth_skewed_docs(spark, n).persist()
        docs.count()
        t0 = time.time()
        rows = ngram_diversity(docs).collect()
        out[f"diversity_{n}_sec"] = round(time.time() - t0, 1)
        assert len(rows) == 10 * 3  # 10 sources x n in (1,2,3)
        uni = [r for r in rows if r["n"] == 1]
        assert sum(r["total_ngrams"] for r in uni) == n * WORDS_PER_DOC
        docs.unpersist()
    out["diversity_x10_ratio"] = round(
        out["diversity_1000000_sec"] / out["diversity_100000_sec"], 2
    )

    for n in (100_000, 1_000_000):
        docs = synth_skewed_docs(spark, n).persist()
        docs.count()
        t0 = time.time()
        assert readability_scores(docs).count() == n
        out[f"readability_{n}_sec"] = round(time.time() - t0, 1)
        docs.unpersist()
    out["readability_x10_ratio"] = round(
        out["readability_1000000_sec"] / out["readability_100000_sec"], 2
    )

    n_groups = 10_000
    for n in (1_000_000, 10_000_000):
        rows_df = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("g"), (F.col("id") % n_groups).cast("string")).alias(
                "source"
            ),
            ((F.col("id") * 37) % 9000 + 1).alias("n_chars"),
        )
        samp = priority_sample_per_group(rows_df, k=10, group_cols=["source"])
        t0 = time.time()
        got = samp.count()
        out[f"priority_group_{n}_sec"] = round(time.time() - t0, 1)
        assert got == n_groups * 10
        plan = samp._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "WindowGroupLimit" in plan, "WindowGroupLimit rewrite missing"
    out["priority_group_x10_ratio"] = round(
        out["priority_group_10000000_sec"] / out["priority_group_1000000_sec"], 2
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
