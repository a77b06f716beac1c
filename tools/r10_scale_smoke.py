#!/usr/bin/env python3
"""Scale smoke for the round-10 operators: HLL registers, Bloom
build/probe, temperature mixture, and the iterative BPE merge trainer.
Times each leg at >= 1M rows and asserts the plans keep their 100 TB
shape:

- hll_registers: ONE hash exchange whose key space is groups x m
  registers (map-side partials absorb all value skew); the estimate is
  a projection over <= groups x m rows
- bloom_build: ONE hash exchange into <= n_bits/32 cells; the probe
  side joins the bloom by BROADCAST (the point of the sketch)
- temperature mixture: one tiny group agg broadcast back onto the
  corpus — identical plan family to token_mixture (audited r9)
- bpe_learn_merges: per merge, one argmax collect of ONE row + one
  localCheckpoint over the WORD table — the corpus is scanned once at
  the start; iteration cost is bounded by vocabulary, not corpus

Usage: python tools/r10_scale_smoke.py [n_rows]
Prints one JSON line with timings + plan facts.  Run QUIET (no
concurrent pytest/bench — VERDICT r9 item 7).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from rhq_metrics_spark.pipelines.sampling import (  # noqa: E402
    temperature_mixture_sample,
)
from rhq_metrics_spark.pipelines.sketches import (  # noqa: E402
    bloom_build,
    bloom_probe,
    hll_estimate,
    hll_registers,
)
from rhq_metrics_spark.pipelines.text import bpe_learn_merges  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="r10-scale-smoke")
    out: dict = {"n_rows": n}

    # ---- HLL at n values, 8 groups, heavy duplication (skew absorbed
    # map-side: every value appears ~4x)
    vals = spark.range(n, numPartitions=32).select(
        (F.col("id") % 8).cast("string").alias("g"),
        F.concat(F.lit("v"), (F.col("id") % (n // 4))).alias("v"),
    ).persist()
    vals.count()
    t0 = time.time()
    regs = hll_registers(vals, "g", "v")
    est = hll_estimate(regs, "g")
    rows = est.collect()
    out["hll_sec"] = round(time.time() - t0, 2)
    assert len(rows) == 8
    true_per_group = n // 4 // 8
    for r in rows:
        assert abs(r["est"] - true_per_group) / true_per_group < 0.45, r
    plan = _plan(regs)
    out["hll_hash_exchanges"] = plan.count("Exchange hashpartitioning")
    assert out["hll_hash_exchanges"] == 1, plan  # ONE agg exchange
    assert "SortMergeJoin" not in plan

    # ---- Bloom: build over n/4 distinct fingerprints, probe 100k
    t0 = time.time()
    bloom = bloom_build(vals.select("v"), "v", n_bits=1 << 20)
    n_words = bloom.count()
    out["bloom_build_sec"] = round(time.time() - t0, 2)
    assert n_words <= (1 << 20) // 32
    probes = spark.range(100_000).select(
        F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    t0 = time.time()
    pr = bloom_probe(bloom, probes, "v", n_bits=1 << 20)
    n_maybe = pr.filter("maybe_present").count()
    out["bloom_probe_sec"] = round(time.time() - t0, 2)
    # all 100k probes are true members (ids < n//4): no false negatives
    assert n_maybe == 100_000, n_maybe
    plan = _plan(pr)
    assert "BroadcastExchange" in plan, "bloom side must broadcast"
    assert "SortMergeJoin" not in plan
    out["bloom_probe_hash_exchanges"] = plan.count("Exchange hashpartitioning")

    # ---- temperature mixture over n docs, 8 sources
    docs = spark.range(n, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 8)).alias("source"),
        F.concat(F.lit("tok "), F.lit("word "), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    t0 = time.time()
    mix = temperature_mixture_sample(docs, 2, n * 2)
    n_out = mix.count()
    out["temp_mixture_sec"] = round(time.time() - t0, 2)
    assert n_out > 0
    plan = _plan(mix)
    assert "BroadcastExchange" in plan, "plan must broadcast onto corpus"
    assert "SortMergeJoin" not in plan
    out["temp_mixture_hash_exchanges"] = plan.count(
        "Exchange hashpartitioning"
    )

    # ---- BPE merge training: corpus of n short docs over a ~40k-word
    # vocabulary; 10 merges.  Iteration cost is vocab-bounded — the
    # corpus collapses to the word table in the FIRST hash-agg.
    corpus = spark.range(n, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha"), (F.col("id") % 40_000).cast("string"),
            F.lit(" beta"), (F.col("id") % 997).cast("string"),
        ).alias("text"),
    )
    t0 = time.time()
    merges = bpe_learn_merges(corpus, 10)
    out["bpe_learn10_sec"] = round(time.time() - t0, 2)
    assert len(merges) == 10, merges

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
