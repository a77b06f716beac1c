#!/usr/bin/env python3
"""×100 scale checkpoint for the r11 operator families (VERDICT r11
item 7), same contract as tools/r11_scale_x100.py: run each family at
three decades of synthetic data on fixed local[32] cores and report
the ×10 / ×100 wall ratios (100 = linear; well under 100 = headroom).

Families and dials:

- w15 funnel — 100k → 1M → 10M events over 10k → 100k → 1M users
  (10 events/user at every decade: the per-user anchor tables grow
  with users, the scans with events — both decades move).
- kmv_set_ops — G=64 groups (2016 pairs) with 1k → 10k → 100k distinct
  values per group (64k → 6.4M rows): the pair fan-out is
  CONSTANT across decades (G²·k sketch rows); only the one-shot
  sketch build sees the data growth.
- pq_adc_topk — 20k → 200k → 2M vectors × 64 dims, m=8 k=16, 10
  queries, shortlist 40 + exact re-rank: the ADC scan grows linearly
  (codes), the re-rank stays shortlist × Q.

Usage: python tools/r12_scale_x100.py [family ...]   (run QUIET)
Prints one JSON line {family: {n: sec, ..., "x10": r, "x100": r}}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from rhq_metrics_spark.session import get_spark  # noqa: E402

STEPS = ["view", "click", "purchase"]


def _events(spark, n_events: int, n_users: int):
    """Counter-based event stream: ~10 events/user, step mix 5:3:2,
    timestamps spread over 30 days, all deterministic."""
    day = 86_400_000
    return spark.range(n_events, numPartitions=32).select(
        (F.col("id") % n_users).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(s) for s in
                      ["view", "view", "view", "view", "view",
                       "click", "click", "click", "purchase", "purchase"]]),
            ((F.col("id") * 7) % 10 + 1).cast("int"),
        ).alias("metric"),
        ((F.col("id") * 104_729) % (30 * day)).alias("ts"),
    )


def funnel_leg(spark, n_events: int) -> float:
    from rhq_metrics_spark.operators.funnel import funnel_steps

    ev = _events(spark, n_events, max(n_events // 10, 1)).persist()
    ev.count()
    t0 = time.time()
    funnel_steps(ev, STEPS, window_ms=7 * 86_400_000).count()
    dt = time.time() - t0
    ev.unpersist()
    return dt


def kmv_leg(spark, per_group: int) -> float:
    from rhq_metrics_spark.pipelines.sketches import (
        kmv_set_ops,
        kmv_sketch_rows,
    )

    G = 64
    # ~25% of each group's values come from a shared pool (real overlap
    # for the estimators to find); the rest are group-private
    df = spark.range(G * per_group, numPartitions=32).select(
        F.concat(F.lit("g"), (F.col("id") % G).cast("string")).alias("grp"),
        F.when(
            F.col("id") % 4 == 0,
            F.concat(F.lit("shared-"), (F.floor(F.col("id") / 4) % per_group).cast("string")),
        ).otherwise(
            F.concat(F.lit("v"), (F.col("id") % G).cast("string"),
                     F.lit("-"), F.floor(F.col("id") / G).cast("string"))
        ).alias("val"),
    )
    t0 = time.time()
    sk = kmv_sketch_rows(df, "grp", "val", k=64, n_salts=8)
    n = kmv_set_ops(sk, k=64, max_pairs=3000).count()
    dt = time.time() - t0
    assert n == G * (G - 1) // 2, n
    return dt


def pq_leg(spark, n_vecs: int) -> float:
    from rhq_metrics_spark.pipelines.similarity import (
        pq_adc_topk,
        pq_codebook,
        pq_train_encode,
    )

    emb = spark.range(n_vecs, numPartitions=32).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (((F.col("id") * (i + 7) + i * i) % 1000).cast("double")
                       / 1000.0),
        ).alias("embedding"),
    ).persist()
    emb.count()
    codes = pq_train_encode(emb, m=8, k=16, iters=1).localCheckpoint()
    book = pq_codebook(emb, codes, m=8).localCheckpoint()
    qs = emb.filter(F.col("vec_id") % (n_vecs // 10) == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t0 = time.time()
    pq_adc_topk(
        codes, book, qs, k_top=5, m=8, rerank_with=emb, shortlist=40
    ).count()
    dt = time.time() - t0
    emb.unpersist()
    return dt


FAMILIES = {
    "w15_funnel": (funnel_leg, [100_000, 1_000_000, 10_000_000]),
    "sketch_kmv_setops": (kmv_leg, [1_000, 10_000, 100_000]),
    "pq_adc_topk": (pq_leg, [20_000, 200_000, 2_000_000]),
}


def main() -> None:
    names = sys.argv[1:] or list(FAMILIES)
    spark = get_spark(app_name="r12-scale-x100")
    load0 = open("/proc/loadavg").read().split()[0]
    out: dict = {}
    for name in names:
        fn, decades = FAMILIES[name]
        row = {}
        for n in decades:
            # best-of-2 per decade (the r11 harness convention): the
            # first decade otherwise pays the whole family's JIT/codegen
            # warm-in and the ratios read better than they are
            row[str(n)] = round(min(fn(spark, n), fn(spark, n)), 2)
        lo, mid, hi = (row[str(n)] for n in decades)
        row["x10"] = round(mid / lo, 2)
        row["x100"] = round(hi / lo, 2)
        out[name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    out["load_start"] = load0
    out["load_end"] = open("/proc/loadavg").read().split()[0]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
