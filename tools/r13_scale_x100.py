#!/usr/bin/env python3
"""×100 checkpoint for the late-r12 families (VERDICT r12 item 6) plus
the re-measured Kneser–Ney adversarial case with the r13 ``min_count``
prune (item 4).  Third decade on top of tools/r13_scale_smoke.py:

- event_transitions: 1M → 10M → 100M events (~20 ev/user, 8 types).
- ngram_diversity: 100k → 1M → 10M head-skewed docs — the
  count_distinct agg is the one new skew-sensitive surface.
- priority_sample_per_group: 1M → 10M → 100M rows over 1M groups,
  k=10 — the WindowGroupLimit shuffle carries O(groups·k) = 10M rows
  at the top decade, never the corpus.
- kneser_ney_score(min_count=2): 100k → 1M → 10M UNIFORM-RANDOM docs
  (the adversarial |types| ≈ |tokens| corpus that measured ×100 = 33.8
  exact in r12d) — the count cutoff prunes singleton bigram types
  before the TYPES-table windows, so the adversarial case stays
  types-bounded.

Usage: python tools/r13_scale_x100.py [family ...]   (run QUIET)
Families: w17 diversity priority_group kn_pruned (default: all)
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
from rhq_metrics_spark.pipelines.text import kneser_ney_score  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402
from tools.r12c_scale_smoke import _synth_docs as _kn_docs  # noqa: E402
from tools.r13_scale_smoke import (  # noqa: E402
    N_TYPES,
    synth_events,
    synth_skewed_docs,
)


def main() -> None:
    fams = set(sys.argv[1:]) or {"w17", "diversity", "priority_group", "kn_pruned"}
    spark = get_spark(app_name="r13-scale-x100")
    out: dict = {"loadavg": round(os.getloadavg()[0], 1)}

    if "w17" in fams:
        for n in (1_000_000, 10_000_000, 100_000_000):
            ev = synth_events(spark, n)
            t0 = time.time()
            rows = event_transitions(ev).collect()
            out[f"w17_{n}_sec"] = round(time.time() - t0, 1)
            assert len(rows) == N_TYPES * N_TYPES
            assert sum(r["transitions"] for r in rows) == n - n // 20

    if "diversity" in fams:
        for n in (100_000, 1_000_000, 10_000_000):
            docs = synth_skewed_docs(spark, n)
            t0 = time.time()
            rows = ngram_diversity(docs).collect()
            out[f"diversity_{n}_sec"] = round(time.time() - t0, 1)
            assert len(rows) == 30

    if "priority_group" in fams:
        n_groups = 1_000_000
        for n in (1_000_000, 10_000_000, 100_000_000):
            rows_df = spark.range(n).select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.lit("g"), (F.col("id") % n_groups).cast("string")
                ).alias("source"),
                ((F.col("id") * 37) % 9000 + 1).alias("n_chars"),
            )
            t0 = time.time()
            got = priority_sample_per_group(
                rows_df, k=10, group_cols=["source"]
            ).count()
            out[f"priority_group_{n}_sec"] = round(time.time() - t0, 1)
            assert got == min(n, n_groups * 10)

    if "kn_pruned" in fams:
        for n in (100_000, 1_000_000, 10_000_000):
            docs = _kn_docs(spark, n).persist()
            docs.count()
            t0 = time.time()
            scored = kneser_ney_score(docs, min_count=2).count()
            out[f"kn_pruned_{n}_sec"] = round(time.time() - t0, 1)
            out[f"kn_pruned_{n}_docs"] = scored  # docs with >=1 surviving bigram
            docs.unpersist()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
