#!/usr/bin/env python3
"""×100 checkpoint for the r12 operator families: a THIRD decade on top
of the r12b/r12c two-decade smokes, so each family has a measured
100k → 1M → 10M curve (fixed local[32] cores; ×100 would be linear
wall at 100× data).

- priority_sample: 1M → 10M → 100M weighted rows, k=100.
- fuzzy_blocked_pairs: 100k → 1M → 10M docs, ~20-member blocks.
- kneser_ney_score: 100k → 1M → 10M docs over a fixed 40k vocab.
- pagerank: 100k → 1M → 10M nodes at 3 edges/node, 8 supersteps.

Usage: python tools/r12d_scale_x100.py [family ...]   (run QUIET)
Families: priority fuzzy kn pagerank (default: all)
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

from rhq_metrics_spark.pipelines.dedup import fuzzy_blocked_pairs  # noqa: E402
from rhq_metrics_spark.pipelines.graph import pagerank  # noqa: E402
from rhq_metrics_spark.pipelines.sampling import priority_sample  # noqa: E402
from rhq_metrics_spark.pipelines.text import kneser_ney_score  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402
from tools.r12b_scale_smoke import _synth_docs as _fuzzy_docs  # noqa: E402
from tools.r12c_scale_smoke import _synth_docs as _kn_docs  # noqa: E402


def main() -> None:
    fams = set(sys.argv[1:]) or {"priority", "fuzzy", "kn", "pagerank"}
    spark = get_spark(app_name="r12d-scale-x100")
    out: dict = {"loadavg": round(os.getloadavg()[0], 1)}

    if "priority" in fams:
        for n in (1_000_000, 10_000_000, 100_000_000):
            rows = spark.range(n).select(
                F.col("id").alias("doc_id"),
                ((F.col("id") * 37) % 9000 + 1).alias("n_chars"),
            )
            t0 = time.time()
            got = priority_sample(rows, k=100).collect()
            out[f"priority_{n}_sec"] = round(time.time() - t0, 1)
            assert len(got) == 100

    if "fuzzy" in fams:
        for n in (100_000, 1_000_000, 10_000_000):
            docs = _fuzzy_docs(spark, n).persist()
            docs.count()
            t0 = time.time()
            out[f"fuzzy_{n}_pairs"] = fuzzy_blocked_pairs(
                docs, min_sim=0.3, max_block=200
            ).count()
            out[f"fuzzy_{n}_sec"] = round(time.time() - t0, 1)
            docs.unpersist()

    if "kn" in fams:
        for n in (100_000, 1_000_000, 10_000_000):
            docs = _kn_docs(spark, n).persist()
            docs.count()
            t0 = time.time()
            assert kneser_ney_score(docs).count() == n
            out[f"kn_{n}_sec"] = round(time.time() - t0, 1)
            docs.unpersist()

    if "pagerank" in fams:
        for n in (100_000, 1_000_000, 10_000_000):
            ids = spark.range(n).select(F.col("id").alias("doc_id"))
            pairs = (
                spark.range(n * 3)
                .select(
                    (F.col("id") % n).alias("id_a"),
                    (F.abs(F.xxhash64(F.col("id"))) % n).alias("id_b"),
                )
                .filter("id_a != id_b")
            )
            t0 = time.time()
            assert pagerank(ids, pairs, iters=8).count() == n
            out[f"pagerank_{n}_sec"] = round(time.time() - t0, 1)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
