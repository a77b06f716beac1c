#!/usr/bin/env python3
"""Quiet scale smoke for the r12 operators: priority sampling and
blocked fuzzy (edit-distance) matching, each at two decades so the
per-10x wall ratio is measured, not asserted.

- priority_sample: 1M and 10M weighted rows, k=100.  Selection is a
  TakeOrderedAndProject; wall should be one scan, ratio ~= 10x rows /
  fixed cores (linear, no shuffle).
- fuzzy_blocked_pairs: 100k and 1M synthetic docs with a blocking key
  chosen so blocks hold ~20 members at BOTH scales (the real-world
  contract: blocking keys stay selective as the corpus grows, the
  BLOCK COUNT scales, not the block size).  Wall should be linear in
  #blocks; the levenshtein cost per pair is prefix-bounded.

Usage: python tools/r12b_scale_smoke.py   (run QUIET)
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
from rhq_metrics_spark.pipelines.sampling import priority_sample  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402


def _synth_docs(spark, n: int, block_size: int = 20):
    """Deterministic corpus: ~n/block_size blocking keys (lang x first
    token), per-doc text = first token + 12 id-derived words; ~5% of
    docs get a 1-char typo twin signal via a shared word pattern."""
    n_toks = max(1, n // block_size)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("l"), (F.col("id") % 5).cast("string")).alias("lang"),
        F.concat(
            F.lit("tok"),
            (F.xxhash64(F.col("id")) % n_toks).cast("string"),
            F.lit(" "),
            F.concat_ws(
                " ",
                *[
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"w{j}:"), F.col("id").cast("string"))),
                            1,
                            6,
                        ),
                        16,
                        10,
                    )
                    for j in range(12)
                ],
            ),
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark(app_name="r12b-scale-smoke")
    out: dict = {"loadavg": round(os.getloadavg()[0], 1)}

    # -- priority sampling: 1M -> 10M rows -------------------------------
    for n in (1_000_000, 10_000_000):
        rows = spark.range(n).select(
            F.col("id").alias("doc_id"),
            ((F.col("id") * 37) % 9000 + 1).alias("n_chars"),
        )
        t0 = time.time()
        got = priority_sample(rows, k=100).collect()
        out[f"priority_sample_{n}_sec"] = round(time.time() - t0, 1)
        assert len(got) == 100
        assert all(r["est_weight_r"] >= r["weight"] for r in got)
    out["priority_sample_x10_ratio"] = round(
        out["priority_sample_10000000_sec"] / out["priority_sample_1000000_sec"], 2
    )

    # -- blocked fuzzy matching: 100k -> 1M docs -------------------------
    for n in (100_000, 1_000_000):
        docs = _synth_docs(spark, n).persist()
        docs.count()
        t0 = time.time()
        pairs = fuzzy_blocked_pairs(docs, min_sim=0.3, max_block=200).count()
        out[f"fuzzy_blocked_{n}_sec"] = round(time.time() - t0, 1)
        out[f"fuzzy_blocked_{n}_pairs"] = pairs
        docs.unpersist()
    out["fuzzy_blocked_x10_ratio"] = round(
        out["fuzzy_blocked_1000000_sec"] / out["fuzzy_blocked_100000_sec"], 2
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
