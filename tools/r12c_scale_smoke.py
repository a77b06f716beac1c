#!/usr/bin/env python3
"""Quiet scale smoke for the second r12 wave: Kneser–Ney LM scoring
and integer PageRank, each at two decades for a measured per-10x wall
ratio.

- kneser_ney_score: 100k and 1M synthetic docs drawn from a FIXED 40k
  word vocabulary (the realistic regime: corpus grows, vocabulary
  saturates).  The KN count tables are |distinct bigrams|-bounded, so
  past saturation the extra wall is the corpus-sized legs only
  (bigram extraction + the scored join).
- pagerank: 100k and 1M nodes with 3 edges/node (8 supersteps).  Work
  per superstep is one |edges| join + one |nodes| agg — wall should be
  ~linear in graph size on fixed cores.

Usage: python tools/r12c_scale_smoke.py   (run QUIET)
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

from rhq_metrics_spark.pipelines.graph import pagerank  # noqa: E402
from rhq_metrics_spark.pipelines.text import kneser_ney_score  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402

VOCAB = 40_000
WORDS_PER_DOC = 16


def _synth_docs(spark, n: int):
    """Deterministic docs over a fixed vocab: word j of doc i is
    xxhash-derived — same vocabulary at every corpus size."""
    words = [
        F.concat(
            F.lit("w"),
            (F.abs(F.xxhash64(F.col("id") * WORDS_PER_DOC + j)) % VOCAB).cast(
                "string"
            ),
        )
        for j in range(WORDS_PER_DOC)
    ]
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )


def main() -> None:
    spark = get_spark(app_name="r12c-scale-smoke")
    out: dict = {"loadavg": round(os.getloadavg()[0], 1)}

    for n in (100_000, 1_000_000):
        docs = _synth_docs(spark, n).persist()
        docs.count()
        t0 = time.time()
        res = kneser_ney_score(docs)
        n_docs = res.count()
        out[f"kn_score_{n}_sec"] = round(time.time() - t0, 1)
        assert n_docs == n
        n_bigrams = res.agg(F.sum("n_bigrams")).first()[0]
        assert n_bigrams == n * (WORDS_PER_DOC - 1)
        docs.unpersist()
    out["kn_score_x10_ratio"] = round(
        out["kn_score_1000000_sec"] / out["kn_score_100000_sec"], 2
    )

    for n in (100_000, 1_000_000):
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
        pr = pagerank(ids, pairs, iters=8)
        n_out = pr.count()
        out[f"pagerank_{n}_sec"] = round(time.time() - t0, 1)
        assert n_out == n
    out["pagerank_x10_ratio"] = round(
        out["pagerank_1000000_sec"] / out["pagerank_100000_sec"], 2
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
