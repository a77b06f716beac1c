#!/usr/bin/env python3
"""Scale smoke for the unigram-LM trainer (VERDICT r11 item 5): BPE
training has a 1M-doc row in SCALE.md; this gives unigram_lm_train the
same treatment.  Corpus = n docs of 8 words drawn from a bounded
~40k-word vocabulary (the E-step's cost driver is |distinct words|,
not corpus size — this smoke MEASURES that claim instead of arguing it
from the docstring).

Usage: python tools/r12_scale_smoke.py [n_docs]   (run QUIET)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from rhq_metrics_spark.pipelines.text import (  # noqa: E402
    unigram_apply,
    unigram_lm_train,
)
from rhq_metrics_spark.session import get_spark  # noqa: E402

VOCAB_WORDS = 40_000


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="r12-scale-smoke")
    out: dict = {"n_docs": n, "vocab_words": VOCAB_WORDS}

    # 8 words per doc, deterministic mixed-frequency draw from the
    # bounded vocabulary: every 5th word slot draws from a 997-word hot
    # head, the rest spread over the full ~40k tail — a Zipf-ish shape
    # without randomness
    word = (
        lambda expr: F.concat(F.lit("tok"), expr.cast("string"))  # noqa: E731
    )
    docs = spark.range(n, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                word(
                    F.when(
                        (F.col("id") + i) % 5 == 0,
                        (F.col("id") * 13 + i) % 997,
                    ).otherwise((F.col("id") * p + i * 101) % VOCAB_WORDS)
                )
                for i, p in enumerate([7, 13, 29, 37, 41, 53, 61, 71])
            ],
        ).alias("text"),
    ).persist()
    docs.count()

    t0 = time.time()
    model = unigram_lm_train(
        docs, vocab_size=8_000, em_iters=1, max_rounds=6
    )
    out["unigram_train_sec"] = round(time.time() - t0, 2)
    out["unigram_rounds"] = model["rounds"]
    out["unigram_seed_n"] = model["seed_n"]
    out["unigram_pieces"] = len(model["logprobs"])
    out["unigram_sec_per_round"] = round(
        out["unigram_train_sec"] / max(model["rounds"], 1), 2
    )
    # the E-step bound the docstring claims: |distinct words|
    out["distinct_words"] = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .count()
    )

    t0 = time.time()
    enc = unigram_apply(docs, model["logprobs"])
    total_pieces = enc.agg(F.sum("n_subwords")).collect()[0][0]
    out["unigram_apply_sec"] = round(time.time() - t0, 2)
    out["pieces_per_doc"] = round(total_pieces / n, 2)

    docs.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
