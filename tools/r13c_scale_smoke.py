#!/usr/bin/env python3
"""Quiet two-decade scale smoke for the late-r13 operators:

- fs_field_weights: 100k and 1M LABELED PAIRS over a 200k-doc side
  table — verifies pair-linearity of the double id join + flag aggs.
- lang_confusion: 100k and 1M docs — scan-fused scoring + one matrix
  hash-agg.
- (length_histogram measured in-line earlier; curation_v2 is a
  composition of individually-smoked stages.)

Usage: python tools/r13c_scale_smoke.py   (run QUIET)
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

from rhq_metrics_spark.pipelines.dedup import fs_field_weights  # noqa: E402
from rhq_metrics_spark.pipelines.profile import lang_confusion  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402
from tools.r13_scale_smoke import synth_skewed_docs  # noqa: E402

N_DOCS = 200_000


def main() -> None:
    spark = get_spark(app_name="r13c-scale-smoke")
    out: dict = {"loadavg": round(os.getloadavg()[0], 1)}

    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 20).cast("string")).alias("source"),
        (F.abs(F.xxhash64("id")) % 40 + 1).cast("int").alias("len_bucket"),
    ).persist()
    docs.count()
    for n in (100_000, 1_000_000):
        pairs = spark.range(n).select(
            (F.abs(F.xxhash64(F.col("id") * 2)) % N_DOCS).alias("id_a"),
            (F.abs(F.xxhash64(F.col("id") * 2 + 1)) % N_DOCS).alias("id_b"),
            (F.col("id") % 10 == 0).alias("is_match"),
        ).filter("id_a != id_b")
        t0 = time.time()
        rows = fs_field_weights(docs, pairs, ("source", "len_bucket")).collect()
        out[f"fs_weights_{n}_sec"] = round(time.time() - t0, 1)
        assert len(rows) == 4  # 2 fields x 2 labels
    out["fs_weights_x10_ratio"] = round(
        out["fs_weights_1000000_sec"] / out["fs_weights_100000_sec"], 2
    )
    docs.unpersist()

    for n in (100_000, 1_000_000):
        d = synth_skewed_docs(spark, n).withColumn(
            "lang",
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ),
        ).persist()
        d.count()
        t0 = time.time()
        rows = lang_confusion(d).collect()
        out[f"lang_confusion_{n}_sec"] = round(time.time() - t0, 1)
        assert sum(r["n_docs"] for r in rows) == n
        d.unpersist()
    out["lang_confusion_x10_ratio"] = round(
        out["lang_confusion_1000000_sec"] / out["lang_confusion_100000_sec"], 2
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
