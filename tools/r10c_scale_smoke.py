#!/usr/bin/env python3
"""Scale smoke for substring_self_dedup and train_logistic.

- self-dedup at n docs with a planted hot boilerplate passage (the
  worst case: one window hash at ~n/2 sites — the min/count partials
  must absorb it map-side, no single-task straggler)
- logistic training at n labeled docs x 3 iterations: per-iteration
  cost is two corpus passes; driver state dim+1 floats

Usage: python tools/r10c_scale_smoke.py [n_docs]   (run QUIET)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from rhq_metrics_spark.pipelines.classify import train_logistic  # noqa: E402
from rhq_metrics_spark.pipelines.text import (  # noqa: E402
    substring_self_dedup,
)
from rhq_metrics_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    spark = get_spark(app_name="r10c-scale-smoke")
    out: dict = {"n_docs": n}

    # every even doc carries the same 8-token boilerplate passage; odd
    # docs are unique -> one window hash at n/2 sites (hot key)
    docs = spark.range(n, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(
                F.lit("uniq"), F.col("id").cast("string"),
                F.lit(" the shared boilerplate passage appears here "
                      "verbatim again and again tail"),
            ),
        ).otherwise(
            F.concat(
                F.lit("unique body "), F.col("id").cast("string"),
                F.lit(" with distinct words "),
                (F.col("id") * 7).cast("string"), F.lit(" "),
                (F.col("id") * 13).cast("string"), F.lit(" "),
                (F.col("id") * 29).cast("string"), F.lit(" "),
                (F.col("id") * 37).cast("string"), F.lit(" "),
                (F.col("id") * 41).cast("string"), F.lit(" done"),
            )
        ).alias("text"),
    ).persist()
    docs.count()
    t0 = time.time()
    sd = substring_self_dedup(docs, window=8)
    n_out = sd.count()
    out["self_dedup_sec"] = round(time.time() - t0, 2)
    assert n_out == n
    removed = sd.agg(F.sum("n_removed_tokens")).collect()[0][0]
    # ~half the docs lose their boilerplate copy (the first keeps it)
    assert removed > 0
    out["self_dedup_removed_tokens"] = int(removed)

    labeled = docs.withColumn(
        "label", (F.col("doc_id") % 2 == 0).cast("double")
    )
    t0 = time.time()
    trained = train_logistic(labeled, dim=1024, iters=3, lr=0.5)
    out["train_logistic_3it_sec"] = round(time.time() - t0, 2)
    assert len(trained["losses"]) == 3
    assert trained["losses"][-1] < trained["losses"][0]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
