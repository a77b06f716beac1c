#!/usr/bin/env python3
"""Dedup scale smoke: a boilerplate-heavy corpus that would be
impossible without the hot-bucket cap.

Synthesizes ``n_docs`` documents (default 1M): one mega-group of
``mega`` identical docs (its band bucket alone would mean ~mega²/2 ≈
5·10⁹ candidate pairs uncapped — the classic straggler), ``n_groups``
mid-size duplicate groups (all-pairs, under the cap), and unique
filler.  Runs minhash_lsh_pairs with the default cap + verification and
checks the pair counts are exactly the expected hub-star + all-pairs
totals.

Usage: python tools/dedup_scale_smoke.py [n_docs] [mega] [n_groups] [group_size]
Prints one JSON line with timings + counts.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from rhq_metrics_spark.pipelines.dedup import minhash_lsh_pairs  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mega = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_groups = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000
    group_size = int(sys.argv[4]) if len(sys.argv) > 4 else 50

    spark = get_spark(app_name="dedup-scale-smoke")
    grouped = mega + n_groups * group_size
    assert grouped < n_docs

    did = F.col("id")
    text = (
        F.when(
            did < mega,
            F.lit("the shared mega boilerplate text that appears on every page"),
        )
        .when(
            did < grouped,
            F.concat(
                F.lit("group boilerplate variant number "),
                ((did - mega) / group_size).cast("long").cast("string"),
                F.lit(" repeated across the member documents"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("unique document "),
                did.cast("string"),
                F.lit(" content token "),
                (did * 2_654_435_761 % 1_000_003).cast("string"),
                F.lit(" tail "),
                (did * 97 % 89).cast("string"),
            )
        )
    )
    docs = (
        spark.range(n_docs)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(did.alias("doc_id"), text.alias("text"))
    )

    t0 = time.time()
    pairs = minhash_lsh_pairs(docs, threshold=0.5).persist()
    n_pairs = pairs.count()
    dt = round(time.time() - t0, 2)

    mega_pairs = pairs.filter(F.col("id_b") < mega).count()
    group_pairs = pairs.filter(
        (F.col("id_a") >= mega) & (F.col("id_b") < grouped)
    ).count()
    want_mega = mega - 1  # hub stars: every member pairs with min id
    want_group = n_groups * group_size * (group_size - 1) // 2  # all-pairs
    ok = (mega_pairs == want_mega) and (group_pairs == want_group)

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "mega_bucket": mega,
                "pairs_total": n_pairs,
                "mega_pairs": mega_pairs,
                "want_mega": want_mega,
                "group_pairs": group_pairs,
                "want_group": want_group,
                "exact": ok,
                "seconds": dt,
            }
        )
    )
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
