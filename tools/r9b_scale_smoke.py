#!/usr/bin/env python3
"""Scale smoke for the round-9 additions: Gopher filter, C4 line clean,
BPE pair counts (1M synthetic docs) and EWMA / trimmed bucket stats
(1M synthetic points).  Times each operator and asserts the plan keeps
its 100 TB shape:

- gopher_quality_filter / c4_line_clean: scan-fused per-row
  expressions — ZERO hash exchanges attributable to the operator
- bpe_pair_counts: exchanges bounded by the two hash-aggs (word freq,
  pair sum) + the tiny top-k window — constant in corpus size
- ewma_smooth: one exchange on the series key
- trimmed_bucket_stats: one exchange (rank window + agg share the key)

Usage: python tools/r9b_scale_smoke.py [n_docs] [n_points]
Prints one JSON line with timings + plan facts.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from rhq_metrics_spark.model import Buckets  # noqa: E402
from rhq_metrics_spark.operators.anomaly import ewma_smooth  # noqa: E402
from rhq_metrics_spark.operators.stats import trimmed_bucket_stats  # noqa: E402
from rhq_metrics_spark.pipelines.text import (  # noqa: E402
    bpe_pair_counts,
    c4_line_clean,
    gopher_quality_filter,
)
from rhq_metrics_spark.session import get_spark  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark(app_name="r9b-scale-smoke")
    out: dict = {"n_docs": n_docs, "n_points": n_pts}

    # ---- 1M multi-line docs: 3-7 lines, word counts straddling the
    # Gopher band and the C4 min-words rule so both verdicts split
    did = F.col("id")
    line = F.concat(
        F.lit("the quick data line number "),
        did.cast("string"),
        F.lit(" of token "),
        (did * 2_654_435_761 % 1_000_003).cast("string"),
        # pad ~half the docs over the 50-word Gopher floor
        F.when(did % 2 == 0, F.lit(" " + "pad " * 48)).otherwise(F.lit("")),
    )
    docs = (
        spark.range(n_docs)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            did.alias("doc_id"),
            F.concat_ws(
                "\n", line, line, F.when(did % 3 == 0, line)
            ).alias("text"),
        )
        .persist()
    )
    docs.count()

    t0 = time.time()
    g = gopher_quality_filter(docs)
    n_kept = g.filter("kept").count()
    out["gopher_sec"] = round(time.time() - t0, 2)
    out["gopher_kept"] = n_kept
    assert 0 < n_kept < n_docs, "verdict must split"
    assert "SortMergeJoin" not in _plan(g)

    t0 = time.time()
    c = c4_line_clean(docs, min_words_per_line=40,
                      require_terminal_punct=False, min_kept_lines=2)
    n_kept = c.filter("kept").count()
    out["c4_sec"] = round(time.time() - t0, 2)
    out["c4_kept"] = n_kept
    assert 0 < n_kept < n_docs, "verdict must split"
    assert "SortMergeJoin" not in _plan(c)

    t0 = time.time()
    bpe = bpe_pair_counts(docs, top_k=50)
    rows = bpe.collect()
    out["bpe_sec"] = round(time.time() - t0, 2)
    out["bpe_top_pair"] = rows[0]["pair"]
    assert len(rows) == 50

    t0 = time.time()
    from rhq_metrics_spark.pipelines.sketches import cms_build, cms_estimate

    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    ).filter("w <> ''")
    sketch = cms_build(toks, "w").persist()
    n_cells = sketch.count()
    out["cms_build_sec"] = round(time.time() - t0, 2)
    out["cms_cells"] = n_cells
    assert n_cells <= 4 * 256
    t0 = time.time()
    probes = toks.groupBy("w").count().orderBy(F.desc("count"), "w").limit(20)
    est = cms_estimate(sketch, probes.select("w"), "w")
    joined = probes.join(est, "w")
    n_under = joined.filter(F.col("est_n") < F.col("count")).count()
    out["cms_probe_sec"] = round(time.time() - t0, 2)
    assert n_under == 0, "CMS one-sided guarantee violated"
    sketch.unpersist()

    t0 = time.time()
    from rhq_metrics_spark.pipelines.text import bpe_apply

    merges = [r["pair"] for r in bpe_pair_counts(docs, top_k=100).collect()]
    enc = bpe_apply(docs, merges)
    n = enc.count()
    out["bpe_apply_sec"] = round(time.time() - t0, 2)
    assert n == n_docs

    t0 = time.time()
    from rhq_metrics_spark.pipelines.text import boilerplate_line_filter

    bl = boilerplate_line_filter(docs)
    n = bl.count()
    out["boilerplate_sec"] = round(time.time() - t0, 2)
    # every synthetic line embeds its doc_id, so nothing repeats across
    # docs here — this measures the frequency-agg + join + reassembly
    # cost on an all-unique 2-3M-line corpus (the worst case for the
    # frequency table's size); the doc-frequency join legitimately
    # shuffles at vocab scale, so no broadcast assertion
    assert n == n_docs

    docs.unpersist()

    # ---- 1M points over 1k series: EWMA + trimmed buckets
    pts = (
        spark.range(n_pts)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            (did % 1000).cast("string").alias("metric"),
            (F.lit(1_700_000_000_000) + did).alias("ts"),
            ((did * 7919 % 10_000) - 5_000).alias("v100"),
        )
        .persist()
    )
    pts.count()

    t0 = time.time()
    sm = ewma_smooth(pts, on=["metric"], order=["ts"], value_col="v100")
    n = sm.count()
    out["ewma_sec"] = round(time.time() - t0, 2)
    assert n == n_pts
    assert _plan(sm).count("Exchange hashpartitioning") == 1

    t0 = time.time()
    from rhq_metrics_spark.operators.anomaly import seasonal_baseline

    sb = seasonal_baseline(
        pts.select("metric", "ts", (F.col("v100") / 100).alias("value")),
        on=["metric"],
    )
    n = sb.count()
    out["seasonal_sec"] = round(time.time() - t0, 2)
    assert n == n_pts
    assert "BroadcastHashJoin" in _plan(sb)

    buckets = Buckets(1_700_000_000_000, n_pts // 64 + 1, 64)
    t0 = time.time()
    tr = trimmed_bucket_stats(
        pts.select("ts", (F.col("v100") / 100).alias("value")), buckets
    )
    n = tr.count()
    out["trimmed_sec"] = round(time.time() - t0, 2)
    assert n == 64
    assert _plan(tr).count("Exchange hashpartitioning") == 1

    t0 = time.time()
    from rhq_metrics_spark.operators.anomaly import bucket_mad_outliers

    mo = bucket_mad_outliers(
        pts.select("ts", (F.col("v100") / 100).alias("value")), buckets
    )
    n = mo.count()
    out["mad_sec"] = round(time.time() - t0, 2)
    out["mad_flagged"] = mo.filter("is_outlier").count()
    assert n == n_pts
    assert _plan(mo).count("Exchange hashpartitioning") == 1

    pts.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
