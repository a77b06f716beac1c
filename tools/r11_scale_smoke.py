#!/usr/bin/env python3
"""Quiet 1M-row scale smokes for the round-11 operators:

- kmv_sketch_rows + kmv_set_ops at n values across 8 groups — the
  data-sized work is the sketch build (one distinct + two bounded rank
  passes); the set algebra touches only G²·k sketch rows.
- dataset_profile at n docs — one fingerprint exchange (the exact-dedup
  cost class, hot boilerplate absorbed map-side) + one rollup agg.
- dataset_diff at n vs n docs — one co-partitioned full-outer join on
  the id, narrow rows, one agg.

Usage: python tools/r11_scale_smoke.py [n_rows]   (run QUIET)
Prints one JSON line of wall-clock + asserted plan facts.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from rhq_metrics_spark.pipelines.profile import (  # noqa: E402
    dataset_diff,
    dataset_profile,
)
from rhq_metrics_spark.pipelines.sketches import (  # noqa: E402
    kmv_set_ops,
    kmv_sketch_rows,
)
from rhq_metrics_spark.session import get_spark  # noqa: E402


def _plan(df) -> str:
    # after execution AQE's toString appends an "== Initial Plan =="
    # section that would double-count every exchange
    p = df._jdf.queryExecution().executedPlan().toString()
    return p.split("== Initial Plan ==")[0]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="r11-scale-smoke")
    out: dict = {"n_rows": n}

    # -- KMV sketch + set algebra over 8 groups; values hash into a
    # universe of n/2 so group vocabularies genuinely overlap
    vals = spark.range(n, numPartitions=32).select(
        F.concat(F.lit("g"), (F.col("id") % 8).cast("string")).alias("grp"),
        F.concat(
            F.lit("v"),
            (F.abs(F.hash(F.col("id").cast("string"))) % (n // 2)).cast("string"),
        ).alias("val"),
    ).persist()
    vals.count()
    t0 = time.time()
    sk = kmv_sketch_rows(vals, "grp", "val", k=64)
    sk_rows = sk.count()
    out["kmv_sketch_sec"] = round(time.time() - t0, 1)
    assert sk_rows == 8 * 64, sk_rows  # exactly k rows per group
    skp = sk.persist()
    skp.count()
    t0 = time.time()
    ops = kmv_set_ops(skp, k=64)
    pairs = {(p["grp_a"], p["grp_b"]): p for p in ops.collect()}
    out["kmv_setops_sec"] = round(time.time() - t0, 1)
    assert len(pairs) == 28  # 8 choose 2
    plan = _plan(ops)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # exact truth for one pair: the estimates must land inside the
    # published KMV error bars (4 sigma; sigma_union ~ U/sqrt(k-2),
    # sigma_jaccard ~ sqrt(J(1-J)/k))
    a = vals.filter("grp = 'g0'").select("val").distinct()
    b = vals.filter("grp = 'g1'").select("val").distinct()
    na, nb = a.count(), b.count()
    ni = a.intersect(b).count()
    nu = na + nb - ni
    true_j = ni / nu
    est = pairs[("g0", "g1")]
    out["kmv_true_union"] = nu
    out["kmv_est_union"] = round(est["union_est"], 1)
    out["kmv_true_jaccard"] = round(true_j, 4)
    out["kmv_est_jaccard"] = round(est["jaccard"], 4)
    assert abs(est["union_est"] - nu) / nu < 4 / (62 ** 0.5), est
    assert abs(est["jaccard"] - true_j) < 4 * (true_j * (1 - true_j) / 64) ** 0.5 + 1e-9
    skp.unpersist()
    vals.unpersist()

    # -- dataset profile over n docs, 16 sources, planted 20% exact dups
    docs = spark.range(n, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 5 == 0,
            F.lit("the shared boilerplate body repeated verbatim"),
        )
        .otherwise(
            F.concat(
                F.lit("unique body "),
                F.col("id").cast("string"),
                F.lit(" words "),
                (F.col("id") * 13).cast("string"),
            )
        )
        .alias("text"),
        F.concat(F.lit("l"), (F.col("id") % 4).cast("string")).alias("lang"),
        F.concat(F.lit("s"), (F.col("id") % 16).cast("string")).alias("source"),
    ).persist()
    docs.count()
    t0 = time.time()
    prof = dataset_profile(docs)
    rows = {r["source"]: r for r in prof.collect()}
    out["profile_sec"] = round(time.time() - t0, 1)
    assert len(rows) == 17  # 16 sources + ALL
    al = rows["ALL"]
    assert al["n_docs"] == n
    assert al["dup_docs"] == n // 5  # every boilerplate doc is a dup
    assert al["uniq_texts"] == n - n // 5 + 1
    assert al["dup_ppm"] == (n // 5) * 1_000_000 // n

    # -- dataset diff: new = docs; old = docs minus one source, with
    # every id%7 edited and a retired block removed
    old = docs.filter(F.col("source") != "s0").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" stale")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "source",
    )
    t0 = time.time()
    diff = dataset_diff(old, docs)
    drows = {r["source"]: r for r in diff.collect()}
    out["diff_sec"] = round(time.time() - t0, 1)
    added = sum(r["added"] for r in drows.values())
    changed = sum(r["changed"] for r in drows.values())
    assert added == docs.filter("source = 's0'").count()
    # ids%7 edited, except those in the added source (no old row) and
    # except boilerplate ids whose edit still differs -> all %7 outside
    # s0 count as changed
    exp_changed = docs.filter(
        (F.col("doc_id") % 7 == 0) & (F.col("source") != "s0")
    ).count()
    assert changed == exp_changed, (changed, exp_changed)
    plan = _plan(diff)
    assert "SortMergeJoin FullOuter" in plan or "FullOuter" in plan, plan

    docs.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
