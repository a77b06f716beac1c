#!/usr/bin/env python3
"""Leg-level timing probe for the ``dedup_clusters`` headline query
(VERDICT r7 item 1: 4.10 s -> 6.97 s regression survived best-of-2).

Splits the query into its sequential legs and times each one:

  1. pairgen      — minhash_lsh_pairs plan built + materialized
                    (the same work the standalone ``dedup_minhash_lsh``
                    bench query performs)
  2. edge_ckpt    — symmetrize + distinct + localCheckpoint (re-runs
                    pairgen INSIDE dup_clusters; the checkpoint is the
                    only execution of the pair plan there)
  3. edge_count   — edges.count() on the checkpointed RDD (route gate)
  4. collect_uf   — edges.collect() + driver union-find + mapping build
  5. label_join   — createDataFrame(mapping) broadcast-joined to ids,
                    executed to completion

Run:  python tools/probe_dedup_clusters.py [sf_dir] [repeats]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402
from rhq_metrics_spark.pipelines.dedup import minhash_lsh_pairs  # noqa: E402


def probe(spark, sf_dir: str) -> dict:
    t = {}
    docs = entry._table(spark, sf_dir, "documents")

    t0 = time.time()
    pairs = minhash_lsh_pairs(
        docs, n=3, num_hashes=entry.MH_HASHES, bands=entry.MH_BANDS,
        threshold=entry.MH_T,
    )
    pairs.count()
    t["pairgen"] = time.time() - t0

    t0 = time.time()
    edges = (
        pairs.select(F.col("id_a").alias("_src"), F.col("id_b").alias("_dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("_src"), F.col("id_a").alias("_dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    t["edge_ckpt"] = time.time() - t0

    t0 = time.time()
    n_edges = edges.count()
    t["edge_count"] = time.time() - t0

    t0 = time.time()
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    rows = edges.collect()
    t["collect"] = time.time() - t0
    t0 = time.time()
    for row in rows:
        a, b = find(row["_src"]), find(row["_dst"])
        if a != b:
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo
    mapping = [(x, find(x)) for x in list(parent)]
    t["union_find"] = time.time() - t0

    t0 = time.time()
    ids = docs.select("doc_id")
    mdf = spark.createDataFrame(mapping, "`doc_id` bigint, _root bigint")
    out = ids.join(F.broadcast(mdf), "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("_root"), F.col("doc_id")).alias("cluster_id"),
        (F.coalesce(F.col("_root"), F.col("doc_id")) == F.col("doc_id")).alias(
            "is_canonical"
        ),
    )
    out.count()
    t["label_join"] = time.time() - t0

    t["n_edges"] = n_edges
    t["n_mapping"] = len(mapping)
    t["total"] = sum(v for k, v in t.items() if k not in ("n_edges", "n_mapping"))
    return t


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("probe-dedup-clusters")
    runs = []
    for i in range(repeats):
        spark.catalog.clearCache()
        r = probe(spark, sf_dir)
        r = {k: (round(v, 3) if isinstance(v, float) else v) for k, v in r.items()}
        runs.append(r)
        print(json.dumps({"run": i, **r}))
    # best-of (mirrors bench.py's best-of-2 recording)
    best = min(runs, key=lambda r: r["total"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
