#!/usr/bin/env python3
"""Incremental-dedup scale smoke: batch-vs-standing-index latency as
the corpus index grows.

The 100 TB claim under test: deduping a fixed-size batch against the
index costs ~O(batch), NOT O(corpus) — the batch side is broadcast, the
index is scanned (map-side bucket join) but never shuffled, so doubling
the corpus should move batch latency by file-scan time only, far less
than 2x.  Also verifies decisions: every planted duplicate of a corpus
doc is flagged with est 1.0; planted novel docs stay new.

Synthesizes a corpus of ``n_corpus`` documents from deterministic token
soup, indexes it ONCE (parquet), then dedups a ``n_batch`` batch that
is half exact copies of corpus docs, half novel.

Usage: python tools/incremental_dedup_smoke.py [n_corpus ...] [--batch N]
Defaults: corpus sizes 20000 80000, batch 2000.
Prints one JSON line per corpus size with timings + check results.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from rhq_metrics_spark.pipelines.dedup import (  # noqa: E402
    dedup_against_index,
    index_bucket_stats,
    minhash_index,
)
from rhq_metrics_spark.session import get_spark  # noqa: E402

#: deterministic 40-word vocabulary soup: doc i's text is 12 tokens
#: drawn by md5 — unique docs collide on full signatures with
#: negligible probability, so expected dups == planted dups
_TEXT = (
    "concat_ws(' ', transform(sequence(0, 11), "
    "j -> substr(md5(concat(cast(id as string), ':', cast(j as string))), 1, 6)))"
)


def synth_corpus(spark, n: int):
    return spark.range(n).selectExpr("id AS doc_id", f"{_TEXT} AS text")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sizes = [int(a) for a in args] or [20_000, 80_000]
    n_batch = 2000
    for a in sys.argv[1:]:
        if a.startswith("--batch"):
            n_batch = int(a.split("=", 1)[1] if "=" in a else sys.argv[
                sys.argv.index(a) + 1])
    spark = get_spark("incremental-dedup-smoke")
    for n_corpus in sizes:
        corpus = synth_corpus(spark, n_corpus)
        idx_dir = tempfile.mkdtemp(prefix="inc_idx_")
        t0 = time.time()
        minhash_index(corpus).write.mode("overwrite").parquet(idx_dir)
        t_index = time.time() - t0
        idx = spark.read.parquet(idx_dir)
        stats = index_bucket_stats(idx, 6).persist()
        stats.count()

        # batch: half exact copies of corpus docs (ids shifted up), half novel
        half = n_batch // 2
        dups = spark.range(half).selectExpr(
            f"id + {2 * max(sizes)} AS doc_id",
            # copy of corpus doc id*7 % n_corpus
            f"(id * 7) % {n_corpus} AS _src",
        ).selectExpr(
            "doc_id",
            _TEXT.replace("cast(id as string)",
                          "cast(_src as string)") + " AS text",
        )
        novel_text = _TEXT.replace(
            "cast(id as string)", "concat('novel', cast(id as string))"
        )
        novel = spark.range(half).selectExpr(
            f"id + {3 * max(sizes)} AS doc_id",
            f"{novel_text} AS text",
        )
        batch = dups.unionByName(novel).persist()
        batch.count()

        t0 = time.time()
        dec = dedup_against_index(
            batch, idx, corpus_bucket_stats=stats
        ).persist()
        n_new = dec.filter(F.col("is_new")).count()
        n_dup = dec.filter(~F.col("is_new")).count()
        t_batch = time.time() - t0
        exact = dec.filter(
            (~F.col("is_new")) & (F.col("est_jaccard") == 1.0)
        ).count()
        plan = dec._jdf.queryExecution().executedPlan().toString()

        # the KMV verify leg at the same corpus size (r9): index carries
        # the bottom-k sketch; decisions re-scored on it.  The claim:
        # verified batch latency stays O(batch) too — the sketch join is
        # broadcast-candidates against the index, never a corpus shuffle.
        kmv_dir = tempfile.mkdtemp(prefix="inc_idx_kmv_")
        minhash_index(corpus, kmv_k=128).write.mode("overwrite").parquet(kmv_dir)
        idx_kmv = spark.read.parquet(kmv_dir)
        t0 = time.time()
        decv = dedup_against_index(
            batch, idx_kmv, corpus_bucket_stats=stats, verify="kmv"
        ).persist()
        v_dup = decv.filter(~F.col("is_new")).count()
        v_new = decv.filter(F.col("is_new")).count()
        t_verify = time.time() - t0
        v_exact = decv.filter(
            (~F.col("is_new")) & (F.col("kmv_jaccard") == 1.0)
        ).count()
        vplan = decv._jdf.queryExecution().executedPlan().toString()

        print(json.dumps({
            "n_corpus": n_corpus,
            "n_batch": n_batch,
            "index_build_s": round(t_index, 2),
            "batch_dedup_s": round(t_batch, 2),
            "batch_dedup_verified_s": round(t_verify, 2),
            "dup_found": n_dup,
            "dup_expected": half,
            "new_found": n_new,
            "exact_est_1": exact,
            "verified_dup_found": v_dup,
            "verified_exact_kmv_1": v_exact,
            "sort_merge_joins": plan.count("SortMergeJoin"),
            "verified_sort_merge_joins": vplan.count("SortMergeJoin"),
        }), flush=True)
        assert n_dup == half and n_new == half, (n_dup, n_new)
        assert v_dup == half and v_new == half, (v_dup, v_new)
        assert v_exact == half, v_exact
        assert "SortMergeJoin" not in plan
        assert "SortMergeJoin" not in vplan
        dec.unpersist(); decv.unpersist(); batch.unpersist(); stats.unpersist()
        import shutil as _sh
        _sh.rmtree(kmv_dir, ignore_errors=True)
        import shutil
        shutil.rmtree(idx_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
