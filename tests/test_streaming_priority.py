"""Streaming priority sampling: standing state == batch
priority_sample over all rows seen (including the max(w, tau)
estimates), merge identity, replay idempotency, bounded state,
per-group operation."""

from __future__ import annotations

import pyspark.sql.functions as F

from rhq_metrics_spark.pipelines.sampling import priority_q, priority_sample
from rhq_metrics_spark.streaming.priority import (
    priority_merge,
    process_priority_batch,
    read_priority_sample,
)

K = 8


def _rows(spark, triples):
    return spark.createDataFrame(triples, "grp string, doc_id long, n_chars long")


def _cand(spark, triples):
    df = _rows(spark, triples)
    return df.select(
        "grp",
        F.col("doc_id").cast("string").alias("id"),
        F.col("n_chars").cast("double").alias("w"),
        priority_q(F.col("n_chars"), F.col("doc_id")).alias("q"),
    )


def test_priority_merge_is_union_topk(spark):
    """top-(k+1)(top-(k+1)(A) u top-(k+1)(B)) == top-(k+1)(A u B) —
    the mergeability identity priority samples share with KMV."""
    a = [("g", i, (i * 13) % 500 + 1) for i in range(60)]
    b = [("g", i, (i * 13) % 500 + 1) for i in range(40, 110)]  # overlap
    import pyspark.sql.functions as F2
    from pyspark.sql import Window

    def topk1(df):
        w = Window.partitionBy("grp").orderBy(F2.col("q").desc(), F2.col("id").asc())
        return (
            df.withColumn("_r", F2.row_number().over(w))
            .filter(F2.col("_r") <= K + 1)
            .select("grp", "id", "w", "q")
        )

    merged = sorted(
        map(tuple, priority_merge(topk1(_cand(spark, a)), topk1(_cand(spark, b)), K).collect())
    )
    whole = sorted(
        map(tuple, topk1(_cand(spark, a).unionByName(_cand(spark, b)).dropDuplicates(["grp", "id"])).collect())
    )
    assert merged == whole


def test_streaming_priority_state_matches_batch_operator(spark, tmp_path):
    """After three folded micro-batches the served sample equals the
    batch priority_sample over all rows — same ids, same weights, same
    rounded priorities AND the same max(w, tau) estimates."""
    state_dir = str(tmp_path / "prio_state")
    batches = [
        [("g", i, (i * 37) % 900 + 1) for i in range(50)],
        [("g", i, (i * 37) % 900 + 1) for i in range(50, 120)],
        [("g", i, (i * 37) % 900 + 1) for i in range(120, 160)],
    ]
    for i, rows in enumerate(batches):
        process_priority_batch(
            spark, _rows(spark, rows), i, "grp", "n_chars", "doc_id",
            K, state_dir,
        )
    served = [
        (int(r["id"]), r["weight"], r["priority_r"], r["est_weight_r"])
        for r in read_priority_sample(spark, state_dir, K).collect()
    ]
    every = [r for rows in batches for r in rows]
    batch_df = spark.createDataFrame(
        [(d, n) for _, d, n in every], "doc_id long, n_chars long"
    )
    want = [
        (r["doc_id"], r["weight"], r["priority_r"], r["est_weight_r"])
        for r in priority_sample(batch_df, k=K).collect()
    ]
    assert served == want

    # bounded state: <= k+1 rows per group on disk
    from rhq_metrics_spark.streaming.heavy_hitters import _state_sources

    src = _state_sources(spark, state_dir, 1 << 62)
    assert spark.read.parquet(src[1]).count() <= K + 1

    # at-least-once replay of the last batch converges, not corrupts
    process_priority_batch(
        spark, _rows(spark, batches[-1]), len(batches) - 1, "grp",
        "n_chars", "doc_id", K, state_dir,
    )
    replayed = [
        (int(r["id"]), r["weight"], r["priority_r"], r["est_weight_r"])
        for r in read_priority_sample(spark, state_dir, K).collect()
    ]
    assert replayed == served


def test_streaming_priority_per_group_and_small_groups(spark, tmp_path):
    """Groups sample independently; a group with <= k rows serves all
    of them with exact-weight estimates (tau = 0)."""
    state_dir = str(tmp_path / "prio_grp")
    rows = [("big", i, i % 300 + 1) for i in range(40)] + [
        ("tiny", 1000 + j, 50 + j) for j in range(3)
    ]
    process_priority_batch(
        spark, _rows(spark, rows), 0, "grp", "n_chars", "doc_id", K, state_dir
    )
    out = read_priority_sample(spark, state_dir, K).collect()
    by_grp: dict = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    assert len(by_grp["big"]) == K
    assert len(by_grp["tiny"]) == 3
    assert all(r["est_weight_r"] == float(r["weight"]) for r in by_grp["tiny"])
