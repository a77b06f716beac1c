"""Sequence packing: offsets partition the shard's token stream exactly."""

from __future__ import annotations

import pyspark.sql.functions as F

from rhq_metrics_spark.pipelines.packing import pack_chunks


def _docs(spark, n=60):
    # text with id-dependent token count: i % 7 + 1 words
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.array_repeat(F.lit("tok"), (F.col("id") % 7 + 1).cast("int"))
        ).alias("text"),
    )


def test_offsets_are_contiguous_per_shard(spark):
    out = pack_chunks(_docs(spark), budget=10, n_shards=3).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 3
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["offset"])
        expect = 0
        for r in rows:
            assert r["offset"] == expect  # stream has no gaps or overlaps
            expect += r["n_tokens"]


def test_seq_spans_match_budget(spark):
    budget = 10
    for r in pack_chunks(_docs(spark), budget=budget, n_shards=2).collect():
        assert r["first_seq"] == r["offset"] // budget
        last_tok = r["offset"] + max(r["n_tokens"] - 1, 0)
        assert r["last_seq"] == last_tok // budget
        assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1


def test_packing_is_deterministic(spark):
    a = {r["doc_id"]: (r["shard"], r["offset"]) for r in pack_chunks(_docs(spark)).collect()}
    b = {r["doc_id"]: (r["shard"], r["offset"]) for r in pack_chunks(_docs(spark)).collect()}
    assert a == b
