"""Tests for pipelines/hybrid.py rrf_fuse (Reciprocal Rank Fusion)."""

import pytest

from rhq_metrics_spark.pipelines.hybrid import rrf_fuse


def _ranks(spark, rows, extra=""):
    return spark.createDataFrame(rows, f"doc_id long, rank int{extra}")


def test_rrf_scores_and_order(spark):
    lex = _ranks(spark, [(1, 1), (2, 2), (3, 3)])
    vec = _ranks(spark, [(3, 1), (1, 2), (4, 3)])
    out = {r["doc_id"]: r for r in rrf_fuse({"lex": lex, "vec": vec}).collect()}
    # doc 1: 1/61 + 1/62; doc 3: 1/63 + 1/61; doc 2: 1/62; doc 4: 1/63
    assert out[1]["rrf_score"] == pytest.approx(1 / 61 + 1 / 62)
    assert out[3]["rrf_score"] == pytest.approx(1 / 63 + 1 / 61)
    assert out[2]["rrf_score"] == pytest.approx(1 / 62)
    assert out[4]["rrf_score"] == pytest.approx(1 / 63)
    order = sorted(out.values(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in order] == [1, 3, 2, 4]
    # docs missing from a mode carry a null rank for it
    assert out[2]["vec_rank"] is None and out[4]["lex_rank"] is None


def test_rrf_single_mode_and_top_k(spark):
    lex = _ranks(spark, [(i, i) for i in range(1, 11)])
    out = rrf_fuse({"lex": lex}, top_k=3).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]


def test_rrf_ties_break_on_id(spark):
    a = _ranks(spark, [(9, 1), (2, 2)])
    b = _ranks(spark, [(2, 1), (9, 2)])
    out = sorted(
        rrf_fuse({"a": a, "b": b}).collect(), key=lambda r: r["rank"]
    )
    # symmetric scores -> tie -> smaller doc_id first
    assert [r["doc_id"] for r in out] == [2, 9]


def test_rrf_per_query_partitioning(spark):
    lex = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 2, 2), ("q2", 2, 1), ("q2", 3, 2)],
        "query string, doc_id long, rank int",
    )
    vec = spark.createDataFrame(
        [("q1", 2, 1), ("q2", 3, 1)],
        "query string, doc_id long, rank int",
    )
    out = rrf_fuse({"lex": lex, "vec": vec}, query_cols=["query"]).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query"], []).append(r)
    assert {r["rank"] for r in by_q["q1"]} == {1, 2}
    assert {r["rank"] for r in by_q["q2"]} == {1, 2}
    top_q1 = min(by_q["q1"], key=lambda r: r["rank"])
    assert top_q1["doc_id"] == 2  # in both modes for q1


def test_rrf_empty_rankings_rejected(spark):
    with pytest.raises(ValueError):
        rrf_fuse({})
