from __future__ import annotations

import hashlib
import re

from rhq_metrics_spark.pipelines.classify import hashed_weights, linear_score


def _py_weight(bucket: int, seed: str = "clf-v1") -> int:
    h = hashlib.md5(f"{seed}:{bucket}".encode()).hexdigest()
    return int(h[:8], 16) % 100 - 50


def _py_score(text: str, dim: int) -> tuple[int, int]:
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    score = 0
    for t in toks:
        b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim
        score += _py_weight(b)
    return len(toks), score


def test_matches_pure_python_model(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "Spark, SQL; and ARROW!"),
         (3, ""), (4, "repeat repeat repeat")],
        "doc_id long, text string",
    )
    dim = 64
    out = {
        r["doc_id"]: r
        for r in linear_score(docs, hashed_weights(spark, dim=dim), dim=dim).collect()
    }
    for doc_id, text in [(1, "the quick brown fox"),
                         (2, "Spark, SQL; and ARROW!"),
                         (4, "repeat repeat repeat")]:
        n, score = _py_score(text, dim)
        assert out[doc_id]["n_tokens"] == n, doc_id
        assert out[doc_id]["score"] == score, doc_id
        assert out[doc_id]["label"] == (score > 0)
    assert 3 not in out  # empty doc has no tokens, drops out


def test_weights_broadcast_in_plan(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        linear_score(docs, hashed_weights(spark, dim=32), dim=32)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
