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


# -- logistic-regression training (the iterative loop) -----------------------


def _ref_train(doc_tokens, ys, dim, iters, lr):
    """Pure-Python twin of train_logistic: same md5 buckets, same
    full-batch gradient, same op shapes (float tolerance only for the
    engine's sum order)."""
    import hashlib
    import math

    feats = []
    for toks in doc_tokens:
        c: dict[int, float] = {}
        for t in toks:
            bkt = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim
            c[bkt] = c.get(bkt, 0.0) + 1.0
        feats.append(c)
    n = len(feats)
    w = [0.0] * dim
    b = 0.0
    losses = []
    eps = 1e-12
    for _ in range(iters):
        grad = [0.0] * dim
        gb = 0.0
        loss = 0.0
        for c, y in zip(feats, ys):
            s = b + sum(cnt * w[j] for j, cnt in c.items())
            p = 1.0 / (1.0 + math.exp(-s))
            r = p - y
            for j, cnt in c.items():
                grad[j] += cnt * r
            gb += r
            loss += -(y * math.log(max(p, eps))
                      + (1 - y) * math.log(max(1 - p, eps)))
        for j in range(dim):
            w[j] -= lr * grad[j] / n
        b -= lr * gb / n
        losses.append(loss / n)
    return w, b, losses


def test_train_logistic_matches_python_and_separates(spark):
    """The distributed trainer reproduces the in-memory trainer's loss
    curve and weights (float tolerance), the loss decreases, and the
    learned model separates a planted corpus perfectly."""
    import re

    import pytest

    from rhq_metrics_spark.pipelines.classify import (
        doc_features,
        train_logistic,
    )

    good = ["excellent clear prose here", "wonderful lucid writing sample",
            "excellent wonderful clear text"]
    bad = ["spam spam buy now click", "click here buy spam now",
           "buy click spam garbage now"]
    rows = [(i, t, 1.0) for i, t in enumerate(good)] + [
        (10 + i, t, 0.0) for i, t in enumerate(bad)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    DIM, ITERS, LR = 64, 15, 0.5
    out = train_logistic(df, dim=DIM, iters=ITERS, lr=LR)
    assert len(out["losses"]) == ITERS
    assert all(b <= a + 1e-12 for a, b in zip(out["losses"], out["losses"][1:]))

    tok = re.compile(r"[^a-z0-9]+")
    doc_toks = [[t for t in tok.split(x.lower()) if t] for x in good + bad]
    ww, bb, ref_losses = _ref_train(
        doc_toks, [1.0] * 3 + [0.0] * 3, DIM, ITERS, LR
    )
    assert out["losses"] == pytest.approx(ref_losses, rel=1e-9)
    assert out["bias"] == pytest.approx(bb, rel=1e-9)
    got_w = {r["bucket"]: r["weight"] for r in out["weights"].collect()}
    for j in range(DIM):
        assert got_w[j] == pytest.approx(ww[j], rel=1e-9, abs=1e-12), j

    # the learned model separates the training corpus: sigma(w.x+b)
    feats = doc_features(df, DIM)
    import pyspark.sql.functions as F

    scored = (
        feats.join(F.broadcast(out["weights"]), "bucket")
        .groupBy("doc_id")
        .agg((F.sum(F.col("cnt") * F.col("weight")) + F.lit(out["bias"]))
             .alias("s"))
    )
    preds = {r["doc_id"]: r["s"] > 0 for r in scored.collect()}
    assert all(preds[i] for i in range(3))
    assert not any(preds[10 + i] for i in range(3))

    with pytest.raises(ValueError, match="iters"):
        train_logistic(df, iters=0)
