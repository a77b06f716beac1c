"""Streaming Misra-Gries heavy hitters: merge vs a Python oracle, the
count-bracket guarantee, bounded state, and replay idempotency."""

from __future__ import annotations

import json
import time
from collections import Counter

import pyspark.sql.functions as F

from rhq_metrics_spark.streaming.heavy_hitters import (
    mg_merge,
    process_heavy_hitters_batch,
    read_heavy_hitters,
)


def _py_mg_merge(a: dict, b: dict, capacity: int) -> tuple[dict, int]:
    merged = Counter(a)
    merged.update(b)
    if len(merged) <= capacity:
        return dict(merged), 0
    threshold = sorted(merged.values(), reverse=True)[capacity]
    out = {v: c - threshold for v, c in merged.items() if c > threshold}
    return out, threshold


def _state_df(spark, d: dict, eps: int):
    rows = [(v, c, eps) for v, c in d.items()]
    return spark.createDataFrame(rows, "value string, cnt long, eps long")


def test_mg_merge_matches_python_oracle(spark):
    a = {"x": 10, "y": 4, "z": 2}
    b = {"y": 6, "w": 5, "q": 1, "r": 1}
    for cap in (2, 3, 8):
        got = {
            r["value"]: (r["cnt"], r["eps"])
            for r in mg_merge(
                _state_df(spark, a, 1), _state_df(spark, b, 0), cap
            ).collect()
        }
        exp, thr = _py_mg_merge(a, b, cap)
        assert {v: c for v, (c, _) in got.items()} == exp
        if got:
            eps = next(iter(got.values()))[1]
            assert eps == 1 + 0 + thr
        assert len(got) <= cap


def test_streaming_state_brackets_true_counts(spark, tmp_path):
    # 3 micro-batches with one dominant token; state stays <= capacity,
    # dominant token always present, every counter brackets truth
    batches = [
        ["hot"] * 30 + [f"a{i}" for i in range(10)],
        ["hot"] * 25 + ["warm"] * 12 + [f"b{i}" for i in range(10)],
        ["hot"] * 20 + ["warm"] * 8 + [f"c{i}" for i in range(10)],
    ]
    cap = 4
    state_dir = str(tmp_path / "mg_state")
    truth: Counter = Counter()
    for i, toks in enumerate(batches):
        bdf = spark.createDataFrame([(t,) for t in toks], "w string")
        process_heavy_hitters_batch(spark, bdf, i, "w", cap, state_dir)
        truth.update(toks)
    state = {
        r["value"]: (r["cnt"], r["eps"])
        for r in read_heavy_hitters(spark, state_dir).collect()
    }
    assert len(state) <= cap
    assert "hot" in state and "warm" in state
    for v, (cnt, eps) in state.items():
        assert cnt <= truth[v] <= cnt + eps, (v, cnt, eps, truth[v])
    # no false negatives above the error budget
    eps = next(iter(state.values()))[1]
    for v, true_n in truth.items():
        if true_n > eps:
            assert v in state, (v, true_n, eps)


def test_replay_is_idempotent(spark, tmp_path):
    state_dir = str(tmp_path / "mg_state")
    b0 = spark.createDataFrame([("x",)] * 5 + [("y",)] * 2, "w string")
    b1 = spark.createDataFrame([("x",)] * 3 + [("z",)] * 4, "w string")
    process_heavy_hitters_batch(spark, b0, 0, "w", 3, state_dir)
    process_heavy_hitters_batch(spark, b1, 1, "w", 3, state_dir)
    once = {(r["value"], r["cnt"], r["eps"])
            for r in read_heavy_hitters(spark, state_dir).collect()}
    # at-least-once replay of batch 1 must converge to the same state
    process_heavy_hitters_batch(spark, b1, 1, "w", 3, state_dir)
    again = {(r["value"], r["cnt"], r["eps"])
             for r in read_heavy_hitters(spark, state_dir).collect()}
    assert once == again


def test_streaming_end_to_end(spark, tmp_path):
    from rhq_metrics_spark.streaming.heavy_hitters import (
        start_heavy_hitters_stream,
    )

    src = tmp_path / "hh_in"
    src.mkdir()
    rows = [{"w": "big"}] * 20 + [{"w": f"t{i}"} for i in range(15)]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema("w string").json(str(src))
    q = start_heavy_hitters_stream(
        stream, "w", capacity=5,
        state_dir=str(tmp_path / "hh_state"),
        checkpoint_dir=str(tmp_path / "hh_ckpt"),
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            state = read_heavy_hitters(spark, str(tmp_path / "hh_state"))
            if state.count():
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = {r["value"]: r["cnt"] for r in state.collect()}
    assert "big" in got and len(got) <= 5
