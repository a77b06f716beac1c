"""Streaming KMV: standing sketch == batch kmv_sketch_rows over all
points seen (bit-identical), replay idempotency, bounded state, and
live set algebra over the standing sketch."""

from __future__ import annotations

from rhq_metrics_spark.pipelines.sketches import (
    kmv_set_ops,
    kmv_sketch_rows,
)
from rhq_metrics_spark.streaming.kmv import (
    kmv_merge,
    process_kmv_batch,
    read_kmv_sketch,
)

K = 16


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "grp string, val string")


def test_kmv_merge_is_union_sketch(spark):
    """bottom-k(bottom-k(A) u bottom-k(B)) == bottom-k(A u B) — the KMV
    mergeability identity, checked against the one-shot sketch."""
    a = _rows(spark, [("g", f"a{i}") for i in range(40)])
    b = _rows(spark, [("g", f"b{i}") for i in range(40)]
              + [("g", f"a{i}") for i in range(10)])  # overlap
    ska = kmv_sketch_rows(a, "grp", "val", k=K, n_salts=4)
    skb = kmv_sketch_rows(b, "grp", "val", k=K, n_salts=4)
    merged = sorted(
        map(tuple, kmv_merge(ska, skb, k=K).collect())
    )
    whole = sorted(
        map(tuple,
            kmv_sketch_rows(a.unionByName(b), "grp", "val", k=K,
                            n_salts=4).collect())
    )
    assert merged == whole


def test_streaming_kmv_state_matches_batch_sketch(spark, tmp_path):
    """After three folded micro-batches the standing sketch equals the
    one-shot batch sketch over all points — bit-identical rows — and
    stays <= k per group."""
    state_dir = str(tmp_path / "kmv_state")
    batches = [
        [("en", f"tok{i}") for i in range(50)],
        [("en", f"tok{i}") for i in range(30, 90)]
        + [("de", f"wort{i}") for i in range(40)],
        [("de", f"wort{i}") for i in range(20, 70)]
        + [("en", f"late{i}") for i in range(10)],
    ]
    for i, rows in enumerate(batches):
        process_kmv_batch(
            spark, _rows(spark, rows), i, "grp", "val", K, state_dir,
            n_salts=4,
        )
    state = sorted(map(tuple, read_kmv_sketch(spark, state_dir).collect()))
    every = [r for rows in batches for r in rows]
    whole = sorted(
        map(tuple,
            kmv_sketch_rows(_rows(spark, every), "grp", "val", k=K,
                            n_salts=4).collect())
    )
    assert state == whole
    per_grp: dict = {}
    for g, _, _ in state:
        per_grp[g] = per_grp.get(g, 0) + 1
    assert all(n <= K for n in per_grp.values())

    # at-least-once replay of the last batch converges, not corrupts
    process_kmv_batch(
        spark, _rows(spark, batches[-1]), len(batches) - 1, "grp", "val",
        K, state_dir, n_salts=4,
    )
    replayed = sorted(map(tuple, read_kmv_sketch(spark, state_dir).collect()))
    assert replayed == state


def test_live_set_ops_over_standing_sketch(spark, tmp_path):
    """kmv_set_ops runs unchanged on the live state: with the whole
    union inside the sketches the overlap readout is EXACT."""
    state_dir = str(tmp_path / "kmv_state2")
    b0 = [("x", f"v{i}") for i in range(10)]
    b1 = [("y", f"v{i}") for i in range(6, 18)]
    process_kmv_batch(spark, _rows(spark, b0), 0, "grp", "val", 64,
                      state_dir, n_salts=4)
    process_kmv_batch(spark, _rows(spark, b1), 1, "grp", "val", 64,
                      state_dir, n_salts=4)
    r = kmv_set_ops(read_kmv_sketch(spark, state_dir), k=64).collect()[0]
    assert (r["grp_a"], r["grp_b"]) == ("x", "y")
    assert r["union_est"] == 18.0 and r["inter_est"] == 4.0
