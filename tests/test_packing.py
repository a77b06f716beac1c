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


def test_chunk_documents_windows(spark):
    from rhq_metrics_spark.pipelines.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    docs = spark.createDataFrame(
        [(1, text), (2, "short doc"), (3, "   ")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, stride=3)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: starts 0,3,6 -> full; last chunk is the tail (9)
    assert [rows[(1, i)]["chunk_text"] for i in range(3)] == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9",
    ]
    # n=10, chunk=4, stride=3 -> 1+ceil(6/3)=3 chunks
    assert max(i for d, i in rows if d == 1) == 2
    assert all(rows[(1, i)]["n_tokens"] == 4 for i in range(3))
    # short doc: one (short) chunk
    assert rows[(2, 0)]["chunk_text"] == "short doc"
    assert rows[(2, 0)]["n_tokens"] == 2
    # whitespace-only doc emits nothing
    assert not any(d == 3 for d, _ in rows)


def test_chunk_documents_tail_partial(spark):
    from rhq_metrics_spark.pipelines.packing import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(11)))], "doc_id long, text string"
    )
    out = {r["chunk_id"]: r for r in
           chunk_documents(docs, chunk_tokens=4, stride=3).collect()}
    # n=11 -> 1+ceil(7/3)=4 chunks; last starts at 9, has 2 tokens
    assert len(out) == 4
    assert out[3]["chunk_text"] == "t9 t10"
    assert out[3]["n_tokens"] == 2
    # every token is covered by at least one chunk
    covered = set()
    for r in out.values():
        covered.update(r["chunk_text"].split(" "))
    assert covered == {f"t{i}" for i in range(11)}


def test_chunk_documents_no_shuffle(spark):
    from rhq_metrics_spark.pipelines.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_bins_ffd_matches_python_and_is_partitioning_independent(spark):
    """Whole-doc FFD packing == the Python kernel per shard; documents
    never split; oversize docs get their own flagged bin; the result is
    identical under a different input partitioning."""
    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.packing import (
        ffd_pack_bins,
        pack_bins,
        packing_efficiency,
    )

    rows = [(i, "tok " * ((i * 37) % 900 + 10)) for i in range(300)]
    rows.append((1000, "big " * 3000))  # oversize
    df = spark.createDataFrame(rows, "doc_id long, text string")
    CAP = 1024
    out = {r["doc_id"]: r for r in
           pack_bins(df, CAP, n_shards=8).collect()}
    assert len(out) == 301
    assert out[1000]["oversize"]
    # per-bin fill never exceeds capacity (except dedicated oversize bins)
    import collections

    fill = collections.Counter()
    for r in out.values():
        if not r["oversize"]:
            fill[r["bin_id"]] += r["n_tokens"]
    assert all(v <= CAP for v in fill.values())
    # python-twin equality per shard
    by_shard = collections.defaultdict(list)
    for r in out.values():
        by_shard[r["shard"]].append(r)
    for shard, rs in by_shard.items():
        rs_sorted = sorted(rs, key=lambda r: r["doc_id"])
        pairs = [(r["n_tokens"], r["doc_id"]) for r in rs_sorted]
        want = ffd_pack_bins(pairs, CAP)
        assert [r["bin_idx"] for r in rs_sorted] == want, shard
    # partitioning independence: same answer from a repartitioned input
    out2 = {r["doc_id"]: (r["shard"], r["bin_idx"]) for r in
            pack_bins(df.repartition(13), CAP, n_shards=8).collect()}
    assert out2 == {k: (r["shard"], r["bin_idx"]) for k, r in out.items()}
    # efficiency summary: FFD over many medium docs beats 60% fill
    eff = packing_efficiency(
        pack_bins(df, CAP, n_shards=2), CAP
    ).collect()[0]
    assert eff["n_docs"] == 300 and eff["efficiency"] > 0.6
    import pytest as _pytest

    with _pytest.raises(ValueError, match="capacity"):
        pack_bins(df, 0)


def test_pack_bins_string_and_uuid_ids(spark):
    """ADVICE r10: ids are opaque — string/UUID doc ids (accepted by
    every sibling pipeline operator) pack fine, keep their input type
    in the output, and match the Python kernel with string tie-break."""
    import collections

    from rhq_metrics_spark.pipelines.packing import ffd_pack_bins, pack_bins

    rows = [
        (f"doc-{i:04d}-aaaa-bbbb", "tok " * ((i * 41) % 500 + 5))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    CAP = 512
    out = {r["doc_id"]: r for r in pack_bins(df, CAP, n_shards=4).collect()}
    assert len(out) == 120
    assert all(isinstance(k, str) for k in out)
    fill = collections.Counter()
    for r in out.values():
        assert not r["oversize"]
        fill[r["bin_id"]] += r["n_tokens"]
    assert all(v <= CAP for v in fill.values())
    by_shard = collections.defaultdict(list)
    for r in out.values():
        by_shard[r["shard"]].append(r)
    for shard, rs in by_shard.items():
        rs_sorted = sorted(rs, key=lambda r: r["doc_id"])
        pairs = [(r["n_tokens"], r["doc_id"]) for r in rs_sorted]
        assert [r["bin_idx"] for r in rs_sorted] == ffd_pack_bins(pairs, CAP)


def test_ffd_segment_tree_matches_naive_first_fit():
    """The O(n log n) segment-tree kernel must place every doc in the
    SAME bin the naive first-fit scan would — including the edges:
    zero-token docs (match the first OPENED bin, even a full one),
    oversize docs (dedicated bin that never accepts others), exact
    fills, and ties broken by id."""
    import random

    from rhq_metrics_spark.pipelines.packing import ffd_pack_bins

    def naive(tokens_and_ids, capacity):
        order = sorted(
            range(len(tokens_and_ids)),
            key=lambda i: (-tokens_and_ids[i][0], tokens_and_ids[i][1]),
        )
        fills, out = [], [0] * len(tokens_and_ids)
        for i in order:
            n = tokens_and_ids[i][0]
            placed = None
            if n <= capacity:
                for b, f in enumerate(fills):
                    if f + n <= capacity:
                        placed = b
                        break
            if placed is None:
                placed = len(fills)
                fills.append(0)
            fills[placed] += n
            out[i] = placed
        return out

    rng = random.Random(17)
    for trial in range(40):
        cap = rng.choice([1, 7, 64, 1024])
        n = rng.randrange(0, 300)
        # skew toward edge masses: zeros, exact-capacity, oversize
        pairs = [
            (
                rng.choice(
                    [0, 1, cap, cap + rng.randrange(1, 50),
                     rng.randrange(0, cap + 1)]
                ),
                rng.randrange(0, 50),  # duplicate ids force tie-breaks
            )
            for _ in range(n)
        ]
        assert ffd_pack_bins(pairs, cap) == naive(pairs, cap), (trial, cap)
    # string ids keep working (opaque, tie-break only)
    pairs = [(3, "b"), (3, "a"), (2, "z"), (9, "m")]
    assert ffd_pack_bins(pairs, 5) == naive(pairs, 5)


def test_ffd_kernel_is_subquadratic():
    """20k docs in one shard must pack in well under a second — the
    naive O(n x bins) scan takes ~20 s here; the segment tree makes
    docs-per-shard a free dial at the 10M-doc scale smoke."""
    import random
    import time

    from rhq_metrics_spark.pipelines.packing import ffd_pack_bins

    rng = random.Random(5)
    pairs = [(rng.randrange(50, 1950), i) for i in range(20_000)]
    t0 = time.time()
    bins = ffd_pack_bins(pairs, 2048)
    dt = time.time() - t0
    assert dt < 2.0, dt
    fills = {}
    for (n, _), b in zip(pairs, bins):
        fills[b] = fills.get(b, 0) + n
    assert all(f <= 2048 for f in fills.values())
    # FFD quality: packing efficiency stays near 1 on mixed lengths
    eff = sum(n for n, _ in pairs) / (len(fills) * 2048)
    assert eff > 0.97, eff
