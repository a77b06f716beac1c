"""Integer PageRank (pipelines/graph.py): == pure-Python twin
bit-for-bit, hub ordering, isolated nodes, centrality-based canonical
selection."""

from __future__ import annotations

import pytest

from rhq_metrics_spark.pipelines.graph import (
    RANK_SCALE,
    canonical_by_centrality,
    pagerank,
)


def _pagerank_reference(node_ids, pair_list, damping_pct=85, iters=10):
    """Pure-Python twin of the exact integer update rule."""
    nodes = sorted(set(node_ids))
    n = len(nodes)
    adj: dict = {v: set() for v in nodes}
    for a, b in pair_list:
        adj[a].add(b)
        adj[b].add(a)
    teleport = (100 - damping_pct) * RANK_SCALE // (100 * n)
    rank = {v: RANK_SCALE for v in nodes}
    for _ in range(iters):
        dangling = sum(rank[v] for v in nodes if not adj[v])
        incoming = {v: 0 for v in nodes}
        for v in nodes:
            if adj[v]:
                c = rank[v] // len(adj[v])
                for u in adj[v]:
                    incoming[u] += c
        rank = {
            v: teleport + damping_pct * (incoming[v] + dangling // n) // 100
            for v in nodes
        }
    return rank


def _frames(spark, node_ids, pair_list):
    ids = spark.createDataFrame([(v,) for v in node_ids], "doc_id long")
    pairs = spark.createDataFrame(pair_list, "id_a long, id_b long")
    return ids, pairs


def test_pagerank_matches_pure_python_twin(spark):
    node_ids = list(range(12))
    pair_list = [
        (0, 1), (0, 2), (0, 3), (0, 4),          # star around 0
        (5, 6), (6, 7), (7, 5),                  # triangle
        (8, 9),                                  # pair
        # 10, 11 isolated
    ]
    ids, pairs = _frames(spark, node_ids, pair_list)
    got = {r["doc_id"]: r["rank_ppb"] for r in pagerank(ids, pairs).collect()}
    want = _pagerank_reference(node_ids, pair_list)
    assert got == want


def test_pagerank_hub_ranks_highest_and_isolated_at_floor(spark):
    node_ids = list(range(8))
    pair_list = [(0, i) for i in range(1, 6)]  # 0 is the hub; 6,7 isolated
    ids, pairs = _frames(spark, node_ids, pair_list)
    got = {r["doc_id"]: r["rank_ppb"] for r in pagerank(ids, pairs).collect()}
    assert got[0] == max(got.values())
    assert all(got[0] > got[i] for i in range(1, 6))
    # leaves of the same star tie exactly (integer arithmetic)
    assert len({got[i] for i in range(1, 6)}) == 1
    assert got[6] == got[7]


def test_pagerank_validation_and_empty(spark):
    ids, pairs = _frames(spark, [1], [])
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank(ids, pairs, damping_pct=0)
    with pytest.raises(ValueError, match="iters"):
        pagerank(ids, pairs, iters=0)
    empty_ids = spark.createDataFrame([], "doc_id long")
    assert pagerank(empty_ids, pairs).count() == 0


def test_canonical_by_centrality_picks_the_hub(spark):
    """dup_clusters' min-id canonical loses to the star hub once
    centrality decides."""
    from rhq_metrics_spark.pipelines.dedup import dup_clusters

    node_ids = list(range(6))
    # 5 is the hub of the near-dup star but has the LARGEST id
    pair_list = [(5, i) for i in range(4)]
    ids, pairs = _frames(spark, node_ids, pair_list)
    clusters = dup_clusters(ids, pairs)
    min_id_canon = {
        r["doc_id"] for r in clusters.collect() if r["is_canonical"]
    }
    assert 0 in min_id_canon and 5 not in min_id_canon
    out = canonical_by_centrality(ids, pairs, clusters)
    canon = {r["doc_id"] for r in out.collect() if r["is_canonical"]}
    assert 5 in canon and 0 not in canon
    assert 4 in canon  # the isolated node stays its own canonical
    # exactly one canonical per cluster
    per_cluster: dict = {}
    for r in out.collect():
        per_cluster.setdefault(r["cluster_id"], 0)
        per_cluster[r["cluster_id"]] += bool(r["is_canonical"])
    assert all(v == 1 for v in per_cluster.values())
