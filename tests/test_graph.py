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


def test_pagerank_weighted_uniform_equals_unweighted(spark):
    """With uniform weights the rational rank*c/(deg*c) equals rank/deg
    term-for-term — bit-identical output."""
    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.graph import pagerank, pagerank_weighted

    ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (4, 5), (6, 7)],
        "id_a long, id_b long",
    )
    un = {r["doc_id"]: r["rank_ppb"] for r in pagerank(ids, pairs, iters=6).collect()}
    wp = pairs.withColumn("w", F.lit(777))
    wt = {
        r["doc_id"]: r["rank_ppb"]
        for r in pagerank_weighted(ids, wp, iters=6).collect()
    }
    assert un == wt


def test_pagerank_weighted_prefers_heavy_edge_and_matches_python(spark):
    """Rank flows along the heavy edge; pinned against a pure-Python
    twin using the same split-contribution integer arithmetic."""
    from rhq_metrics_spark.pipelines.graph import RANK_SCALE, pagerank_weighted

    ids = spark.createDataFrame([(i,) for i in range(3)], "doc_id long")
    # star: 0-1 heavy, 0-2 light
    pairs = spark.createDataFrame(
        [(0, 1, 900_000), (0, 2, 100_000)], "id_a long, id_b long, w long"
    )
    iters, d = 5, 85
    got = {
        r["doc_id"]: r["rank_ppb"]
        for r in pagerank_weighted(ids, pairs, iters=iters).collect()
    }
    # pure-Python twin
    edges = {}
    for a, b, w in [(0, 1, 900_000), (0, 2, 100_000)]:
        edges[(a, b)] = max(edges.get((a, b), 0), w)
        edges[(b, a)] = max(edges.get((b, a), 0), w)
    wout = {}
    for (s, _), w in edges.items():
        wout[s] = wout.get(s, 0) + w
    n = 3
    teleport = (100 - d) * RANK_SCALE // (100 * n)
    rank = {i: RANK_SCALE for i in range(3)}
    for _ in range(iters):
        inc = {i: 0 for i in range(3)}
        for (s, t), w in edges.items():
            hi, lo = rank[s] // wout[s], rank[s] % wout[s]
            inc[t] += hi * w + (lo * w) // wout[s]
        rank = {i: teleport + d * inc[i] // 100 for i in range(3)}
    assert got == rank
    assert got[1] > got[2]  # the heavy neighbor outranks the light one


def test_pagerank_weighted_validation(spark):
    import pytest

    from rhq_metrics_spark.pipelines.graph import pagerank_weighted

    ids = spark.createDataFrame([(0,), (1,)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1, 0)], "id_a long, id_b long, w long")
    with pytest.raises(Exception, match="must be > 0"):
        pagerank_weighted(ids, pairs, iters=1).collect()
    with pytest.raises(ValueError, match="iters"):
        pagerank_weighted(ids, pairs, iters=0)


def test_label_propagation_splits_bridged_triangles(spark):
    """Barbell graph: two triangles {1,2,3} and {10,11,12} joined by
    ONE bridge edge 3-10.  Connected components lump all six into one
    cluster; LPA keeps the two dense communities apart (each triangle
    converges to its minimum label) — the near-dup-families-bridged-
    by-one-accidental-pair case the operator exists for."""
    from rhq_metrics_spark.pipelines.dedup import dup_clusters
    from rhq_metrics_spark.pipelines.graph import label_propagation

    ids = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 12)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
        "id_a long, id_b long",
    )
    out = {
        r["doc_id"]: r["community"]
        for r in label_propagation(ids, pairs, iters=10).collect()
    }
    # exact labels from an independent per-node Python replay: the
    # bridge's min-tie-break pulls label 3 INTO the second triangle,
    # but the two communities stay distinct
    assert out == {1: 1, 2: 1, 3: 1, 10: 3, 11: 3, 12: 3}
    # CC on the same graph merges everything — the contrast LPA adds
    cc = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(ids, pairs).collect()}
    assert len(set(cc.values())) == 1

    # denser communities resist the bridge pull entirely: two
    # 4-cliques bridged by one edge keep their own minimum labels
    ids4 = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 10, 11, 12, 13)], "doc_id long"
    )
    c1 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    c2 = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    pairs4 = spark.createDataFrame(
        c1 + c2 + [(4, 10)], "id_a long, id_b long"
    )
    out4 = {
        r["doc_id"]: r["community"]
        for r in label_propagation(ids4, pairs4, iters=10).collect()
    }
    assert all(out4[i] == 1 for i in (1, 2, 3, 4))
    assert all(out4[i] == 10 for i in (10, 11, 12, 13))


def test_community_clusters_keeps_bridged_families_apart(spark):
    """VERDICT r14 item 5 (curation v3's cluster stage): under the
    dup_clusters interface, community_clusters keeps TWO canonicals
    for two dense near-dup families bridged by one accidental pair,
    where CC's single merged cluster keeps only one — and a singleton
    stays its own canonical."""
    from rhq_metrics_spark.pipelines.dedup import dup_clusters
    from rhq_metrics_spark.pipelines.graph import community_clusters

    ids = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 10, 11, 12, 13, 99)], "doc_id long"
    )
    c1 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    c2 = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    pairs = spark.createDataFrame(c1 + c2 + [(4, 10)], "id_a long, id_b long")

    v2 = dup_clusters(ids, pairs)
    v2_canon = {r["doc_id"] for r in v2.filter("is_canonical").collect()}
    assert v2_canon == {1, 99}  # CC merged both families: ONE canonical

    v3 = community_clusters(ids, pairs, iters=10)
    rows = {r["doc_id"]: r for r in v3.collect()}
    assert {d: r["cluster_id"] for d, r in rows.items()} == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10, 99: 99,
    }
    v3_canon = {d for d, r in rows.items() if r["is_canonical"]}
    assert v3_canon == {1, 10, 99}  # both families survive + singleton
    assert all(
        r["is_canonical"] == (d == r["cluster_id"]) for d, r in rows.items()
    )


def test_label_propagation_isolated_ties_and_validation(spark):
    import pytest

    from rhq_metrics_spark.pipelines.graph import label_propagation

    # isolated node keeps its own id; a 2-node edge ties at count 1
    # per label and the SMALLER label wins on both endpoints
    ids = spark.createDataFrame([(5,), (7,), (9,)], "doc_id long")
    pairs = spark.createDataFrame([(7, 9)], "id_a long, id_b long")
    out = {
        r["doc_id"]: r["community"]
        for r in label_propagation(ids, pairs, iters=4).collect()
    }
    assert out[5] == 5
    # round 1: 7 takes 9's label, 9 takes 7's (synchronous swap);
    # round 2: each takes the other's CURRENT label back — with even
    # iters both end on their own start labels... unless the argmax
    # tie-break settles it: each node has ONE neighbor, so the vote is
    # that neighbor's current label each round (no tie to break).
    # Deterministic either way — pin the fixed-point the recurrence
    # actually reaches at iters=4 (the oscillation case the fixed
    # iteration count makes reproducible).
    assert out[7] == 7 and out[9] == 9
    odd = {
        r["doc_id"]: r["community"]
        for r in label_propagation(ids, pairs, iters=3).collect()
    }
    assert odd[7] == 9 and odd[9] == 7  # the opposite phase, exactly
    with pytest.raises(ValueError, match="iters"):
        label_propagation(ids, pairs, iters=0)
    empty = spark.createDataFrame([], "doc_id long")
    assert label_propagation(empty, pairs).count() == 0
