"""Graph centrality over document-pair graphs: deterministic integer
PageRank (Brin & Page 1998) and centrality-based canonical selection.

Why here: the dedup family emits PAIR graphs (``fuzzy_blocked_pairs``,
``minhash_lsh_pairs``, …) and ``dup_clusters`` picks each cluster's
canonical doc by MIN ID — fine for reproducibility, blind to quality.
``pagerank`` ranks members by how connected they are (the hub of a
near-dup star is the best exemplar of its cluster; a crawl's link
graph ranks the same way), and :func:`canonical_by_centrality` swaps
the min-id rule for highest-rank-wins.

Determinism: ranks are exact int64 parts-per-billion.  Every update is
integer floor arithmetic —

    contrib(v)   = rank(v) div degree(v)
    rank'(v)     = (15 · S) div (100 · N)
                 + 85 · (Σ contribs into v + dangling div N) div 100

so partial-aggregation ORDER cannot change a result (integer sums
commute exactly; doubles don't), and two runs — or two engines — agree
bit-for-bit.  The mass lost to flooring (< 1 ppb per edge) dissipates
like dangling mass; total rank is ≤ S·N and monotone comparisons are
unaffected.  Iterative, so pytest-pinned against a pure-Python twin
rather than SQL-oracled (same convention as bpe_apply / LTTB / dup
cluster contraction).

Scale shape: per superstep ONE join of the rank table onto the edge
list (shuffle on the edge key) + ONE hash-agg on the destination +
a 1-row dangling-mass agg; ``localCheckpoint`` per superstep truncates
lineage exactly like ``dup_clusters`` (plan depth stays O(1) in
iterations).  State is one int64 per node.  Degrees are computed once.

Reference analogue: the reference has no graph operator; this extends
the dedup-cluster machinery (``dedup.py dup_clusters``) the way its
own rollups extend raw scans.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from rhq_metrics_spark.localrel import local_df

#: rank scale: parts-per-billion — big enough that div-floor loss is
#: invisible, small enough that S·N fits int64 for any real N.
RANK_SCALE = 1_000_000_000


def pagerank(
    ids: DataFrame,
    pairs: DataFrame,
    damping_pct: int = 85,
    iters: int = 10,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """PageRank over an UNDIRECTED pair graph (edges are symmetrized;
    pass a directed edge list twice-oriented if direction matters).

    ``ids`` is the full node table (isolated nodes rank at the
    teleport floor); ``pairs`` the edge list.  ``damping_pct`` is the
    damping factor as an integer percentage (85 = the classic 0.85) —
    integers keep every engine's arithmetic identical.

    Output: ``(id, rank_ppb)`` — exact int64, deterministic.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"pagerank: damping_pct out of (0, 100): {damping_pct}")
    if iters < 1:
        raise ValueError(f"pagerank: iters must be >= 1, got {iters}")
    spark = ids.sparkSession
    # nodes/edges are reused every superstep but need NO lineage
    # truncation — persist() caches them columnar-compressed and
    # EVICTABLE (recomputable under memory pressure), where
    # localCheckpoint would pin raw row blocks on-heap: at 10M nodes /
    # 30M edges the pinned blocks OOM'd an 8 GiB heap (×100 checkpoint).
    nodes = ids.select(F.col(id_col).alias("_id")).distinct().persist()
    n_row = nodes.agg(F.count(F.lit(1)).alias("n")).first()
    n = int(n_row["n"])
    if n == 0:
        return local_df(spark, [], f"{id_col} long, rank_ppb long").select(
            F.col(id_col), "rank_ppb"
        )
    # symmetrized edge list + out-degrees, computed once
    edges = (
        pairs.select(F.col(a_col).alias("_src"), F.col(b_col).alias("_dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("_src"), F.col(a_col).alias("_dst"))
        )
        .distinct()
        .persist()
    )
    # degrees never change: persist the one 59M-row-class aggregation
    # instead of recomputing it every superstep (found by the ×100
    # checkpoint at 10M nodes / 30M edges)
    deg = edges.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg")).persist()
    teleport = (100 - damping_pct) * RANK_SCALE // (100 * n)
    d = damping_pct
    # the DANGLING SET is fixed across iterations (degrees never
    # change) — detect it once; the common case (symmetrized pair
    # graph restricted to its members) has none, and then the loop
    # runs zero per-iteration driver actions.
    dangling_nodes = (
        nodes.join(deg, nodes["_id"] == deg["_src"], "left_anti")
        .localCheckpoint(eager=True)
    )
    has_dangling = bool(dangling_nodes.limit(1).count())
    ranks = nodes.withColumn("_rank", F.lit(RANK_SCALE).cast("long"))
    # EAGER checkpoint per superstep + unpersist of the PREVIOUS
    # snapshot: local-checkpoint blocks are pinned (never evicted), so
    # a lazy 8-deep chain pins 8 full rank tables at once — the ×100
    # checkpoint OOM'd an 8 GiB heap at 10M nodes exactly this way.
    # Eager + unpersist keeps at most TWO snapshots live.
    prev = None
    for _ in range(iters):
        # dangling mass: nodes with no out-edges spread everywhere
        dangling = (
            int(
                ranks.join(dangling_nodes, "_id", "left_semi")
                .agg(F.coalesce(F.sum("_rank"), F.lit(0)).alias("s"))
                .first()["s"]
            )
            if has_dangling
            else 0
        )
        contribs = (
            ranks.join(deg, ranks["_id"] == deg["_src"])
            .select("_id", F.expr("_rank div _deg").alias("_c"))
            .join(edges, F.col("_id") == edges["_src"])
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contribs, nodes["_id"] == contribs["_dst"], "left")
            .select(
                "_id",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"{d} * (coalesce(_in, 0) + {dangling // n}) div 100"
                    )
                ).cast("long").alias("_rank"),
            )
            .localCheckpoint(eager=True)
        )
        if prev is not None:
            prev.unpersist()
        prev = ranks
    deg.unpersist()
    edges.unpersist()
    nodes.unpersist()
    return ranks.select(F.col("_id").alias(id_col), F.col("_rank").alias("rank_ppb"))


def canonical_by_centrality(
    ids: DataFrame,
    pairs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    **pagerank_kwargs,
) -> DataFrame:
    """Re-pick each dup cluster's canonical doc by PageRank centrality
    (highest rank wins, ties by min id) instead of ``dup_clusters``'s
    min-id rule — the hub of a near-dup star is the best exemplar.

    ``clusters`` is ``dup_clusters`` output (``id_col, cluster_col``).
    Output: the clusters frame with ``rank_ppb`` and a recomputed
    ``is_canonical``.  One extra join + one window over cluster keys on
    top of the rank computation."""
    pr = pagerank(ids, pairs, id_col=id_col, **pagerank_kwargs)
    joined = clusters.join(pr, id_col, "left").withColumn(
        "rank_ppb", F.coalesce(F.col("rank_ppb"), F.lit(0))
    )
    w = Window.partitionBy(cluster_col).orderBy(
        F.col("rank_ppb").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .withColumn("is_canonical", F.col("_rn") == 1)
        .drop("_rn")
    )


def pagerank_weighted(
    ids: DataFrame,
    pairs: DataFrame,
    damping_pct: int = 85,
    iters: int = 10,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    weight_col: str = "w",
) -> DataFrame:
    """Weighted PageRank over an undirected pair graph: each node
    spreads rank to neighbors PROPORTIONALLY to integer edge weights
    (e.g. the fuzzy/near-dup similarity in ppm) instead of uniformly —
    the canonical-exemplar ranking then prefers the member most
    STRONGLY tied to its cluster, not merely the most-connected one.

    Exactness: the per-edge contribution ``floor(rank · w / W_out)`` is
    computed WITHOUT the overflowing product via the split identity

        rank = hi · W_out + lo   (hi = rank div W_out, lo = rank % W_out)
        floor(rank · w / W_out) = hi · w + (lo · w) div W_out

    — every term int64 (``lo < W_out``, so ``lo · w < W_out · max_w``:
    with ppm weights the bound holds while a node's weighted out-degree
    stays under ~9.2e6 edges — far past any blocked pair graph), every
    op a floor division or sum, so partial-agg order cannot change a
    bit and two engines agree exactly.  With UNIFORM weights the
    rational ``rank·c/(deg·c)`` equals ``rank/deg`` term-for-term, so
    output is bit-identical to :func:`pagerank` (pytest-pinned).

    Duplicate (a, b) rows keep the MAX weight (deterministic);
    symmetrized like :func:`pagerank`.  Same superstep shape: one edge
    join + one destination hash-agg + eager localCheckpoint with
    unpersist-previous (≤ 2 live snapshots — the ×100 OOM lesson).

    Output: ``(id, rank_ppb)`` — exact int64.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(
            f"pagerank_weighted: damping_pct out of (0, 100): {damping_pct}"
        )
    if iters < 1:
        raise ValueError(f"pagerank_weighted: iters must be >= 1, got {iters}")
    spark = ids.sparkSession
    nodes = ids.select(F.col(id_col).alias("_id")).distinct().persist()
    n_row = nodes.agg(F.count(F.lit(1)).alias("n")).first()
    n = int(n_row["n"])
    if n == 0:
        return local_df(spark, [], f"{id_col} long, rank_ppb long").select(
            F.col(id_col), "rank_ppb"
        )
    w = F.col(weight_col).cast("long")
    checked = pairs.withColumn(
        "_w",
        F.when(w > 0, w).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"pagerank_weighted: {weight_col} must be > 0: "),
                    w.cast("string"),
                )
            )
        ),
    )
    edges = (
        checked.select(
            F.col(a_col).alias("_src"), F.col(b_col).alias("_dst"), "_w"
        )
        .unionByName(
            checked.select(
                F.col(b_col).alias("_src"), F.col(a_col).alias("_dst"), "_w"
            )
        )
        .groupBy("_src", "_dst")
        .agg(F.max("_w").alias("_w"))
        .persist()
    )
    wout = edges.groupBy("_src").agg(F.sum("_w").alias("_wout")).persist()
    teleport = (100 - damping_pct) * RANK_SCALE // (100 * n)
    d = damping_pct
    dangling_nodes = (
        nodes.join(wout, nodes["_id"] == wout["_src"], "left_anti")
        .localCheckpoint(eager=True)
    )
    has_dangling = bool(dangling_nodes.limit(1).count())
    ranks = nodes.withColumn("_rank", F.lit(RANK_SCALE).cast("long"))
    prev = None
    for _ in range(iters):
        dangling = (
            int(
                ranks.join(dangling_nodes, "_id", "left_semi")
                .agg(F.coalesce(F.sum("_rank"), F.lit(0)).alias("s"))
                .first()["s"]
            )
            if has_dangling
            else 0
        )
        contribs = (
            ranks.join(wout, ranks["_id"] == wout["_src"])
            .select(
                "_id",
                F.expr("_rank div _wout").alias("_hi"),
                F.expr("_rank % _wout").alias("_lo"),
                "_wout",
            )
            .join(edges, F.col("_id") == edges["_src"])
            .select(
                "_dst",
                F.expr("_hi * _w + (_lo * _w) div _wout").alias("_c"),
            )
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contribs, nodes["_id"] == contribs["_dst"], "left")
            .select(
                "_id",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"{d} * (coalesce(_in, 0) + {dangling // n}) div 100"
                    )
                ).cast("long").alias("_rank"),
            )
            .localCheckpoint(eager=True)
        )
        if prev is not None:
            prev.unpersist()
        prev = ranks
    wout.unpersist()
    edges.unpersist()
    nodes.unpersist()
    return ranks.select(F.col("_id").alias(id_col), F.col("_rank").alias("rank_ppb"))


def label_propagation(
    ids: DataFrame,
    pairs: DataFrame,
    iters: int = 10,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara 2007, Phys. Rev. E 76) over an undirected pair
    graph — the community-structure complement of the connected
    components in :func:`~rhq_metrics_spark.pipelines.dedup.
    dup_clusters`: CC lumps everything reachable into one cluster, LPA
    splits a reachable blob into its densely-linked communities (two
    near-dup families bridged by one accidental pair stop merging).

    Every node starts labeled with its own id; each synchronous round
    relabels every node with the most frequent label among its
    NEIGHBORS, ties to the SMALLEST label; a node with no neighbors
    keeps its own id.  Classic synchronous LPA can oscillate on
    bipartite structures — the FIXED ``iters`` round count makes the
    output a pure function of the graph anyway (determinism before
    convergence, the engine-wide contract), and the (count desc, label
    asc) argmax is a total order, so two engines agree bit-for-bit.

    Plan shape at 100 TB: per round one |edges| join + one
    (node, label) hash-agg + one per-node argmax window over the VOTE
    table (≤ |edges| rows); eager localCheckpoint + unpersist-previous
    keeps ≤ 2 label snapshots live (the pagerank superstep
    discipline); nodes/edges persist() once (evictable, recomputable).

    Output: ``(id, community)`` — community = the winning label, an
    int64 node id.
    """
    if iters < 1:
        raise ValueError(f"label_propagation: iters must be >= 1, got {iters}")
    spark = ids.sparkSession
    nodes = ids.select(F.col(id_col).alias("_id")).distinct().persist()
    if nodes.limit(1).count() == 0:
        # release before the early return — an abandoned cache-registry
        # entry is the leak class the r14 persist sweep removed (ADVICE
        # r14); the non-empty path unpersists at the bottom as before
        nodes.unpersist()
        return local_df(
            spark, [], f"{id_col} long, community long"
        ).select(F.col(id_col), "community")
    edges = (
        pairs.select(F.col(a_col).alias("_src"), F.col(b_col).alias("_dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("_src"), F.col(a_col).alias("_dst"))
        )
        .distinct()
        .persist()
    )
    labels = nodes.select("_id", F.col("_id").alias("_lbl")).localCheckpoint(
        eager=True
    )
    prev = labels
    for _ in range(iters):
        votes = (
            edges.join(labels, edges["_src"] == labels["_id"])
            .groupBy(F.col("_dst").alias("_nid"), "_lbl")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        w = Window.partitionBy("_nid").orderBy(
            F.col("_c").desc(), F.col("_lbl").asc()
        )
        best = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("_nid").alias("_id"), F.col("_lbl").alias("_new"))
        )
        labels = (
            nodes.join(best, "_id", "left")
            .select(
                "_id",
                F.coalesce(F.col("_new"), F.col("_id")).alias("_lbl"),
            )
            .localCheckpoint(eager=True)
        )
        prev.unpersist()
        prev = labels
    edges.unpersist()
    nodes.unpersist()
    return labels.select(
        F.col("_id").alias(id_col), F.col("_lbl").alias("community")
    )


def community_clusters(
    ids: DataFrame,
    pairs: DataFrame,
    iters: int = 10,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """:func:`~rhq_metrics_spark.pipelines.dedup.dup_clusters`' exact
    interface — ``(doc_id, cluster_id, is_canonical)`` — with
    :func:`label_propagation` as the cluster stage instead of connected
    components: two densely-linked near-dup families bridged by one
    accidental pair stay TWO clusters (two canonicals survive) where
    CC would merge them into one (the over-merge label_propagation was
    built to fix — curation v3, VERDICT r14 item 5).

    ``cluster_id`` is the community relabeled to its smallest member id
    (LPA's winning label is whichever id won the vote, not a stable
    representative), so ids are deterministic and ``is_canonical =
    (doc_id == cluster_id)`` — the dup_clusters convention.  Singleton
    documents stay their own canonical cluster.

    Plan shape at 100 TB: label_propagation's per-round cost (one
    |edges| join + one vote hash-agg + one argmax window, ≤ 2 pinned
    snapshots) plus ONE community-key min-window over the node table.
    """
    comm = label_propagation(
        ids, pairs, iters=iters, id_col=id_col, a_col=a_col, b_col=b_col
    )
    w = Window.partitionBy("community")
    return (
        comm.withColumn("cluster_id", F.min(id_col).over(w))
        .select(
            id_col,
            "cluster_id",
            (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
        )
    )
