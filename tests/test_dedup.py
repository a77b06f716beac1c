"""Dedup operators — exact, n-gram Jaccard (vs brute-force python
oracle), MinHash LSH (candidate completeness on near-identical docs),
SimHash, embedding near-dup."""

import itertools

import pyspark.sql.functions as F
import pytest

from rhq_metrics_spark.pipelines.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _jaccard_oracle(rows, n=3, threshold=0.5):
    def sh(text):
        toks = " ".join(text.lower().split()).split(" ")
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    sets = {i: sh(t) for i, t in rows}
    out = {}
    for (a, sa), (b, sb) in itertools.combinations(sorted(sets.items()), 2):
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out[(a, b)] = j
    return out


def test_exact_dedup(spark):
    rows = [
        (1, "Hello   World"),
        (2, "hello world"),        # dup after normalization
        (3, "HELLO WORLD"),        # dup
        (4, "something else"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_dedup(df).collect()
    kept = {r["doc_id"]: r["dup_count"] for r in out}
    assert kept == {1: 3, 4: 1}


def test_ngram_jaccard_matches_bruteforce(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy cat today"),
        (3, "a completely different sentence with other words entirely"),
        (4, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.3).collect()
    }
    want = _jaccard_oracle(rows, threshold=0.3)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k])


def test_ngram_jaccard_prefix_filter_is_exact(docs):
    base = docs.limit(60)
    plain = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(base, threshold=0.2, n=2).collect()
    }
    filtered = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            base, threshold=0.2, n=2, prefix_filter=True
        ).collect()
    }
    assert plain == filtered  # prefix filter must not lose pairs


def test_minhash_lsh_finds_near_identical(spark):
    base = "the quick brown fox jumps over the lazy dog and then runs away fast"
    rows = [
        (1, base),
        (2, base.replace("fast", "slow")),
        (3, "totally unrelated words about spark query engines and parquet files"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_lsh_pairs(df, threshold=0.5, num_hashes=12, bands=6)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_minhash_verify_threshold(spark):
    rows = [
        (1, "aa bb cc dd ee ff gg hh"),
        (2, "aa bb cc dd ee ff gg hh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_lsh_pairs(df, threshold=0.99, n=2).collect()
    assert len(out) == 1 and out[0]["jaccard"] == pytest.approx(1.0)


def test_simhash_near_dups(spark):
    base = ("spark dataframes give a declarative api for distributed query "
            "processing over columnar storage with catalyst optimization")
    rows = [
        (1, base),
        (2, base.replace("columnar", "vectorized")),
        (3, "entirely distinct content about cooking pasta with tomato sauce basil"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = simhash_pairs(df, max_hamming=12)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_embedding_near_dup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_near_dup_pairs(df, threshold=0.95).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]
    assert out[0]["cosine"] == pytest.approx(0.9999, abs=1e-3)


def test_embedding_near_dup_lsh_path(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.02, 0.0, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.999, 0.02, 0.0]),   # near-dup of 3
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dup_pairs(df, threshold=0.95, method="exact").collect()}
    lsh = embedding_near_dup_pairs(
        df, threshold=0.95, method="lsh", num_planes=4, tables=16
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in lsh}
    # near-identical vectors collide with overwhelming probability at
    # 16 tables; verified cosines must match exact semantics
    assert got == exact == {(1, 2), (3, 4)}
    for r in lsh:
        assert r["cosine"] >= 0.95


def test_embedding_near_dup_default_has_no_cross_join(spark):
    """The DEFAULT path must be the bucketed LSH plan — a triangular
    cross product with default args was the one scale-killer flagged in
    round 1."""
    rows = [(i, [float(i), 1.0, 0.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = embedding_near_dup_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_near_dup_exact_guard(spark):
    rows = [(i, [float(i), 1.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="O\\(N\\^2\\)"):
        embedding_near_dup_pairs(df, method="exact", max_exact_rows=10)
    # small corpora pass the guard
    assert embedding_near_dup_pairs(df, method="exact", max_exact_rows=100).count() >= 0


def test_dup_clusters_connected_components(spark):
    from rhq_metrics_spark.pipelines.dedup import dup_clusters

    ids = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    # components: {1,2,3,4} via chain 4-3, 3-2, 2-1; {5,6}; {7} singleton
    pairs = spark.createDataFrame(
        [(3, 4), (2, 3), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r for r in dup_clusters(ids, pairs).collect()}
    assert len(out) == 7
    assert [out[i]["cluster_id"] for i in range(1, 8)] == [1, 1, 1, 1, 5, 5, 7]
    canon = {i for i, r in out.items() if r["is_canonical"]}
    assert canon == {1, 5, 7}


def test_dup_clusters_long_chain_converges(spark):
    from rhq_metrics_spark.pipelines.dedup import dup_clusters

    n = 12
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    out = dup_clusters(ids, pairs).collect()
    assert all(r["cluster_id"] == 0 for r in out)


def test_hot_bucket_cap_degrades_to_hub_pairs(spark):
    """Degenerate corpus (1k identical docs): every band bucket holds all
    1000 docs.  With the cap, candidate generation is linear (hub stars),
    the verify step still accepts every edge (jaccard 1.0), and
    connected components recover the single 1000-doc group — no O(B^2)
    straggler task anywhere."""
    from rhq_metrics_spark.pipelines.dedup import dup_clusters, minhash_lsh_pairs

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text appears everywhere").alias("text"),
    )
    pairs = minhash_lsh_pairs(docs, threshold=0.5, max_bucket_size=50)
    rows = pairs.collect()
    # hub pairing: every doc pairs with the bucket min (id 0) exactly once
    assert len(rows) == 999
    assert {r["id_a"] for r in rows} == {0}
    assert all(r["jaccard"] == 1.0 for r in rows)
    clusters = dup_clusters(docs.select("doc_id"), pairs)
    sizes = clusters.groupBy("cluster_id").count().collect()
    assert len(sizes) == 1 and sizes[0]["count"] == 1000


def test_hot_bucket_cap_preserves_results_below_cap(spark):
    """Corpora whose buckets fit under the cap must be byte-identical to
    the uncapped join (the oracle-checked path)."""
    from rhq_metrics_spark.pipelines.dedup import simhash_pairs

    rows = [(i, f"document number {i} with shared base text") for i in range(40)]
    rows += [(100 + i, "document number 7 with shared base text") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {(r["id_a"], r["id_b"], r["hamming"])
              for r in simhash_pairs(docs, max_bucket_size=50).collect()}
    uncapped = {(r["id_a"], r["id_b"], r["hamming"])
                for r in simhash_pairs(docs, max_bucket_size=None).collect()}
    assert capped == uncapped and len(capped) > 0


def test_segment_dedup_first_occurrence_wins(spark):
    """A segment appearing in two documents survives only in the one
    with the smaller (doc_id, seg_idx); unique segments all survive."""
    from rhq_metrics_spark.pipelines.dedup import segment_dedup

    seg_a = "a b c"              # 3 tokens -> one segment at w=3
    seg_b = "x y z"
    docs = spark.createDataFrame(
        [
            (0, f"{seg_a} {seg_b}"),       # segs: [a b c, x y z]
            (1, f"{seg_b} p q r"),         # x y z is a dup of doc0 seg1? no:
            (2, seg_a),                    # a b c dups doc0 seg0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in segment_dedup(docs, seg_tokens=3).collect()}
    assert out[0]["n_segs"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["kept_text"] == f"{seg_a} {seg_b}"
    # doc1's first segment "x y z" loses to doc0's seg_idx=1 occurrence
    assert out[1]["n_segs"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["kept_text"] == "p q r"
    assert out[2]["n_segs"] == 1 and out[2]["n_kept"] == 0
    assert out[2]["kept_text"] == ""


def test_segment_dedup_partial_tail_segment(spark):
    """The trailing short segment is its own unit and dedups like any
    other."""
    from rhq_metrics_spark.pipelines.dedup import segment_dedup

    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "d e")],  # w=3: doc0 -> [a b c, d e]; doc1 -> [d e]
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in segment_dedup(docs, seg_tokens=3).collect()}
    assert out[0]["n_kept"] == 2
    assert out[1]["n_kept"] == 0 and out[1]["kept_text"] == ""


def test_embed_cross_near_dup_no_self_pairs(spark):
    from rhq_metrics_spark.pipelines.dedup import embed_cross_near_dup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    left = emb.filter("vec_id % 10 = 0")
    right = emb.filter("vec_id % 10 <> 0")
    out = embed_cross_near_dup(left, right, threshold=0.3).collect()
    assert out, "expected at least one cross pair at low threshold"
    for r in out:
        assert r["left_id"] % 10 == 0
        assert r["right_id"] % 10 != 0
        assert r["cosine"] >= 0.3


def test_embed_cross_near_dup_drops_hot_buckets_loudly(spark, caplog):
    import logging

    from rhq_metrics_spark.pipelines.dedup import embed_cross_near_dup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    left = emb.filter("vec_id % 10 = 0")
    right = emb.filter("vec_id % 10 <> 0")
    with caplog.at_level(logging.WARNING):
        embed_cross_near_dup(left, right, threshold=0.3, max_bucket_size=2).collect()
    assert any("hot right-side buckets" in m for m in caplog.messages)


def test_dup_clusters_distributed_path_matches_driver_shortcut(spark):
    from rhq_metrics_spark.pipelines.dedup import dup_clusters

    ids = spark.range(60).select(F.col("id").alias("doc_id"))
    # chains, a cycle, singletons
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 10)]          # chain 0..10
        + [(20, 21), (21, 22), (22, 20)]            # cycle
        + [(30, 40), (40, 50)],                     # long-range links
        "id_a long, id_b long",
    )
    fast = {(r["doc_id"], r["cluster_id"], r["is_canonical"])
            for r in dup_clusters(ids, pairs).collect()}
    dist = {(r["doc_id"], r["cluster_id"], r["is_canonical"])
            for r in dup_clusters(ids, pairs, driver_threshold=0).collect()}
    assert fast == dist
    lookup = {d: c for d, c, _ in fast}
    assert all(lookup[i] == 0 for i in range(11))
    assert lookup[20] == lookup[21] == lookup[22] == 20
    assert lookup[30] == lookup[40] == lookup[50] == 30
    assert lookup[59] == 59  # singleton


def test_star_contraction_matches_union_find_on_random_graphs(spark):
    """Property check of the super-node path: large-star/small-star
    contraction produces the identical min-id labeling as the driver
    union-find on random graphs (chains, stars, forests, dense blobs)."""
    import random

    from rhq_metrics_spark.pipelines.dedup import dup_clusters

    for seed in range(6):
        rng = random.Random(seed)
        n = rng.randint(5, 60)
        n_edges = rng.randint(0, n * 2)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        ids = spark.range(n).select(F.col("id").alias("doc_id"))
        pairs = (
            spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
            .filter("id_a <> id_b")
        )
        exact = {
            r["doc_id"]: r["cluster_id"]
            for r in dup_clusters(ids, pairs).collect()
        }
        star = {
            r["doc_id"]: r["cluster_id"]
            for r in dup_clusters(
                ids, pairs, driver_threshold=0, super_node_degree=0
            ).collect()
        }
        assert star == exact, (seed, {k: (exact[k], star[k]) for k in exact if exact[k] != star[k]})


def test_dup_clusters_routes_hub_to_star_contraction(spark):
    """A hub above super_node_degree takes the contraction path and
    still gets the right single cluster."""
    from rhq_metrics_spark.pipelines.dedup import dup_clusters

    hub_deg = 500
    ids = spark.range(hub_deg + 1).select(F.col("id").alias("doc_id"))
    pairs = spark.range(1, hub_deg + 1).select(
        F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b")
    )
    out = dup_clusters(
        ids, pairs, driver_threshold=0, super_node_degree=100
    ).collect()
    assert all(r["cluster_id"] == 0 for r in out)
    assert sum(r["is_canonical"] for r in out) == 1


def test_simhash_large_doc_within_lane_bound(spark):
    """A document between 2^15 and 2^16 tokens is inside the documented
    65535-token bound and must not overflow the lane sums (regression:
    4x16-bit lanes put the top lane at shift 48, crossing 2^63 around
    32768 same-bit tokens)."""
    from rhq_metrics_spark.pipelines.dedup import simhash_pairs

    words = " ".join(f"w{i % 701}" for i in range(40_000))
    df = spark.createDataFrame(
        [(1, words), (2, words), (3, "something else entirely")],
        "doc_id long, text string",
    )
    out = simhash_pairs(df, max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert (1, 2) in got  # identical huge docs pair up, no overflow


def test_simhash_over_lane_bound_raises(spark):
    from pyspark.sql.utils import PythonException

    from rhq_metrics_spark.pipelines.dedup import simhash_pairs

    words = " ".join(f"w{i}" for i in range(65_600))
    df = spark.createDataFrame([(1, words), (2, words)], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(Exception, match="65535 tokens"):
        simhash_pairs(df, max_hamming=3).collect()


def test_incremental_index_dedup_roundtrip(spark):
    """The incremental loop: index a corpus, dedup a batch that mixes
    exact corpus copies, a near-copy, and novel docs; append uniques;
    a re-run of the same batch is then all-dup."""
    from rhq_metrics_spark.pipelines.dedup import (
        dedup_against_index,
        index_append,
        index_dedup_candidates,
        minhash_index,
    )

    corpus_rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "a completely different document about spark engines"),
        (3, "yet another unrelated piece of text for the corpus set"),
    ]
    batch_rows = [
        (101, "the quick brown fox jumps over the lazy dog today"),  # copy of 1
        (102, "the quick brown fox jumps over the lazy dog tonight"),  # near 1
        (103, "nothing in the corpus resembles this novel sentence at all"),
        (104, "tiny"),  # too short to index -> trivially new
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")

    idx = minhash_index(corpus)
    assert set(idx.columns) >= {"doc_id", "mh_0", "mh_11", "band_0",
                                "band_5", "_refine"}
    dec = {r["doc_id"]: r for r in dedup_against_index(batch, idx).collect()}
    assert len(dec) == 4
    assert not dec[101]["is_new"] and dec[101]["matched_id"] == 1
    assert dec[101]["est_jaccard"] == 1.0
    assert dec[103]["is_new"] and dec[103]["matched_id"] is None
    assert dec[104]["is_new"]
    # the near-copy: signature estimate is noisy at 12 hashes, but the
    # candidate machinery must at least surface it as a pair vs doc 1
    cands = index_dedup_candidates(
        minhash_index(batch), idx, threshold=0.0
    ).collect()
    assert any(r["id_new"] == 102 and r["id_old"] == 1 for r in cands)

    # append uniques; re-running the SAME batch now matches everything
    # indexable (104 stays new: nothing to index)
    idx2 = index_append(idx, minhash_index(batch), dedup_against_index(batch, idx))
    assert idx2.count() == idx.count() + sum(
        1 for r in dec.values() if r["is_new"] and r["doc_id"] != 104
    )
    rerun = {r["doc_id"]: r for r in dedup_against_index(batch, idx2).collect()}
    for i in (101, 102, 103):
        assert not rerun[i]["is_new"], i
        if dec[i]["is_new"]:  # appended -> now matches its own signature
            assert rerun[i]["est_jaccard"] == 1.0, i
    assert rerun[104]["is_new"]


def test_incremental_dedup_hot_bucket_refine(spark):
    """Corpus buckets over the cap route to full-signature joins: exact
    duplicates are still found, and the join plan stays broadcast (the
    corpus index is never shuffled before the join)."""
    from rhq_metrics_spark.pipelines.dedup import (
        dedup_against_index,
        minhash_index,
    )

    # 30 corpus docs sharing long boilerplate (hot band buckets) with a
    # distinct tail each, plus one doc duplicated into the batch
    boiler = "terms and conditions apply to all users of this service "
    corpus_rows = [(i, boiler * 3 + f"unique tail number {i} here")
                   for i in range(30)]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(
        [(100, boiler * 3 + "unique tail number 7 here"),
         (101, "completely unrelated novel content sentence")],
        "doc_id long, text string",
    )
    idx = minhash_index(corpus)
    dec = {r["doc_id"]: r for r in dedup_against_index(
        batch, idx, max_bucket_size=5
    ).collect()}
    assert not dec[100]["is_new"] and dec[100]["matched_id"] == 7
    assert dec[100]["est_jaccard"] == 1.0
    assert dec[101]["is_new"]

    from rhq_metrics_spark.pipelines.dedup import index_dedup_candidates

    pairs = index_dedup_candidates(
        minhash_index(batch), idx, max_bucket_size=5, threshold=0.99
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def _shingle_set(text: str, n: int = 3) -> set:
    toks = text.split()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _incremental_fixture():
    """Deterministic corpus + batch sweeping true Jaccard through the
    0.5 decision threshold: batch doc 100+i perturbs corpus doc i by
    replacing its first ``i`` tokens (i=0 → exact copy, i→30 → novel),
    plus 5 fully-novel docs.  Everything md5/text-deterministic, so the
    measured error rates below are FIXED numbers, not flaky samples."""
    pool = [f"w{(i * 7) % 97}x{i % 11}" for i in range(400)]
    corpus_rows = [
        (i, " ".join(pool[(i * 13 + k) % 400] for k in range(30)))
        for i in range(40)
    ]
    batch_rows = []
    for i in range(25):
        base = corpus_rows[i][1].split()
        repl = [f"z{i}q{p}" for p in range(i)] + base[i:]
        batch_rows.append((100 + i, " ".join(repl)))
    for i in range(5):
        batch_rows.append((200 + i, " ".join(f"novel{i}t{k}" for k in range(30))))
    return corpus_rows, batch_rows


def _decision_errors(decisions: dict, truth: dict, threshold: float):
    false_keep = [i for i, r in decisions.items()
                  if r["is_new"] and truth[i] >= threshold]
    false_drop = [i for i, r in decisions.items()
                  if not r["is_new"] and truth[i] < threshold]
    return false_keep, false_drop


def test_incremental_dedup_kmv_verify_beats_estimator(spark):
    """VERDICT r8 item 4: the 12-hash estimator decides keep/drop with
    σ≈0.14 at J=0.5; the KMV verify leg must measurably cut decision
    errors vs exact ground truth on a threshold-straddling corpus."""
    from rhq_metrics_spark.pipelines.dedup import (
        dedup_against_index,
        minhash_index,
    )

    corpus_rows, batch_rows = _incremental_fixture()
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    threshold = 0.5

    corpus_sets = {i: _shingle_set(t) for i, t in corpus_rows}
    truth = {}
    for i, t in batch_rows:
        s = _shingle_set(t)
        truth[i] = max(
            (len(s & cs) / len(s | cs) for cs in corpus_sets.values() if cs),
            default=0.0,
        )

    idx_plain = minhash_index(corpus)
    est_dec = {r["doc_id"]: r for r in dedup_against_index(
        batch, idx_plain, threshold=threshold, max_bucket_size=None
    ).collect()}

    idx_kmv = minhash_index(corpus, kmv_k=128)
    kmv_dec = {r["doc_id"]: r for r in dedup_against_index(
        batch, idx_kmv, threshold=threshold, max_bucket_size=None,
        verify="kmv",
    ).collect()}

    est_fk, est_fd = _decision_errors(est_dec, truth, threshold)
    kmv_fk, kmv_fd = _decision_errors(kmv_dec, truth, threshold)
    n_dups = sum(1 for v in truth.values() if v >= threshold)
    print(f"\ntruth: {n_dups} dups / {len(truth)} docs; "
          f"estimator FK={len(est_fk)} FD={len(est_fd)}; "
          f"kmv FK={len(kmv_fk)} FD={len(kmv_fd)}")

    # md5-deterministic, so these are exact pinned numbers, not a
    # statistical assertion: at the default 12-hash/0.5 operating
    # point the estimator false-drops 2 genuinely-new docs (their
    # true best J sits just under 0.5 but the coarse estimate rounds
    # over it); the k=128 sketch makes zero decision errors.
    assert (len(est_fk), len(est_fd)) == (0, 2)
    assert (len(kmv_fk), len(kmv_fd)) == (0, 0)
    # kmv estimates on exact copies are exactly 1.0
    assert kmv_dec[100]["kmv_jaccard"] == 1.0
    assert not kmv_dec[100]["is_new"] and kmv_dec[100]["matched_id"] == 0
    # novel docs never match
    for i in range(5):
        assert kmv_dec[200 + i]["is_new"]


def test_lsh_tuning_s_curve():
    """Sizing helper: crossover nearest the target among factorizations
    of num_hashes; the S-curve is monotone and correct at the ends."""
    import pytest

    from rhq_metrics_spark.pipelines.dedup import lsh_tuning

    t = lsh_tuning(12, 0.5)
    assert t["bands"] * t["rows"] == 12
    # 6 bands x 2 rows: crossover (1/6)^(1/2) ~ 0.41 — the closest to 0.5
    assert (t["bands"], t["rows"]) == (6, 2)
    assert abs(t["crossover"] - (1 / 6) ** 0.5) < 1e-12
    curve = t["p_candidate"]
    assert curve[0.1] < 0.2 and curve[0.9] > 0.98
    assert all(curve[round(s / 10, 1)] <= curve[round((s + 1) / 10, 1)]
               for s in range(1, 9))
    # a high threshold prefers more rows per band
    hi = lsh_tuning(12, 0.9)
    assert hi["rows"] > t["rows"]
    with pytest.raises(ValueError):
        lsh_tuning(1, 0.5)
    with pytest.raises(ValueError):
        lsh_tuning(12, 1.5)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_blocked_pairs_planted_typos(spark):
    """Typo-level near-dups inside a block are found with the exact
    normalized-Levenshtein similarity; different blocks never pair."""
    from rhq_metrics_spark.pipelines.dedup import fuzzy_blocked_pairs

    rows = [
        (1, "en", "alpha quick brown fox jumps over the lazy dog"),
        (2, "en", "alpha quick brown fox jumps ovre the lazy dog"),   # typo
        (3, "en", "alpha totally different words entirely here now zz"),
        (4, "en", "beta quick brown fox jumps over the lazy dog"),    # other block
        (5, "de", "alpha quick brown fox jumps over the lazy dog"),   # other lang
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        (r["id_a"], r["id_b"]): (r["lev"], r["sim_r"])
        for r in fuzzy_blocked_pairs(df, min_sim=0.6).collect()
    }
    assert set(out) == {(1, 2)}
    a, b = rows[0][2][:48], rows[1][2][:48]
    want_lev = _lev(a, b)
    assert out[(1, 2)][0] == want_lev
    assert out[(1, 2)][1] == round(1.0 - want_lev / max(len(a), len(b)), 6)


def test_fuzzy_blocked_pairs_drops_oversize_blocks(spark, caplog):
    """Blocks over max_block are dropped WITH a warning (no silent
    caps), smaller blocks still pair."""
    import logging

    from rhq_metrics_spark.pipelines.dedup import fuzzy_blocked_pairs

    hot = [(i, "en", "spam identical boilerplate text") for i in range(10)]
    cold = [
        (100, "en", "rare document body one x"),
        (101, "en", "rare document body one y"),
    ]
    df = spark.createDataFrame(
        hot + cold, "doc_id long, lang string, text string"
    )
    with caplog.at_level(logging.WARNING, logger="rhq_metrics_spark.pipelines.dedup"):
        out = fuzzy_blocked_pairs(df, min_sim=0.5, max_block=5).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(100, 101)}
    assert any("oversize block" in rec.message for rec in caplog.records)


def test_fuzzy_blocked_pairs_fresh_after_source_grows(spark, tmp_path):
    """Serving-loop freshness (VERDICT r13 item 6): a second call over
    the SAME source path after new files land must see the new rows —
    the old persist() keyed the cache on the analyzed plan and would
    have served the first call's snapshot; eager localCheckpoint takes
    a per-call snapshot instead."""
    from rhq_metrics_spark.pipelines.dedup import fuzzy_blocked_pairs

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (1, "en", "alpha quick brown fox jumps over the lazy dog"),
            (2, "en", "alpha quick brown fox jumps ovre the lazy dog"),
        ],
        "doc_id long, lang string, text string",
    ).write.parquet(path)
    first = fuzzy_blocked_pairs(
        spark.read.parquet(path), min_sim=0.6
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in first} == {(1, 2)}
    # a third near-duplicate lands in the same path
    spark.createDataFrame(
        [(3, "en", "alpha quick brown fox jumps over the lazy dgo")],
        "doc_id long, lang string, text string",
    ).write.mode("append").parquet(path)
    second = fuzzy_blocked_pairs(
        spark.read.parquet(path), min_sim=0.6
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in second} == {
        (1, 2), (1, 3), (2, 3),
    }


def test_fuzzy_inc_oracle_matches_combined_block_sizing(spark, tmp_path):
    """ADVICE r13: the dedup_fuzzy_incremental DuckDB oracle must size
    hot blocks on corpus UNION ALL batch exactly like
    fuzzy_against_index does — pinned on a fixture whose hot block
    crosses the 2000 cap ONLY once the batch is included (no sf0.01
    block straddles, so only this test exercises the divergence the
    old corpus-only oracle CTE had)."""
    import duckdb

    import __spark_entry__ as entry

    # block (en, 'spam'): 1809 corpus + 201 batch = 2010 > 2000
    # combined, but corpus alone (1809) is under the cap — the old
    # oracle kept it, the implementation drops it
    rows = [(i, "en", "spam identical boilerplate body") for i in range(2010)]
    # cold block with one planted cross near-dup (2029 % 10 == 9 ->
    # batch side)
    rows += [
        (2021, "en", "alpha quick brown fox jumps over the lazy dog"),
        (2029, "en", "alpha quick brown fox jumps ovre the lazy dog"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        (r["id_new"], r["id_old"])
        for r in entry.q_dedup_fuzzy_incremental(spark, sf_dir).collect()
    }
    assert got == {(2029, 2021)}, got  # hot block dropped on BOTH sides

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    oracle = {
        (r[0], r[1])
        for r in con.execute(entry.SQL_DEDUP_FUZZY_INC).fetchall()
    }
    assert oracle == got, "oracle hot-CTE sizing diverges from the operator"


def test_fuzzy_blocked_pairs_validation(spark):
    import pytest as _pytest

    from rhq_metrics_spark.pipelines.dedup import fuzzy_blocked_pairs

    df = spark.createDataFrame(
        [(1, "en", "a b")], "doc_id long, lang string, text string"
    )
    with _pytest.raises(ValueError, match="prefix_len"):
        fuzzy_blocked_pairs(df, prefix_len=2)
    with _pytest.raises(ValueError, match="min_sim"):
        fuzzy_blocked_pairs(df, min_sim=0.0)


def test_fuzzy_against_index_equals_full_repair(spark):
    """Corpus-internal pairs + the incremental output == a full
    fuzzy_blocked_pairs over corpus u batch (the minhash-index
    equivalence, ER edition)."""
    from rhq_metrics_spark.pipelines.dedup import (
        fuzzy_against_index,
        fuzzy_blocked_pairs,
        fuzzy_index,
    )

    corpus_rows = [
        (1, "en", "alpha quick brown fox jumps over the lazy dog"),
        (2, "en", "alpha quick brown fox jumps ovre the lazy dog"),
        (3, "en", "alpha completely unrelated words here zz yy xx"),
        (4, "de", "beta ein zwei drei vier funf sechs sieben acht"),
    ]
    batch_rows = [
        (10, "en", "alpha quick brown fox jumps over the lazy dot"),  # near 1,2
        (11, "de", "beta ein zwei drei vier funf sechs sieben acgt"),  # near 4
        (12, "en", "alpha quick brown fox jumps over the lazy dos"),  # near 10 too
    ]
    schema = "doc_id long, lang string, text string"
    corpus = spark.createDataFrame(corpus_rows, schema)
    batch = spark.createDataFrame(batch_rows, schema)
    min_sim = 0.6

    inc = fuzzy_against_index(
        fuzzy_index(corpus), fuzzy_index(batch), min_sim=min_sim
    )
    inc_pairs = {
        tuple(sorted((r["id_new"], r["id_old"]))): (r["lev"], r["sim_r"])
        for r in inc.collect()
    }
    corpus_internal = {
        (r["id_a"], r["id_b"]): (r["lev"], r["sim_r"])
        for r in fuzzy_blocked_pairs(corpus, min_sim=min_sim).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): (r["lev"], r["sim_r"])
        for r in fuzzy_blocked_pairs(
            corpus.unionByName(batch), min_sim=min_sim
        ).collect()
    }
    assert {**corpus_internal, **inc_pairs} == full
    # the increment found batch-vs-corpus AND batch-internal matches
    assert any(10 in p and 1 in p for p in inc_pairs)
    assert any(10 in p and 12 in p for p in inc_pairs)
    assert any(11 in p and 4 in p for p in inc_pairs)


def test_fuzzy_against_index_broadcasts_batch_and_caps_blocks(spark, caplog):
    import logging

    from rhq_metrics_spark.pipelines.dedup import (
        fuzzy_against_index,
        fuzzy_index,
    )

    hot_corpus = [(i, "en", "spam same text") for i in range(10)]
    cold_corpus = [(100, "en", "rare document body x")]
    batch = [(200, "en", "rare document body y"), (201, "en", "spam same text")]
    schema = "doc_id long, lang string, text string"
    ci = fuzzy_index(spark.createDataFrame(hot_corpus + cold_corpus, schema))
    bi = fuzzy_index(spark.createDataFrame(batch, schema))
    with caplog.at_level(logging.WARNING, logger="rhq_metrics_spark.pipelines.dedup"):
        df = fuzzy_against_index(ci, bi, min_sim=0.5, max_block=5)
        out = df.collect()
    # the hot 'spam' block is dropped on BOTH sides; the cold pair matches
    assert {(r["id_new"], r["id_old"]) for r in out} == {(200, 100)}
    assert any("oversize block" in rec.message for rec in caplog.records)
    # the batch side must broadcast — the corpus is never shuffled
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fuzzy_against_index_sizes_blocks_on_corpus_plus_batch(spark, caplog):
    """ADVICE r12: a corpus block just UNDER max_block that crosses the
    threshold once the batch lands — and a hot block concentrated in
    the batch alone — are both dropped, so corpus-internal pairs + the
    incremental output still equals a full fuzzy_blocked_pairs over
    corpus u batch at the same max_block."""
    import logging

    from rhq_metrics_spark.pipelines.dedup import (
        fuzzy_against_index,
        fuzzy_blocked_pairs,
        fuzzy_index,
    )

    max_block = 5
    # 'edge' block: 4 in corpus (under cap), batch adds 2 -> 6 > 5
    edge_corpus = [(i, "en", f"edge shared text v{i}") for i in range(4)]
    # 'hot' block lives ONLY in the batch: 6 rows > 5
    hot_batch = [(300 + i, "en", "hotb same text") for i in range(6)]
    cold_corpus = [(100, "en", "rare document body x")]
    batch_edge = [(200, "en", "edge shared text v0"), (201, "en", "edge shared text v1")]
    batch_cold = [(202, "en", "rare document body y")]
    schema = "doc_id long, lang string, text string"
    corpus = spark.createDataFrame(edge_corpus + cold_corpus, schema)
    batch = spark.createDataFrame(hot_batch + batch_edge + batch_cold, schema)

    with caplog.at_level(logging.WARNING, logger="rhq_metrics_spark.pipelines.dedup"):
        inc = fuzzy_against_index(
            fuzzy_index(corpus), fuzzy_index(batch),
            min_sim=0.5, max_block=max_block,
        ).collect()
    inc_pairs = {tuple(sorted((r["id_new"], r["id_old"]))) for r in inc}
    # only the cold pair survives: edge crossed the combined cap, hotb
    # is batch-internal hot
    assert inc_pairs == {(100, 202)}
    assert any("corpus+batch" in rec.message for rec in caplog.records)
    # equivalence against the full run at the same cap: the increment
    # emits exactly the batch-touching pairs the full run emits (the
    # combined sizing makes the two drop the SAME blocks)
    full = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_blocked_pairs(
            corpus.unionByName(batch), min_sim=0.5, max_block=max_block
        ).collect()
    }
    batch_ids = {r[0] for r in hot_batch + batch_edge + batch_cold}
    assert inc_pairs == {p for p in full if set(p) & batch_ids}


def test_fs_field_weights_hand_computed(spark):
    """m/u agreement rates and the match/chance ratio on a planted
    labeled pair set, null-safe equality included."""
    import pytest as _pytest

    from rhq_metrics_spark.pipelines.dedup import fs_field_weights

    docs = spark.createDataFrame(
        [
            (1, "en", "web"), (2, "en", "web"), (3, "en", None),
            (4, "de", None), (5, "fr", "book"),
        ],
        "doc_id long, lang string, source string",
    )
    # matches: (1,2) agree on both; (3,4) disagree lang, agree source
    # (null == null is agreement under eqNullSafe)
    # non-matches: (1,5) disagree both; (2,3) agree lang, disagree source
    pairs = spark.createDataFrame(
        [
            (1, 2, True), (3, 4, True),
            (1, 5, False), (2, 3, False),
        ],
        "id_a long, id_b long, is_match boolean",
    )
    out = {
        (r["field"], r["is_match"]): r
        for r in fs_field_weights(docs, pairs, ("lang", "source")).collect()
    }
    assert out[("lang", True)]["n_agree"] == 1      # (1,2) only
    assert out[("lang", True)]["rate_ppm"] == 500_000
    assert out[("lang", False)]["n_agree"] == 1     # (2,3)
    assert out[("source", True)]["n_agree"] == 2    # (1,2) + null==null
    assert out[("source", True)]["rate_ppm"] == 1_000_000
    assert out[("source", False)]["n_agree"] == 0
    # weight = m_ppm * 1e6 div max(u_ppm, 1)
    assert out[("lang", True)]["weight_ratio_ppm"] == 1_000_000  # .5/.5
    assert out[("source", True)]["weight_ratio_ppm"] == 1_000_000 * 1_000_000
    with _pytest.raises(ValueError, match="fields"):
        fs_field_weights(docs, pairs, ())


def test_fs_score_pairs_hand_computed(spark):
    """The FS decision half (VERDICT r13 item 5) on the same planted
    fixture as the estimation test.  Hand-derived rates: lang m=u=0.5
    (uninformative: both ratios 1.0), source m=1e6 ppm, u=0 — so with
    the 1-ppm floor, source agreement multiplies the score by 1e6 and
    source disagreement by 1e-6; lang contributes nothing either way."""
    import pytest as _pytest

    from rhq_metrics_spark.pipelines.dedup import (
        fs_field_weights,
        fs_score_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "en", "web"), (2, "en", "web"), (3, "en", None),
            (4, "de", None), (5, "fr", "book"),
        ],
        "doc_id long, lang string, source string",
    )
    labeled = spark.createDataFrame(
        [(1, 2, True), (3, 4, True), (1, 5, False), (2, 3, False)],
        "id_a long, id_b long, is_match boolean",
    )
    weights = fs_field_weights(docs, labeled, ("lang", "source"))
    cands = labeled.select("id_a", "id_b")
    got = {
        (r["id_a"], r["id_b"]): (r["n_agree"], r["score_r"], r["band"])
        for r in fs_score_pairs(
            docs, cands, weights, ("lang", "source")
        ).collect()
    }
    # (1,2): lang agree (×1.0), source agree (×1e6) -> 1e6, match
    assert got[(1, 2)] == (2, 1_000_000.0, "match")
    # (3,4): lang disagree (×1.0), null==null source agree -> match
    assert got[(3, 4)] == (1, 1_000_000.0, "match")
    # (1,5): both disagree -> 1.0 × 1e-6 -> non_match
    assert got[(1, 5)] == (0, 0.000001, "non_match")
    # (2,3): lang agree, source web vs null disagree -> non_match
    assert got[(2, 3)] == (1, 0.000001, "non_match")
    # custom thresholds expose the clerical-review band
    banded = {
        (r["id_a"], r["id_b"]): r["band"]
        for r in fs_score_pairs(
            docs, cands, weights, ("lang", "source"),
            upper_odds=2e6, lower_odds=1e-5,
        ).collect()
    }
    assert banded[(1, 2)] == "possible"   # 1e6 < 2e6 upper
    assert banded[(1, 5)] == "non_match"  # 1e-6 <= 1e-5 lower
    with _pytest.raises(ValueError, match="fields"):
        fs_score_pairs(docs, cands, weights, ())
    with _pytest.raises(ValueError, match="lower_odds"):
        fs_score_pairs(
            docs, cands, weights, ("lang",), upper_odds=1.0, lower_odds=2.0
        )


def _em_reference_per_pair(pair_flags, n_fields, iters=20,
                           p=100_000, m0=900_000, u0=100_000):
    """Independent EM reference that iterates over PAIRS (not the
    pattern table) — mathematically identical sufficient statistics,
    different code path; exact ints throughout."""
    ppm = 1_000_000
    m = [m0] * n_fields
    u = [u0] * n_fields
    n = len(pair_flags)
    for _ in range(iters):
        sw = su = 0
        swg = [0] * n_fields
        sug = [0] * n_fields
        for g in pair_flags:
            pm = ppm
            pu = ppm
            for f in range(n_fields):
                pm = pm * (m[f] if g[f] else ppm - m[f]) // ppm
                pu = pu * (u[f] if g[f] else ppm - u[f]) // ppm
            num = p * pm
            den = num + (ppm - p) * pu
            w = num * ppm // max(den, 1)
            sw += w
            su += ppm - w
            for f in range(n_fields):
                if g[f]:
                    swg[f] += w
                    sug[f] += ppm - w
        p = sw // max(n, 1)
        m = [swg[f] * ppm // max(sw, 1) for f in range(n_fields)]
        u = [sug[f] * ppm // max(su, 1) for f in range(n_fields)]
    return p, m, u


def test_fs_em_weights_matches_per_pair_reference(spark):
    """The pattern-table EM equals an independently-written per-pair
    EM bit-for-bit (same sufficient statistics, different code path)."""
    from rhq_metrics_spark.pipelines.dedup import fs_em_weights

    # 60 pairs: 20 duplicate-ish (agree on both fields), 40 random-ish
    docs_rows = []
    pairs_rows = []
    flags = []
    for i in range(20):  # matches: same city, same zip
        docs_rows += [(2 * i, "A", "X"), (2 * i + 1, "A", "X")]
        pairs_rows.append((2 * i, 2 * i + 1))
        flags.append((1, 1))
    base = 1000
    for i in range(40):  # non-matches: differ on both
        docs_rows += [
            (base + 2 * i, f"C{i}", f"Z{i}"),
            (base + 2 * i + 1, f"D{i}", f"Y{i}"),
        ]
        pairs_rows.append((base + 2 * i, base + 2 * i + 1))
        flags.append((0, 0))
    docs = spark.createDataFrame(
        docs_rows, "doc_id long, city string, zip string"
    )
    pairs = spark.createDataFrame(pairs_rows, "id_a long, id_b long")
    out = {
        r["field"]: r
        for r in fs_em_weights(docs, pairs, ("city", "zip")).collect()
    }
    p_ref, m_ref, u_ref = _em_reference_per_pair(flags, 2)
    assert out["city"]["m_ppm"] == m_ref[0]
    assert out["zip"]["m_ppm"] == m_ref[1]
    assert out["city"]["u_ppm"] == u_ref[0]
    assert out["zip"]["u_ppm"] == u_ref[1]
    assert out["city"]["p_match_ppm"] == p_ref
    assert out["city"]["n_pairs"] == 60
    # and EM actually separated the planted structure without labels:
    # ~1/3 of pairs are duplicates, agreement is perfectly predictive
    assert out["city"]["m_ppm"] > 900_000 and out["city"]["u_ppm"] < 100_000
    assert 250_000 < out["city"]["p_match_ppm"] < 400_000


def test_fs_em_weights_validation_and_rates_adapter(spark):
    import pytest as _pytest

    from rhq_metrics_spark.pipelines.dedup import (
        fs_em_as_rates,
        fs_em_weights,
        fs_score_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "A", "X"), (2, "A", "X"), (3, "B", "Y")],
        "doc_id long, city string, zip string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    with _pytest.raises(ValueError, match="fields"):
        fs_em_weights(docs, pairs, ())
    with _pytest.raises(ValueError, match="iters"):
        fs_em_weights(docs, pairs, ("city",), iters=0)
    with _pytest.raises(ValueError, match="init_p_ppm"):
        fs_em_weights(docs, pairs, ("city",), init_p_ppm=0)
    with _pytest.raises(ValueError, match="fields"):
        fs_em_weights(
            docs, pairs, tuple(f"f{i}" for i in range(17))
        )
    # unsupervised estimation feeds the supervised scoring leg
    em = fs_em_weights(docs, pairs, ("city", "zip"))
    scored = fs_score_pairs(
        docs, pairs, fs_em_as_rates(em), ("city", "zip")
    ).collect()
    assert {r["band"] for r in scored} <= {"match", "possible", "non_match"}
    assert len(scored) == 2


def test_er_unsupervised_bands_match_supervised_on_clean_separation(spark):
    """VERDICT r14 item 3: the label-free chain (blocked pairs → EM →
    rates adapter → scoring → bands) against the SUPERVISED chain
    (labels → fs_field_weights → scoring → bands) on a fixture where
    agreement cleanly separates matches — EM recovers the same m/u
    structure without seeing a single label, so every pair lands in
    the same band with the same agreement count."""
    from rhq_metrics_spark.pipelines.dedup import (
        fs_em_as_rates,
        fs_em_weights,
        fs_field_weights,
        fs_score_pairs,
    )

    docs_rows, pairs_rows, labels_rows = [], [], []
    for i in range(20):  # true duplicates agree on both fields
        docs_rows += [(2 * i, f"C{i}", f"Z{i}"), (2 * i + 1, f"C{i}", f"Z{i}")]
        pairs_rows.append((2 * i, 2 * i + 1))
        labels_rows.append((2 * i, 2 * i + 1, True))
    for i in range(19):  # cross-entity candidates disagree on both
        pairs_rows.append((2 * i, 2 * i + 2))
        labels_rows.append((2 * i, 2 * i + 2, False))
    docs = spark.createDataFrame(
        docs_rows, "doc_id long, city string, zip string"
    )
    pairs = spark.createDataFrame(pairs_rows, "id_a long, id_b long")
    labeled = spark.createDataFrame(
        labels_rows, "id_a long, id_b long, is_match boolean"
    )
    fields = ("city", "zip")

    sup = fs_score_pairs(
        docs, pairs, fs_field_weights(docs, labeled, fields), fields
    ).collect()
    em = fs_em_weights(docs, pairs, fields, iters=20)
    unsup = fs_score_pairs(
        docs, pairs, fs_em_as_rates(em), fields
    ).collect()

    sup_by_pair = {(r["id_a"], r["id_b"]): r for r in sup}
    unsup_by_pair = {(r["id_a"], r["id_b"]): r for r in unsup}
    assert sup_by_pair.keys() == unsup_by_pair.keys()
    assert len(sup_by_pair) == 39
    for key, s in sup_by_pair.items():
        u = unsup_by_pair[key]
        assert u["band"] == s["band"], key
        assert u["n_agree"] == s["n_agree"], key
    # and the bands are the planted truth: duplicates → match,
    # cross-entity → non_match, nothing stuck in clerical review
    bands = {
        (r["id_a"], r["id_b"]): r["band"] for r in unsup
    }
    assert all(bands[(2 * i, 2 * i + 1)] == "match" for i in range(20))
    assert all(bands[(2 * i, 2 * i + 2)] == "non_match" for i in range(19))
