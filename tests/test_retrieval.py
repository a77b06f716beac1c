"""Lexical retrieval + fusion: the exact-integer log2 gadget (vs
math.log2 and the pure-Python reference), BM25 vs an independent
float implementation, RRF hand-computed."""

import math
import random

import pytest

from rhq_metrics_spark.pipelines.retrieval import (
    bm25_topk,
    log2_fxp_int,
    with_log2_fxp,
)

DOCS = [
    (0, "spark distributed query engine for big data"),
    (1, "duck database analytical query engine"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "spark streaming and spark sql power the engine"),
    (4, "a completely unrelated cooking recipe with basil"),
]
QUERIES = [(0, "spark engine"), (1, "lazy dog")]


def test_log2_fxp_int_tracks_math_log2():
    random.seed(7)
    ns = [1, 2, 3, 7, 10, 65535, 10**12, 10**15] + [
        random.randrange(1, 10**15) for _ in range(300)
    ]
    for n in ns:
        got = log2_fxp_int(n) / 65536
        assert abs(got - math.log2(n)) < 3e-5, n
        # truncation contract: never above the true value by more
        # than one output ulp
        assert got <= math.log2(n) + 1 / 65536
    with pytest.raises(ValueError, match="n must be"):
        log2_fxp_int(0)
    with pytest.raises(ValueError, match="frac_bits"):
        log2_fxp_int(5, frac_bits=0)


def test_with_log2_fxp_matches_python_reference(spark):
    ns = [1, 2, 3, 7, 10, 65535, 982451653, 10**12]
    df = spark.createDataFrame([(n,) for n in ns], "n long")
    for fb in (8, 16):
        out = {
            r["n"]: r["l2"]
            for r in with_log2_fxp(df, "n", "l2", frac_bits=fb).collect()
        }
        assert out == {n: log2_fxp_int(n, fb) for n in ns}


def _ref_bm25(query, k):
    """Independent float BM25 (math.log2 idf, same ±0.5-cleared
    integers) — ranking oracle for the integer implementation."""
    k1, b = 1.2, 0.75
    toks = [d[1].lower().split() for d in DOCS]
    n = len(DOCS)
    avg = sum(len(t) for t in toks) / n
    scores = {}
    for i, t in enumerate(toks):
        s, hit = 0.0, False
        for term in set(query.split()):
            tf = t.count(term)
            if not tf:
                continue
            hit = True
            df = sum(term in set(tt) for tt in toks)
            idf = math.log2((2 * n - 2 * df + 1) / (2 * df + 1))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avg))
        if hit:
            scores[i] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_bm25_matches_float_reference(spark):
    ddf = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    got = bm25_topk(ddf, qdf, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, query in QUERIES:
        mine = sorted(by_q[qid], key=lambda r: r["rank"])
        want = _ref_bm25(query, 3)
        assert [r["doc_id"] for r in mine] == [d for d, _ in want], qid
        for r, (_, sf) in zip(mine, want):
            # score_fx is 2^-16·1e-6 units of the log2-BM25 value
            assert r["score_fx"] / (65536 * 1e6) == pytest.approx(
                sf, abs=2e-3
            )
    # doc 0 matches both query-0 terms with idfs that cancel exactly:
    # a matched document with net score 0 HOLDS a rank (it tied the
    # float reference's 0.0 — the `if hit` semantics, not `if score`)
    q0 = [r["doc_id"] for r in sorted(by_q[0], key=lambda r: r["rank"])]
    assert 0 in q0


def test_bm25_length_normalization_and_validation(spark):
    # same tf, shorter doc wins under b > 0 (fillers keep df < N/2 so
    # the idf is positive — with df = N the Robertson idf goes
    # negative and the ordering legitimately flips)
    docs = [
        (0, "apple pie"),
        (1, "apple pie with a very long tail of unrelated words here"),
        (2, "one filler document"),
        (3, "another filler document"),
        (4, "yet more filler text"),
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame([(0, "apple")], "query_id long, query string")
    out = sorted(
        bm25_topk(ddf, qdf, k=2).collect(), key=lambda r: r["rank"]
    )
    assert [r["doc_id"] for r in out] == [0, 1]
    # b = 0 removes length normalization: scores tie, id breaks
    out0 = sorted(
        bm25_topk(ddf, qdf, k=2, b_ppm=0).collect(), key=lambda r: r["rank"]
    )
    assert out0[0]["score_fx"] == out0[1]["score_fx"]
    assert [r["doc_id"] for r in out0] == [0, 1]
    with pytest.raises(ValueError, match="k must"):
        bm25_topk(ddf, qdf, k=0)
    with pytest.raises(ValueError, match="k1_ppm"):
        bm25_topk(ddf, qdf, k1_ppm=0)
    with pytest.raises(ValueError, match="b_ppm"):
        bm25_topk(ddf, qdf, b_ppm=2_000_000)


def test_rrf_fuses_lexical_and_dense_runs(spark):
    """The intended composition: a bm25_topk run over doc text fused
    (pipelines/hybrid.py rrf_fuse, query_cols form) with a dense
    cosine run over doc-aligned embeddings — a doc strong in both
    runs outranks docs strong in only one."""
    from rhq_metrics_spark.pipelines.hybrid import rrf_fuse
    from rhq_metrics_spark.pipelines.similarity import cosine_topk

    docs = [
        (1, "spark query engine"),
        (2, "spark engine tuning"),
        (3, "cooking with basil"),
        (4, "gardening tools"),
    ]
    # embeddings aligned with doc ids; query vector id 0
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.95, 0.30]),
        (2, [0.99, 0.10]),
        (3, [0.0, 1.0]),
        (4, [0.1, 0.99]),
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(
        [(0, "spark engine")], "query_id long, query string"
    )
    lex = bm25_topk(ddf, qdf, k=4).select("query_id", "doc_id", "rank")
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    dense = cosine_topk(emb, emb.filter("vec_id = 0"), k=4).select(
        F.lit(0).cast("long").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    fused = sorted(
        rrf_fuse(
            {"lex": lex, "vec": dense},
            query_cols=("query_id",),
            top_k=4,
        ).collect(),
        key=lambda r: r["rank"],
    )
    # docs 1 and 2 appear in both runs; 3 and 4 in at most one
    assert {fused[0]["doc_id"], fused[1]["doc_id"]} == {1, 2}


import pyspark.sql.functions as F  # noqa: E402  (used in the test above)


# ---------------------------------------------------------------------------
# Standing inverted index (r15): serving leg == direct leg, exactly.


def _rows(df):
    return [tuple(r) for r in df.orderBy("query_id", "rank").collect()]


def test_bm25_index_serving_equals_direct(spark, tmp_path):
    """bm25_against_index must be BIT-IDENTICAL to bm25_topk on the
    indexed corpus (scores included — both run the same exact integer
    arithmetic), and the empty-query edge returns an empty frame of
    the same shape."""
    from rhq_metrics_spark.pipelines.retrieval import (
        bm25_against_index,
        bm25_index,
        bm25_index_stats,
    )

    ddf = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    path = str(tmp_path / "bm25")
    st = bm25_index(ddf, path, n_buckets=8)
    assert st == bm25_index_stats(spark, path)
    assert st["n_docs"] == len(DOCS)
    assert st["sum_dl"] == sum(len(t.split()) for _, t in DOCS)
    assert _rows(bm25_against_index(spark, path, qdf, k=3)) == _rows(
        bm25_topk(ddf, qdf, k=3)
    )
    # non-default k1/b flow through identically
    assert _rows(
        bm25_against_index(spark, path, qdf, k=3, k1_ppm=700_000, b_ppm=0)
    ) == _rows(bm25_topk(ddf, qdf, k=3, k1_ppm=700_000, b_ppm=0))
    empty_q = spark.createDataFrame(
        [(9, "   ")], "query_id long, query string"
    )
    out = bm25_against_index(spark, path, empty_q, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "doc_id", "score_fx", "rank"]


def test_bm25_serve_df_from_dfreq(spark, tmp_path):
    """r16 opt: with no tombstones resident the serving leg takes
    per-term df from the persisted dfreq components (Σ per-source df)
    instead of a second countDistinct pass over the merged hit table.
    Pin the store invariant that makes the two identical — pieces hold
    disjoint docs, so per-source dfs ADD — on a multi-piece store whose
    pieces SHARE terms, and pin the served ranking bit-identical to the
    direct operator through the fast path."""
    from rhq_metrics_spark.pipelines.retrieval import (
        _resolve_sources,
        _source_paths,
        _union_all,
        bm25_against_index,
        bm25_append,
        bm25_index,
    )

    ddf = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    path = str(tmp_path / "bm25")
    bm25_index(ddf.filter("doc_id < 3"), path, n_buckets=8)
    bm25_append(spark, path, ddf.filter("doc_id >= 3"), append_id="p1")
    paths = _source_paths(path, _resolve_sources(spark, path))
    assert len(paths) == 2  # root + piece: the summed-df case is real
    # the invariant itself: Σ per-source dfreq == exact countDistinct
    # over the merged postings ("spark"/"engine" span both sources)
    from_dfreq = {
        (r["term"], r["df"])
        for r in _union_all(
            [
                spark.read.parquet(f"{p}/dfreq").select("term", "df")
                for p in paths
            ]
        )
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .collect()
    }
    exact = {
        (r["term"], r["df"])
        for r in _union_all(
            [
                spark.read.parquet(f"{p}/postings").select("term", "doc_id")
                for p in paths
            ]
        )
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .collect()
    }
    assert from_dfreq == exact
    # and serving through the fast path stays bit-identical to direct
    assert _rows(bm25_against_index(spark, path, qdf, k=3)) == _rows(
        bm25_topk(ddf, qdf, k=3)
    )


def test_bm25_append_equals_full_build(spark, tmp_path):
    """The incremental maintenance contract: index(90%) + append(10%)
    serves bit-identically to a from-scratch build over everything —
    df counts, corpus stats and postings all exact.  r16: the append
    is a committed PIECE + a CAS manifest commit, so a retried append
    with the same append_id converges to the identical store, and the
    opt-in overlap guard raises on a doc-id reuse instead of
    double-counting it."""
    import pytest as _pytest

    from rhq_metrics_spark.pipelines.retrieval import (
        bm25_against_index,
        bm25_append,
        bm25_index,
        bm25_index_stats,
    )

    ddf = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    inc = str(tmp_path / "inc")
    bm25_index(ddf.filter("doc_id < 3"), inc, n_buckets=8)
    st = bm25_append(spark, inc, ddf.filter("doc_id >= 3"), append_id="j1")
    full = str(tmp_path / "full")
    stf = bm25_index(ddf, full, n_buckets=8)
    # content-identical; only the physical layout differs (one piece)
    assert st["n_pieces"] == 1 and stf["n_pieces"] == 0
    content = lambda d: {
        k: v for k, v in d.items() if k != "n_pieces"
    }  # noqa: E731
    assert content(st) == content(stf)
    assert _rows(bm25_against_index(spark, inc, qdf, k=3)) == _rows(
        bm25_against_index(spark, full, qdf, k=3)
    )
    # at-least-once retry with the SAME append_id: piece overwrites
    # itself, manifest commit no-ops — stats and serving cannot move
    assert bm25_append(
        spark, inc, ddf.filter("doc_id >= 3"), append_id="j1"
    ) == st
    assert _rows(bm25_against_index(spark, inc, qdf, k=3)) == _rows(
        bm25_against_index(spark, full, qdf, k=3)
    )
    assert bm25_index_stats(spark, inc) == st
    # the VERDICT r15 item-7 contract: re-appending RESIDENT ids (here:
    # docs already folded in) trips the opt-in membership guard
    with _pytest.raises(ValueError, match="overlap the resident"):
        bm25_append(
            spark, inc, ddf.filter("doc_id = 1"),
            append_id="j2", check_overlap=True,
        )
    # disjoint ids pass the same guard
    extra = spark.createDataFrame(
        [(99, "fresh basil leaves")], "doc_id long, text string"
    )
    st2 = bm25_append(spark, inc, extra, append_id="j3", check_overlap=True)
    assert st2["n_docs"] == len(DOCS) + 1 and st2["n_pieces"] == 2


def test_bm25_zero_postings_corpus_builds_and_serves(spark, tmp_path):
    """ADVICE r15: an empty corpus — or one whose every doc tokenizes
    to NOTHING — must build a readable index (the zero-row partitioned
    write used to leave no parquet behind and the read-back crashed
    with UNABLE_TO_INFER_SCHEMA), serve empty results, count token-less
    docs toward N exactly as bm25_topk does, and survive the
    maintenance rebuild that used to crash every pass once a corpus
    emptied."""
    from rhq_metrics_spark.pipelines.retrieval import (
        bm25_against_index,
        bm25_index,
        bm25_rebuild,
    )

    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    empty = spark.createDataFrame([], "doc_id long, text string")
    p1 = str(tmp_path / "z1")
    st = bm25_index(empty, p1, n_buckets=8)
    assert st["n_docs"] == 0 and st["n_postings"] == 0 and st["sum_dl"] == 0
    out = bm25_against_index(spark, p1, qdf, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "doc_id", "score_fx", "rank"]
    blank = spark.createDataFrame(
        [(0, "   "), (1, "")], "doc_id long, text string"
    )
    p2 = str(tmp_path / "z2")
    st2 = bm25_index(blank, p2, n_buckets=8)
    assert st2["n_docs"] == 2 and st2["sum_dl"] == 0
    assert st2["n_postings"] == 0 and st2["n_terms"] == 0
    assert bm25_against_index(spark, p2, qdf, k=3).count() == 0
    # the ADVICE repro: a store whose corpus emptied re-builds fine
    assert bm25_rebuild(spark, p2, empty)["n_docs"] == 0


def test_bm25_delete_serves_as_rebuild_without_ids(spark, tmp_path):
    """VERDICT r15 item 2 — retraction: after bm25_delete the store
    serves BIT-IDENTICALLY to a from-scratch build without the deleted
    docs (N, Σdl, df, every score), including a token-less resident
    doc (dl 0) and deletes on a store with append pieces; a re-delete
    of the same id is a no-op; accumulated tombstone skew trips the
    refresh dial."""
    from rhq_metrics_spark.pipelines.retrieval import (
        bm25_against_index,
        bm25_append,
        bm25_delete,
        bm25_index,
        bm25_refresh_recommended,
    )

    docs = DOCS + [(5, "   ")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    p = str(tmp_path / "del")
    bm25_index(ddf, p, n_buckets=8)
    st = bm25_delete(spark, p, [3, 5])
    assert st["n_tombstones"] == 2 and st["n_docs"] == 4
    assert st["sum_dl"] == sum(
        len(t.split()) for i, t in docs if i not in (3, 5)
    )
    ref = str(tmp_path / "ref")
    bm25_index(ddf.filter("doc_id not in (3, 5)"), ref, n_buckets=8)
    served = _rows(bm25_against_index(spark, p, qdf, k=5))
    assert served == _rows(bm25_against_index(spark, ref, qdf, k=5))
    assert served == _rows(
        bm25_topk(ddf.filter("doc_id not in (3, 5)"), qdf, k=5)
    )
    # idempotent re-delete: stats cannot move (no double decrement)
    assert bm25_delete(spark, p, [3]) == st
    # delete composes with the piece model: append a doc, retract the
    # root's doc 0 — serving equals the rebuilt reference throughout
    extra = spark.createDataFrame(
        [(9, "spark engine of spark")], "doc_id long, text string"
    )
    bm25_append(spark, p, extra, append_id="d1")
    st3 = bm25_delete(spark, p, [0])
    assert st3["n_tombstones"] == 3 and st3["n_docs"] == 4
    remaining = ddf.filter("doc_id not in (0, 3, 5)").unionByName(extra)
    assert _rows(bm25_against_index(spark, p, qdf, k=5)) == _rows(
        bm25_topk(remaining, qdf, k=5)
    )
    # 3 tombstones over 7 resident rows = 42.9% > the 20% default dial
    assert st3["tombstone_ppm"] == 3 * 1_000_000 // 7
    assert bm25_refresh_recommended(st3, st3["n_docs"]) is True
    assert bm25_refresh_recommended(
        st3, st3["n_docs"], max_tombstone_ppm=500_000
    ) is False


def test_bm25_serve_scan_is_partition_pruned(spark, tmp_path):
    """The 100 TB contract of the index: the serve-side postings scan
    carries a PartitionFilters entry on the term bucket AND a pushed
    term filter — the scan reads the query's buckets, not the index."""
    from rhq_metrics_spark.pipelines.retrieval import (
        bm25_against_index,
        bm25_index,
    )

    ddf = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame([(0, "spark")], "query_id long, query string")
    path = str(tmp_path / "bm25p")
    bm25_index(ddf, path, n_buckets=8)
    out = bm25_against_index(spark, path, qdf, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "PartitionFilters: [tbucket" in plan.replace(
        "PartitionFilters: [isnotnull(tbucket", "PartitionFilters: [tbucket"
    ), plan
    assert "tbucket" in plan and "spark" in plan  # pushed term literal


def test_hybrid_served_stack_equals_direct_stack(spark):
    """VERDICT r15 item 1's pin: the standing-artifact hybrid stack
    (bm25_against_index + ivf_query_index full probe -> rrf_fuse)
    returns BIT-IDENTICALLY what the direct stack (bm25_topk +
    ivf_cosine_topk full probe -> rrf_fuse) returns — rrf_scores
    included — on the real sf0.001 tables, end-to-end through the
    registry callables."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    served = [
        tuple(r) for r in entry.q_hybrid_served_rrf(spark, sf).collect()
    ]
    direct = [
        tuple(r) for r in entry.q_hybrid_multiquery_rrf(spark, sf).collect()
    ]
    assert served == direct and len(served) > 0


def test_bm25_refresh_dial():
    from rhq_metrics_spark.pipelines.retrieval import (
        bm25_refresh_recommended,
    )

    st = {"n_docs": 1000, "sum_dl": 1, "n_buckets": 8}
    assert not bm25_refresh_recommended(st, 1000)
    assert not bm25_refresh_recommended(st, 1150)  # 15% < 20% default
    assert bm25_refresh_recommended(st, 1300)
    assert bm25_refresh_recommended(st, 700)  # deletes drift too
    assert not bm25_refresh_recommended(st, 1300, max_growth_ppm=500_000)
    assert bm25_refresh_recommended({"n_docs": 0}, 1)
    assert not bm25_refresh_recommended({"n_docs": 0}, 0)


def test_bm25_hit_build_has_no_corpus_shuffle(spark):
    """r15 plan guard for the VERDICT r14 item-4 claim: the pre-
    checkpoint hit build (the only corpus-sided subtree of bm25_topk)
    filters to the query terms via ONE broadcast join BEFORE its single
    hash-agg shuffle — no corpus-wide postings exchange, no sort-merge
    join, no corpus-sized lens join anywhere in the plan."""
    from rhq_metrics_spark.pipelines.retrieval import _build_hits, _toks

    ddf = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    toks = ddf.select(F.col("doc_id"), _toks(F.col("text")).alias("_t"))
    qterms = qdf.select(
        F.col("query_id"),
        F.explode(_toks(F.col("query"))).alias("term"),
    ).distinct()
    hits = _build_hits(toks, qterms)
    hits.collect()  # execute so AQE finalizes the plan
    plan = hits._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    shuffles = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    ) + plan.count("Exchange SinglePartition")
    # exactly two exchanges: the hit hash-agg (the only one carrying
    # doc rows — its partitioning includes doc_id) and the query-term
    # DISTINCT inside the broadcast subtree (|query terms|-sized)
    assert shuffles == 2, plan
    import re as _re

    doc_exchanges = [
        m for m in _re.findall(r"Exchange hashpartitioning\([^)]*\)", plan)
        if "doc_id" in m
    ]
    assert len(doc_exchanges) == 1, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "SortMergeJoin" not in plan, plan
    # the broadcast term filter sits BELOW the aggregate: the join
    # appears deeper in the plan tree than the final HashAggregate
    assert plan.index("BroadcastHashJoin") > plan.index("HashAggregate"), plan


def test_bm25_serve_local_metadata_matches_spark_path(spark, tmp_path, monkeypatch):
    """r16 opt pin: serve metadata (per-source stats, tombstones, dfreq
    df slices) resolves DRIVER-side via pyarrow on posix-local stores;
    forcing the Spark fallback (as a non-posix store would) must serve
    bit-identical rows — on a multi-piece store WITH tombstones
    resident (exercising the countDistinct df leg) and without."""
    import rhq_metrics_spark.pipelines.retrieval as R

    ddf = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    path = str(tmp_path / "bm25loc")
    R.bm25_index(ddf.filter("doc_id < 3"), path, n_buckets=8)
    R.bm25_append(spark, path, ddf.filter("doc_id >= 3"), append_id="p1")

    def _served():
        return _rows(R.bm25_against_index(spark, path, qdf, k=3))

    fast = _served()
    monkeypatch.setattr(R, "_local_component_rows", lambda *a, **k: None)
    monkeypatch.setattr(R, "_local_tombstone_rows", lambda *a, **k: None)
    slow = _served()
    assert fast == slow
    monkeypatch.undo()

    R.bm25_delete(spark, path, [0])
    fast_del = _served()
    monkeypatch.setattr(R, "_local_component_rows", lambda *a, **k: None)
    monkeypatch.setattr(R, "_local_tombstone_rows", lambda *a, **k: None)
    slow_del = _served()
    assert fast_del == slow_del
    assert fast_del != fast  # the delete is visible through both paths
