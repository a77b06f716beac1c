"""Streaming maintenance of the standing BM25 inverted index — the
lexical sibling of :mod:`rhq_metrics_spark.streaming.dedup`'s
incremental near-dup loop: "the index IS the state".

A corpus landing stream (``sources/corpus.py`` or any documents-shaped
``readStream``) folds into a :func:`~rhq_metrics_spark.pipelines.
retrieval.bm25_index`-layout store via ``foreachBatch``; queries served
from the store see every committed batch and are BIT-IDENTICAL to
``bm25_topk`` over the concatenated corpus (pytest-pinned).

Idempotency under at-least-once replay (the ADVICE-r8 construction the
near-dup twin uses): each micro-batch writes its OWN ``batch-{id}/``
piece — a full mini bm25_index (postings partitioned by term bucket +
dfreq + ONE stats row) — with overwrite semantics, so a replayed batch
overwrites its own piece and converges; nothing ever mutates a shared
component (contrast ``bm25_append``, whose df/stats merge is exactly
once — right for driver-controlled increments, wrong under replay).
Batch doc ids must be disjoint from the bootstrap and from other
batches (the ``ivf_append``/``bm25_append`` contract); commit is the
``stats/_SUCCESS`` marker (stats is the LAST component bm25_index
writes), so a reader never counts a half-written piece.

Query-time merge is exact because pieces hold DISJOINT documents: df
counts and corpus stats ADD, and postings just concatenate — the same
algebra ``bm25_append`` applies at write time, applied lazily at read
time.  Per-query cost stays postings-sized: every piece's postings
read prunes to the query's term buckets.  The piece count is the
serving dial — fold pieces back into the root with
:func:`bm25_consolidate` from the maintenance loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rhq_metrics_spark.pipelines.retrieval import (
    PPM,
    _score_hits,
    _term_buckets,
    _toks,
    bm25_index,
)

__all__ = [
    "process_bm25_batch",
    "start_bm25_index_stream",
    "bm25_query_merged",
    "bm25_consolidate",
]


def _list_pieces(spark, index_dir: str, before_batch: int | None) -> list[str]:
    """Committed pieces of a streaming BM25 index store: the root index
    (if bootstrapped) plus ``batch-N`` dirs with ``N < before_batch``
    whose ``stats/_SUCCESS`` commit marker exists.  Hadoop FileSystem
    listing, not os.listdir — the store is a path in whatever
    filesystem Spark is configured for (the near-dup twin's ADVICE-r8
    lesson)."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(index_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []
    out = []
    root_stats = jvm.org.apache.hadoop.fs.Path(root, "stats")
    if fs.exists(root_stats):
        out.append(str(root))
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("batch-")):
            continue
        try:
            bid = int(name.split("-", 1)[1])
        except ValueError:
            continue
        if before_batch is not None and bid >= before_batch:
            continue
        marker = jvm.org.apache.hadoop.fs.Path(
            st.getPath(), "stats/_SUCCESS"
        )
        if fs.exists(marker):
            out.append(str(st.getPath()))
    return out


def process_bm25_batch(
    spark,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One micro-batch of the streaming index loop — IDEMPOTENT under
    at-least-once ``foreachBatch`` replay: the batch's documents build
    a complete mini-index at ``{index_dir}/batch-{batch_id}`` with
    overwrite semantics (``bm25_index`` writes every component
    ``mode("overwrite")``), so a replay overwrites its own piece and
    nothing else.  An EMPTY batch writes nothing (a zero-row
    partitioned write leaves no readable parquet behind): no piece, no
    commit marker, and a replay converges to the same no-op."""
    if batch_df.isEmpty():
        return
    bm25_index(
        batch_df,
        index_dir.rstrip("/") + f"/batch-{batch_id}",
        n_buckets=n_buckets,
        id_col=id_col,
        text_col=text_col,
    )


def start_bm25_index_stream(
    spark,
    source_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_once: bool = False,
):
    """Fold a streaming documents source into a BM25 index store.
    ``foreachBatch`` rather than a stateful operator: the state is the
    persisted index itself (unbounded corpus-sized — exactly what must
    NOT live in stream state), and each batch's effect is one
    idempotent piece write."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_bm25_batch(
            spark, batch_df, batch_id, index_dir,
            n_buckets=n_buckets, id_col=id_col, text_col=text_col,
        )

    writer = source_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bm25_query_merged(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    k1_ppm: int = 1_200_000,
    b_ppm: int = 750_000,
    query_id_col: str = "query_id",
    query_col: str = "query",
    before_batch: int | None = None,
) -> DataFrame:
    """BM25 top-k served from a streaming index store: the committed
    pieces' postings/dfreq/stats merge lazily (disjoint doc sets ⇒ df
    and stats ADD, postings concatenate), then the exact bm25_topk
    arithmetic — output is BIT-IDENTICAL to ``bm25_topk`` over the
    concatenated corpus.  Every piece's postings read prunes to the
    query's term buckets, so per-query cost is (postings of the query
    terms) × 1, spread over #pieces directory reads — consolidate
    pieces (:func:`bm25_consolidate`) when the piece count, not the
    postings, starts to dominate."""
    if k < 1:
        raise ValueError(f"bm25_query_merged: k must be >= 1: {k}")
    pieces = _list_pieces(spark, index_dir, before_batch)
    if not pieces:
        return spark.createDataFrame(
            [], "query_id long, doc_id long, score_fx long, rank int"
        )
    c_sat = k1_ppm * (PPM - b_ppm) // PPM
    c_len = k1_ppm * b_ppm // PPM
    c_num = PPM + k1_ppm

    stats_all = spark.read.parquet(*[f"{p}/stats" for p in pieces])
    n_buckets_set = {
        int(r["n_buckets"]) for r in stats_all.select("n_buckets").collect()
    }
    if len(n_buckets_set) != 1:
        raise ValueError(
            f"bm25_query_merged: pieces disagree on n_buckets: "
            f"{sorted(n_buckets_set)} — rebuild with one fan-out"
        )
    n_buckets = n_buckets_set.pop()
    n_total, s_total = stats_all.agg(
        F.coalesce(F.sum("n"), F.lit(0)), F.coalesce(F.sum("s"), F.lit(0))
    ).first()
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(_toks(F.col(query_col))).alias("term"),
    ).distinct()
    lookup = _term_buckets(qterms.select("term").distinct(), n_buckets).collect()
    terms = sorted({r["term"] for r in lookup})
    buckets = sorted({r["tbucket"] for r in lookup})
    if not terms:
        return spark.createDataFrame(
            [], "query_id long, doc_id long, score_fx long, rank int"
        )
    # per-piece reads unioned (NOT one multi-root read: partition
    # discovery needs a single basePath per root, and per-piece reads
    # keep the tbucket partition prune on every piece)
    def _union(frames):
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    hit = _union(
        [
            spark.read.parquet(f"{p}/postings")
            .filter(F.col("tbucket").isin(buckets))
            .filter(F.col("term").isin(terms))
            .select("term", "doc_id", "tf", F.col("dl").alias("_dl"))
            for p in pieces
        ]
    )
    # no dfreq read: pieces hold DISJOINT docs, so the merged hit table
    # has one row per (term, doc) and the shared tail's countDistinct
    # yields exactly the summed per-piece dfs
    return _score_hits(
        hit, qterms, int(n_total), int(s_total), k, c_sat, c_len, c_num
    )


def bm25_consolidate(spark, index_dir: str) -> dict:
    """Fold the committed ``batch-N`` pieces into the root index — the
    maintenance consequence of the streaming loop (piece count is the
    serving dial).  Disjoint doc sets make the merge pure addition:
    postings concatenate (re-partitioned by the shared term bucket),
    per-term dfs sum, stats sum; the merged root publishes via the
    staging + two-rename swap (the ``bm25_rebuild``/``ivf_rebuild``
    committed-dir pattern) and the folded piece dirs are removed LAST.

    Race caveat (documented, like ``_swap_in``): a query that listed
    pieces before the swap and reads after it can transiently count a
    folded batch twice (new root + its not-yet-removed piece dir) —
    run from the maintenance loop, ideally at a stream-quiet point; a
    replayed in-flight batch is safe (its piece dir survives, its doc
    ids are not in the folded root).  Returns piece/doc counts."""
    import os
    import shutil
    import uuid

    pieces = _list_pieces(spark, index_dir, before_batch=None)
    batch_pieces = [p for p in pieces if "/batch-" in p.replace("\\", "/")]
    if not batch_pieces:
        return {"folded_pieces": 0}
    stats_all = spark.read.parquet(*[f"{p}/stats" for p in pieces])
    n_buckets_set = {
        int(r["n_buckets"]) for r in stats_all.select("n_buckets").collect()
    }
    if len(n_buckets_set) != 1:
        raise ValueError(
            f"bm25_consolidate: pieces disagree on n_buckets: "
            f"{sorted(n_buckets_set)}"
        )
    n_buckets = n_buckets_set.pop()
    n_total, s_total = stats_all.agg(F.sum("n"), F.sum("s")).first()
    staging = f"{index_dir}/_consolidate-{uuid.uuid4().hex}"
    def _union(frames):
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    (
        _union(
            [
                spark.read.parquet(f"{p}/postings").select(
                    "term", "doc_id", "tf", "dl", "tbucket"
                )
                for p in pieces
            ]
        )
        .write.mode("overwrite")
        .partitionBy("tbucket")
        .parquet(f"{staging}/postings")
    )
    (
        _union(
            [
                spark.read.parquet(f"{p}/dfreq").select("term", "df", "tbucket")
                for p in pieces
            ]
        )
        .groupBy("term", "tbucket")
        .agg(F.sum("df").alias("df"))
        .write.mode("overwrite")
        .partitionBy("tbucket")
        .parquet(f"{staging}/dfreq")
    )
    spark.createDataFrame(
        [(int(n_total), int(s_total), n_buckets)],
        "n long, s long, n_buckets int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{staging}/stats")
    for comp in ("postings", "dfreq", "stats"):
        live = os.path.join(index_dir, comp)
        trash = os.path.join(index_dir, f"_trash-{uuid.uuid4().hex}")
        if os.path.exists(live):
            os.rename(live, trash)
        os.rename(os.path.join(staging, comp), live)
        shutil.rmtree(trash, ignore_errors=True)
        spark.catalog.refreshByPath(live)
    shutil.rmtree(staging, ignore_errors=True)
    for p in batch_pieces:
        shutil.rmtree(p.replace("file:", ""), ignore_errors=True)
    return {
        "folded_pieces": len(batch_pieces),
        "n_docs": int(n_total),
        "sum_dl": int(s_total),
    }
