"""Streaming maintenance of the standing BM25 inverted index — the
lexical sibling of :mod:`rhq_metrics_spark.streaming.dedup`'s
incremental near-dup loop: "the index IS the state".

A corpus landing stream (``sources/corpus.py`` or any documents-shaped
``readStream``) folds into a :func:`~rhq_metrics_spark.pipelines.
retrieval.bm25_index`-layout STORE via ``foreachBatch``; queries served
from the store see every committed batch and are BIT-IDENTICAL to
``bm25_topk`` over the concatenated corpus (pytest-pinned).

Idempotency under at-least-once replay (the ADVICE-r8 construction the
near-dup twin uses): each micro-batch writes its OWN ``batch-{id}/``
piece — a full mini bm25_index (postings partitioned by term bucket +
dfreq + ONE stats row) — with overwrite semantics, so a replayed batch
overwrites its own piece and converges; nothing ever mutates a shared
component.  Batch doc ids must be disjoint from the bootstrap and from
other batches (the ``ivf_append``/``bm25_append`` contract — and that
contract SURVIVES consolidation: a folded piece's ids stay resident,
see ``bm25_append``'s doc-id note).  Commit is two-layered: the
``stats/_SUCCESS`` marker (stats is the LAST component bm25_index
writes) makes the piece itself complete, and a CAS manifest commit
(``sources/manifest.py``) publishes it into the store's piece set —
readers resolve ONE manifest version, so piece-set changes are atomic
(r16, VERDICT r15 item 3; legacy stores without a manifest fall back
to the marker-gated directory listing, and the first manifest commit
migrates them in).

Query-time merge is exact because pieces hold DISJOINT documents: df
counts and corpus stats ADD, and postings just concatenate — the same
algebra ``bm25_append`` applies, evaluated lazily at read time.
Per-query cost stays postings-sized: every piece's postings read
prunes to the query's term buckets.  The piece count is the serving
dial — fold pieces down with :func:`bm25_consolidate` from the
maintenance loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rhq_metrics_spark.localrel import local_df

from rhq_metrics_spark.pipelines.retrieval import (
    _commit_pieces,
    _read_stats_multi,
    _resolve_sources,
    _source_paths,
    _strip_file_scheme,
    _union_all,
    _vacuum_pieces,
    bm25_against_index,
    bm25_index,
    bm25_index_stats,
)

__all__ = [
    "process_bm25_batch",
    "start_bm25_index_stream",
    "bm25_query_merged",
    "bm25_consolidate",
]


def _list_pieces(spark, index_dir: str, before_batch: int | None) -> list[str]:
    """Committed sources of a BM25 store as full paths (root first,
    when bootstrapped) — kept for the maintenance loop's piece-count
    dial; resolution itself lives in ``pipelines/retrieval.py``
    (:func:`_resolve_sources`): one manifest read on manifest-managed
    stores, the marker-gated Hadoop-FS listing on legacy ones."""
    return _source_paths(
        index_dir.rstrip("/"),
        _resolve_sources(spark, index_dir.rstrip("/"), before_batch),
    )


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
    ``mode("overwrite")``), so a replay overwrites its own piece, and
    the manifest commit that publishes it is a no-op when the piece is
    already listed.  An EMPTY batch writes nothing and a replay
    converges to the same no-op; a NON-empty batch whose docs all
    tokenize to nothing is NOT a poison batch (ADVICE r15) — the
    zero-postings guard in ``bm25_index`` writes a valid empty-postings
    piece whose stats still count the docs, exactly as ``bm25_topk``
    counts token-less docs toward N."""
    if batch_df.isEmpty():
        return
    base = index_dir.rstrip("/")
    piece = f"batch-{batch_id}"
    bm25_index(
        batch_df,
        f"{base}/{piece}",
        n_buckets=n_buckets,
        id_col=id_col,
        text_col=text_col,
    )
    _commit_pieces(spark, base, add=[piece])


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
    idempotent piece write + one CAS manifest commit."""

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
    """BM25 top-k served from a streaming index store — since r16 this
    IS ``bm25_against_index`` (the serve leg is store-aware: root +
    committed pieces + tombstones, one manifest resolution, per-source
    bucket-pruned reads, the shared exact scoring tail); the wrapper
    survives for the streaming API surface and the ``before_batch``
    replay knob."""
    return bm25_against_index(
        spark,
        index_dir.rstrip("/"),
        queries,
        k=k,
        k1_ppm=k1_ppm,
        b_ppm=b_ppm,
        query_id_col=query_id_col,
        query_col=query_col,
        before_batch=before_batch,
    )


def bm25_consolidate(spark, index_dir: str) -> dict:
    """Fold the committed pieces into ONE consolidated piece — the
    maintenance consequence of the streaming loop (piece count is the
    serving dial).  Disjoint doc sets make the merge pure addition:
    postings concatenate (re-partitioned by the shared term bucket),
    per-term dfs sum, stats sum.

    Atomicity (r16, VERDICT r15 item 3 — this replaces the documented
    double-count window): the fold NEVER rewrites the root.  It writes
    a fresh ``fold-<hex>`` piece (commit marker last), then ONE CAS
    manifest commit swaps the folded pieces out and the fold piece in
    — a reader that resolved the manifest before the commit keeps
    reading the old piece dirs (they are retained until no manifest
    version inside the retention window references them, then
    vacuumed), a reader after the commit sees only the fold: exactly
    one copy of every batch either way, with a live stream running.
    A replayed in-flight batch also stays safe: its piece dir is
    untouched and its ids are not in the fold.

    On a legacy store (no manifest) the first commit migrates the
    listing in, so every store converges to manifest-managed.  Returns
    piece/doc counts (``n_docs`` is the store-wide effective count).
    """
    import uuid

    base = index_dir.rstrip("/")
    sources = _resolve_sources(spark, base)
    folded = [s for s in sources if s]
    if not folded:
        return {"folded_pieces": 0}
    paths = _source_paths(base, folded)
    stats_all = _read_stats_multi(spark, paths)
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
    piece = f"fold-{uuid.uuid4().hex}"
    dest = f"{base}/{piece}"
    merged = _union_all(
        [
            spark.read.parquet(f"{p}/postings").select(
                "term", "doc_id", "tf", "dl", "tbucket"
            )
            for p in paths
        ]
    )
    merged.write.mode("overwrite").partitionBy("tbucket").parquet(
        f"{dest}/postings"
    )
    import os as _os

    wrote_rows = any(
        name.startswith("tbucket=")
        for name in _os.listdir(_strip_file_scheme(f"{dest}/postings"))
    )
    if not wrote_rows:
        # all folded pieces were token-less — keep the fold readable
        # (the bm25_index zero-postings discipline)
        merged.limit(0).write.mode("overwrite").parquet(f"{dest}/postings")
    dfreq = (
        _union_all(
            [
                spark.read.parquet(f"{p}/dfreq").select(
                    "term", "df", "tbucket"
                )
                for p in paths
            ]
        )
        .groupBy("term", "tbucket")
        .agg(F.sum("df").alias("df"))
    )
    if wrote_rows:
        dfreq.write.mode("overwrite").partitionBy("tbucket").parquet(
            f"{dest}/dfreq"
        )
    else:
        dfreq.limit(0).write.mode("overwrite").parquet(f"{dest}/dfreq")
    local_df(
        spark,
        [(int(n_total), int(s_total), n_buckets)],
        "n long, s long, n_buckets int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{dest}/stats")
    _commit_pieces(spark, base, add=[piece], remove=folded)
    vacuumed = _vacuum_pieces(base)
    return {
        "folded_pieces": len(folded),
        "fold_piece": piece,
        "vacuumed": vacuumed,
        "n_docs": bm25_index_stats(spark, base)["n_docs"],
    }
