"""Streaming deduplication for continuous document ingest.

Training-data pipelines rarely ingest a frozen corpus: crawlers deliver
a stream, and exact dedup has to happen before anything lands.  This is
the streaming twin of ``pipelines/dedup.py:exact_dedup``, built on
Spark's native streaming dedup state:

- ``streaming_exact_dedup`` — keep the FIRST document seen per content
  fingerprint (md5 of whitespace/case-normalized text; same fingerprint
  as the batch operator, so batch and stream agree on what's a dup).
  With an event-time column + delay, ``dropDuplicatesWithinWatermark``
  bounds the state store to the watermark horizon — at 100 TB/day the
  state holds a window of fingerprints, not history.  Without
  event time, ``dropDuplicates`` keeps all fingerprints (exact global
  dedup; state grows with distinct-content count — viable when the
  fingerprint set fits the state store, e.g. keyed by RocksDB state
  backend on a real cluster).

The fingerprint is a narrow 32-hex-char key: the shuffle and the state
store never carry document bodies — only the winning rows flow through.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rhq_metrics_spark.localrel import local_df


def content_fingerprint(text_col: str = "text") -> F.Column:
    """md5 of normalized text — identical to the batch ``exact_dedup``
    fingerprint (``pipelines/dedup.py:_norm_text``)."""
    return F.md5(
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    )


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    within: str = "1 hour",
) -> DataFrame:
    """First-seen-wins exact dedup over a document stream.

    ``event_time_col`` + ``within``: late-duplicate horizon — duplicates
    arriving within ``within`` of each other are dropped and the state
    store is pruned past the watermark (bounded memory, the scale path).
    Without an event-time column the dedup is global and state grows
    with distinct content.
    """
    fp = stream_df.withColumn("_fp", content_fingerprint(text_col))
    if event_time_col is not None:
        out = fp.withWatermark(event_time_col, within).dropDuplicatesWithinWatermark(
            ["_fp"]
        )
    else:
        out = fp.dropDuplicates(["_fp"])
    return out.drop("_fp")


def _index_sources(spark, index_dir: str, before_batch: int) -> list[str]:
    """Readable pieces of the standing index: root-level parquet files
    (a batch-built bootstrap index) plus ``batch-N`` subdirectories with
    ``N < before_batch`` — EXCLUDING the current (and any later) batch's
    own directory, so an at-least-once REPLAY never matches the batch
    against the signatures a failed earlier attempt already appended
    (est_jaccard=1.0 self-matches; ADVICE r8).  Listed via the Hadoop
    FileSystem API, not os.listdir: the index store is a path in
    whatever filesystem Spark is configured for (HDFS/S3/local) — a
    driver-local listdir would silently read a remote index as empty
    and declare every document new (ADVICE r8)."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(index_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        if st.isDirectory():
            if name.startswith("batch-"):
                try:
                    bid = int(name.split("-", 1)[1])
                except ValueError:
                    bid = -1
                if bid >= before_batch:
                    continue
                # only COMMITTED batch dirs: a reader racing the writer
                # (an external analyst, or a replay whose earlier
                # attempt died mid-write of an OLDER dir) must skip a
                # half-written directory rather than fail on schema
                # inference or read partial signatures
                if not fs.exists(
                    jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
                ):
                    continue
            out.append(str(st.getPath()))
        elif name.endswith(".parquet"):
            out.append(str(st.getPath()))
    return out


def process_incremental_batch(
    spark,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 6,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    verify: str | None = None,
    kmv_k: int = 128,
) -> None:
    """One micro-batch of the incremental near-dup loop — IDEMPOTENT
    under Structured Streaming's at-least-once foreachBatch replay
    (ADVICE r8): every effect is an overwrite keyed by ``batch_id``,
    and the corpus read excludes this batch's own index directory, so
    re-running any prefix of the steps converges to the same state.

    - decisions land in ``out_dir`` partitioned by ``_batch_id`` with
      dynamic partition overwrite (a replay replaces its own partition
      instead of appending contradictory duplicate rows)
    - the batch's unique signatures overwrite ``index_dir/batch-{id}``
      (a per-batch directory, not a root append — the recursive read
      and :func:`_index_sources` treat it as one index)

    ``verify='kmv'`` carries the batch operator's sketch re-score leg
    (``dedup_against_index(verify='kmv')``) into the stream: decisions
    are made on the k-bottom KMV Jaccard instead of the coarse 12-hash
    estimate, and the appended per-batch index directories carry the
    ``_kmv`` column so later batches verify against THIS batch's docs
    too.  Requires the bootstrap index (if any) to be built with
    ``minhash_index(..., kmv_k=...)``.
    """
    from rhq_metrics_spark.pipelines.dedup import (
        dedup_against_index,
        minhash_index,
    )

    srcs = _index_sources(spark, index_dir, batch_id)
    if srcs:
        corpus = spark.read.option(
            "recursiveFileLookup", "true"
        ).parquet(*srcs)
    else:
        corpus = minhash_index(
            local_df(spark, [], f"{id_col} long, {text_col} string"),
            id_col, text_col, n, num_hashes, bands,
            kmv_k=kmv_k if verify == "kmv" else None,
        )
    decisions = dedup_against_index(
        batch_df, corpus, id_col, text_col, n, num_hashes, bands,
        threshold, max_bucket_size, verify=verify, kmv_k=kmv_k,
    ).withColumn("_batch_id", F.lit(batch_id))
    decisions.persist()
    try:
        decisions.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("_batch_id").parquet(out_dir)
        new_sigs = minhash_index(
            batch_df, id_col, text_col, n, num_hashes, bands,
            kmv_k=kmv_k if verify == "kmv" else None,
        ).join(
            F.broadcast(
                decisions.filter(F.col("is_new")).select(id_col)
            ),
            id_col, "left_semi",
        )
        # per-batch index growth: uniques only, same row layout as
        # pipelines.dedup.index_append on a parquet index store
        new_sigs.write.mode("overwrite").parquet(
            index_dir.rstrip("/") + f"/batch-{batch_id}"
        )
    finally:
        decisions.unpersist()


def start_incremental_neardup_stream(
    stream_df: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 6,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    trigger: dict | None = None,
    verify: str | None = None,
    kmv_k: int = 128,
):
    """NEAR-dup streaming twin of ``pipelines/dedup.py``'s incremental
    index family: every micro-batch is deduped against the standing
    signature index at ``index_dir`` (``dedup_against_index``), the
    decisions land in ``out_dir``, and the batch's unique docs'
    signatures are appended to the index as a per-batch directory — so
    the next micro-batch sees them.  ``foreachBatch`` rather than a
    stateful operator: the state here is the signature index itself,
    which must outlive the query, be shared with batch jobs, and scale
    past the state store (it IS the maintenance artifact, exactly like
    the streaming continuous-aggregate sinks).  Each micro-batch runs
    through :func:`process_incremental_batch`, which is idempotent
    under replay — see its docstring for the crash-point analysis.

    Sequencing is inherent to the pattern: micro-batches run one at a
    time, so append-then-next-batch gives the same first-seen-wins
    result as a sequential batch loop (pinned by the stream-vs-batch
    equivalence test).  Within a micro-batch, docs are deduped against
    the index only — intra-batch near-dups are the follow-on
    ``minhash_lsh_pairs``/``dup_clusters`` step, same contract as the
    batch operator.

    ``max_bucket_size=None`` by default: per-batch hot-bucket pricing
    would re-aggregate the index every trigger; deployments pass the
    precomputed ``index_bucket_stats`` artifact through a wrapper when
    boilerplate corpora make the cap matter."""
    spark = stream_df.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_incremental_batch(
            spark, batch_df, batch_id, index_dir, out_dir,
            id_col, text_col, n, num_hashes, bands,
            threshold, max_bucket_size, verify, kmv_k,
        )

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def process_fuzzy_batch(
    spark,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
    prefix_len: int = 48,
    min_sim: float = 0.5,
    max_block: int | None = None,
) -> None:
    """One micro-batch of the incremental FUZZY-ER loop (the
    edit-distance sibling of :func:`process_incremental_batch`) —
    idempotent under at-least-once replay by the same construction:
    matches land in ``out_dir`` partitioned by ``_batch_id`` with
    dynamic overwrite, the batch's blocked prefixes overwrite
    ``index_dir/batch-{id}``, and the index read EXCLUDES this and
    later batches so a replay never self-matches."""
    from rhq_metrics_spark.pipelines.dedup import (
        DEFAULT_MAX_BUCKET_SIZE,
        fuzzy_against_index,
        fuzzy_index,
    )

    batch_ix = fuzzy_index(
        batch_df, text_col, id_col, block_cols, prefix_len
    ).persist()
    srcs = _index_sources(spark, index_dir, batch_id)
    if srcs:
        corpus_ix = spark.read.option("recursiveFileLookup", "true").parquet(
            *srcs
        )
        pairs = fuzzy_against_index(
            corpus_ix,
            batch_ix,
            min_sim=min_sim,
            max_block=(
                max_block if max_block is not None else DEFAULT_MAX_BUCKET_SIZE
            ),
            include_batch_internal=True,
        )
    else:  # first batch: only batch-internal pairs exist
        from rhq_metrics_spark.pipelines.dedup import fuzzy_blocked_pairs

        pairs = fuzzy_blocked_pairs(
            batch_df, text_col, id_col, block_cols, prefix_len, min_sim,
            max_block if max_block is not None else DEFAULT_MAX_BUCKET_SIZE,
        ).select(
            F.col("id_a").alias("id_new"),
            F.col("id_b").alias("id_old"),
            "lev",
            "sim_r",
        )
    try:
        pairs.withColumn("_batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "_batch_id"
        ).parquet(out_dir)
        batch_ix.write.mode("overwrite").parquet(
            index_dir.rstrip("/") + f"/batch-{batch_id}"
        )
    finally:
        batch_ix.unpersist()


def start_incremental_fuzzy_stream(
    stream_df: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
    prefix_len: int = 48,
    min_sim: float = 0.5,
    max_block: int | None = None,
    trigger: dict | None = None,
):
    """Streaming twin of the incremental fuzzy-ER family: every
    micro-batch is edit-distance-matched against the standing
    ``fuzzy_index`` at ``index_dir``, matches land in ``out_dir``, and
    the batch's blocked prefixes append as a per-batch directory so the
    next micro-batch sees them.  ``foreachBatch`` for the same reason
    as the near-dup twin: the index IS the state, shared with batch
    jobs and unbounded by the state store.  Batch-internal pairs are
    emitted too, so the cumulative output over any prefix of batches
    equals one :func:`fuzzy_blocked_pairs` over everything seen
    (equivalence-tested)."""
    spark = stream_df.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_fuzzy_batch(
            spark, batch_df, batch_id, index_dir, out_dir,
            id_col, text_col, block_cols, prefix_len, min_sim, max_block,
        )

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
