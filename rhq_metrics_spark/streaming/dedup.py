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
):
    """NEAR-dup streaming twin of ``pipelines/dedup.py``'s incremental
    index family: every micro-batch is deduped against the standing
    signature index at ``index_dir`` (``dedup_against_index``), the
    decisions land in ``out_dir``, and the batch's unique docs'
    signatures are APPENDED to the index — so the next micro-batch
    sees them.  ``foreachBatch`` rather than a stateful operator: the
    state here is the signature index itself, which must outlive the
    query, be shared with batch jobs, and scale past the state store
    (it IS the maintenance artifact, exactly like the streaming
    continuous-aggregate sinks).

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
    import os

    from rhq_metrics_spark.pipelines.dedup import (
        dedup_against_index,
        minhash_index,
    )

    spark = stream_df.sparkSession
    empty_index = minhash_index(
        spark.createDataFrame([], f"{id_col} long, {text_col} string"),
        id_col, text_col, n, num_hashes, bands,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not os.path.isdir(index_dir) or not any(
            f.endswith(".parquet") for f in os.listdir(index_dir)
        ):
            corpus = empty_index
        else:
            corpus = spark.read.parquet(index_dir)
        decisions = dedup_against_index(
            batch_df, corpus, id_col, text_col, n, num_hashes, bands,
            threshold, max_bucket_size,
        ).withColumn("_batch_id", F.lit(batch_id))
        decisions.persist()
        try:
            decisions.write.mode("append").parquet(out_dir)
            new_sigs = minhash_index(
                batch_df, id_col, text_col, n, num_hashes, bands
            ).join(
                F.broadcast(
                    decisions.filter(F.col("is_new")).select(id_col)
                ),
                id_col, "left_semi",
            )
            # append-only index growth: uniques only, same layout as
            # pipelines.dedup.index_append on a parquet index store
            new_sigs.write.mode("append").parquet(index_dir)
        finally:
            decisions.unpersist()

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
