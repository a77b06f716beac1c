"""Streaming twin of the incremental EXACTSUBSTR loop.

The batch pieces (``pipelines/text.py``: ``substring_index`` /
``substring_dups_against_index`` / ``substring_index_append``, the
inverted-index form of Lee et al. 2022's dedup criterion) compose into
a ``foreachBatch`` loop here, with the same committed-state /
replay-idempotency mechanics as ``streaming/dedup.py``: the standing
index is the cross-query state (it must outlive the stream, be shared
with batch jobs, and scale past the state store), each micro-batch's
``(h, n_docs)`` partial lands in its own ``batch-N`` directory gated by
``_SUCCESS``, and every effect is an overwrite keyed by ``batch_id`` so
an at-least-once replay converges instead of double-counting.

The window-count partials are ADDITIVE (the ``substring_index_append``
contract), which is what makes the per-batch-directory layout an index
at all: any reader merges directories by summing ``n_docs`` per hash.

100 TB shape per micro-batch: the batch's window fingerprints broadcast
against the standing index (map-side semi-join prune — the index is
never shuffled); only the matched hashes (bounded by the batch's
windows, not the index) re-aggregate before the per-doc scoring join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rhq_metrics_spark.localrel import local_df

from rhq_metrics_spark.streaming.dedup import _index_sources


def process_substr_batch(
    spark,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    min_docs: int = 2,
) -> None:
    """One micro-batch of the incremental EXACTSUBSTR loop — IDEMPOTENT
    under foreachBatch's at-least-once replay:

    - the index read excludes this batch's own (and any later)
      ``batch-N`` directory, so a replay never scores the batch against
      the window counts a failed earlier attempt already appended
      (which would mark every span a dup);
    - decisions overwrite their ``_batch_id`` partition (dynamic
      partition overwrite), never append;
    - the batch's ``(h, n_docs)`` partial overwrites ``batch-{id}``.

    Sequencing is inherent to foreachBatch (micro-batches run one at a
    time), so probe-then-append equals the sequential batch loop of
    ``substring_dups_against_index`` + ``substring_index_append`` —
    pinned by the stream-vs-batch equivalence test.
    """
    from rhq_metrics_spark.pipelines.text import (
        _window_hashes,
        substring_dups_against_index,
        substring_index,
    )

    srcs = _index_sources(spark, index_dir, batch_id)
    if srcs:
        raw = spark.read.option("recursiveFileLookup", "true").parquet(*srcs)
        batch_hashes = (
            _window_hashes(batch_df, id_col, text_col, window)
            .select("_h")
            .distinct()
        )
        # prune the standing index map-side by the batch's own
        # fingerprints (broadcast semi-join — the index never shuffles),
        # THEN merge the per-batch-directory partials additively; the
        # post-prune key set is bounded by the batch's windows.
        index = (
            raw.join(
                F.broadcast(batch_hashes),
                raw["h"] == F.col("_h"),
                "left_semi",
            )
            .groupBy("h")
            .agg(F.sum("n_docs").alias("n_docs"))
        )
    else:
        index = local_df(spark, [], "h string, n_docs long")
    decisions = substring_dups_against_index(
        batch_df, index, id_col, text_col, window, min_docs
    ).withColumn("_batch_id", F.lit(batch_id))
    decisions.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("_batch_id").parquet(out_dir)
    # index growth: this batch's additive (h, n_docs) partial — EVERY
    # batch doc is indexed (the substring_index_append contract; unlike
    # near-dup there is no uniques-only filter, occupancy is the point)
    substring_index(batch_df, id_col, text_col, window).write.mode(
        "overwrite"
    ).parquet(index_dir.rstrip("/") + f"/batch-{batch_id}")


def start_incremental_substr_stream(
    stream_df: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    min_docs: int = 2,
    trigger: dict | None = None,
):
    """EXACTSUBSTR streaming twin: every micro-batch is scored against
    the standing window-hash index (how much of each new doc already
    exists span-for-span in the corpus), decisions land in ``out_dir``,
    and the batch's window counts join the index as a per-batch
    directory — so the next micro-batch sees them."""
    spark = stream_df.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_substr_batch(
            spark, batch_df, batch_id, index_dir, out_dir,
            id_col, text_col, window, min_docs,
        )

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
