"""Streaming span-level decontamination for continuous document ingest.

The eval/benchmark side of decontamination is STATIC (benchmarks change
on release cadence, not per micro-batch), so the streaming twin of
``pipelines/text.decontaminate_spans`` is a stateless per-batch map:
the eval window-hash set is computed ONCE at stream start (and
broadcast into every micro-batch's plan), each arriving batch is
scrubbed against it, and cleaned documents land partitioned by
``_batch_id`` with dynamic partition overwrite — the same idempotent
replay contract as ``streaming/dedup.py`` (a re-run batch overwrites
its own partition; no duplicate or contradictory rows under
at-least-once foreachBatch).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def start_decontaminate_stream(
    stream_df: DataFrame,
    eval_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    trigger: dict | None = None,
):
    """Scrub every micro-batch of ``stream_df`` against the (static)
    ``eval_df`` with :func:`pipelines.text.decontaminate_spans` and
    append cleaned rows to ``out_dir``.

    The eval frame is persisted up front: its DISTINCT window-hash set
    participates in every micro-batch's broadcast join, and without the
    persist each trigger would re-tokenize the whole eval corpus."""
    from rhq_metrics_spark.pipelines.text import decontaminate_spans

    eval_df = eval_df.persist()
    eval_df.count()

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        out = decontaminate_spans(
            batch_df, eval_df, id_col, text_col, window
        ).withColumn("_batch_id", F.lit(batch_id))
        out.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("_batch_id").parquet(out_dir)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
