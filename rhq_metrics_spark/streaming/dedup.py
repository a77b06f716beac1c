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
