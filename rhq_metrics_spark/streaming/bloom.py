"""Streaming twin of pipelines/sketches.py bloom_build: maintain
per-slice Bloom-filter words as the stream arrives.

Words merge by ``bit_or`` (union of blooms == bloom of the union), so
the stream emits one finalized ``(slice, word_idx, bits)`` partial per
watermark-closed slice — exactly what a batch ``bloom_build`` over the
slice's rows produces (tested) — and any range's filter is the
per-slice words OR-ed.  State per key is one long; keys are bounded by
live-slices × n_bits/32, independent of throughput — the same
bounded-state contract as the CMS and HLL twins.  The rolled-up filter
keeps the no-false-negative guarantee for every value inserted in the
covered range (the probe side is the batch ``bloom_probe``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rhq_metrics_spark.pipelines.sketches import (
    BLOOM_BITS,
    BLOOM_HASHES,
    _BLOOM_WORD_BITS,
    _bloom_pos,
)

__all__ = ["streaming_bloom"]


def streaming_bloom(
    stream_df: DataFrame,
    value_col: str,
    slice_duration: str,
    event_time_col: str = "event_time",
    n_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
    salt: str = "bloom",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-(slice window, word) Bloom words, emitted once per finalized
    slice; positions are the batch operator's md5 bits, so a slice's
    words equal ``bloom_build`` over the slice's rows.  Output:
    ``(slice_start, slice_end, word_idx, bits)``."""
    if n_bits % _BLOOM_WORD_BITS:
        raise ValueError(f"n_bits must be a multiple of {_BLOOM_WORD_BITS}")
    pos = stream_df.select(
        F.col(event_time_col),
        F.explode(
            F.array(
                *[
                    _bloom_pos(F.col(value_col), j, n_bits, salt).alias("p")
                    for j in range(n_hashes)
                ]
            )
        ).alias("p"),
    ).select(
        event_time_col,
        (F.col("p") / _BLOOM_WORD_BITS).cast("long").alias("word_idx"),
        F.expr(f"cast(pow(2, p % {_BLOOM_WORD_BITS}) as bigint)").alias("_bit"),
    )
    return (
        pos.withWatermark(event_time_col, watermark_delay)
        .groupBy(
            F.window(event_time_col, slice_duration).alias("_w"),
            F.col("word_idx"),
        )
        .agg(F.expr("bit_or(_bit)").alias("bits"))
        .select(
            F.col("_w.start").alias("slice_start"),
            F.col("_w.end").alias("slice_end"),
            "word_idx",
            "bits",
        )
    )
