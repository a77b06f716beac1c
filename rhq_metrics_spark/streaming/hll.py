"""Streaming twin of pipelines/sketches.py hll_registers: maintain
per-slice HyperLogLog register tables as the stream arrives.

Registers merge by MAX (the HLL mergeability contract), so the stream
emits one finalized ``(slice, group, reg, rho)`` partial per
watermark-closed slice — exactly what a batch ``hll_registers`` over
the slice's rows produces (tested), and any range's sketch is the
per-slice registers max-merged then ``hll_estimate``-finalized.  State
per key is one int; keys are bounded by live-slices × groups × m
(64 per group at the default), independent of throughput — the same
bounded-state contract as the CMS twin.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rhq_metrics_spark.pipelines.sketches import HLL_M, _HLL_ALPHA, _hll_rho

__all__ = ["streaming_hll_registers"]


def streaming_hll_registers(
    stream_df: DataFrame,
    group_col: str,
    value_col: str,
    slice_duration: str,
    event_time_col: str = "event_time",
    m: int = HLL_M,
    salt: str = "hll",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-(slice window, group, register) max-rho rows, emitted once
    per finalized slice; hashing is the batch operator's md5 bits, so a
    slice's registers equal ``hll_registers`` over the slice's rows.
    Output: ``(slice_start, slice_end, <group_col>, reg, rho)``."""
    if m not in _HLL_ALPHA:
        raise ValueError(f"m must be one of {sorted(_HLL_ALPHA)}; got {m}")
    reg = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{salt}:r:"), F.col(value_col).cast("string")
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % m
    ).cast("int")
    rows = stream_df.select(
        F.col(event_time_col),
        F.col(group_col),
        reg.alias("reg"),
        _hll_rho(F.col(value_col), salt).alias("_rho"),
    )
    return (
        rows.withWatermark(event_time_col, watermark_delay)
        .groupBy(
            F.window(event_time_col, slice_duration).alias("_w"),
            F.col(group_col),
            F.col("reg"),
        )
        .agg(F.max("_rho").alias("rho"))
        .select(
            F.col("_w.start").alias("slice_start"),
            F.col("_w.end").alias("slice_end"),
            group_col,
            "reg",
            "rho",
        )
    )
