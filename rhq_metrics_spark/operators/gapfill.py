"""Gap filling for bucketed series: LOCF and linear interpolation.

The read-side companion to A1's empty-bucket convention
(BucketPoint.java:70-83 emits empty buckets; this fills them): dashboards
want `locf()` / `interpolate()` semantics (TimescaleDB's names) instead
of nulls.  ``samples`` stays 0 on filled rows so consumers can still
tell real data from fill.

Engine-portable interpolation: inputs are the 4-dp-quantized stats, so
``round(v * scale)`` recovers EXACT integers; the lerp then runs in pure
integer arithmetic — ``pi + sign · ((2·|Δv·Δt| + q) div (2·q))`` is
half-away-from-zero rounding using only non-negative integer division
(truncate == floor, identical in Spark and DuckDB) — no double rounding
boundary for either engine to disagree on.

Plan shape: every fill column is a window over the same
(partition, order) spec — Catalyst plans ONE Exchange + sort feeding all
of them; no joins, no self-union.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def fill_gaps(
    df: DataFrame,
    value_cols: Sequence[str],
    method: str = "locf",
    order_col: str = "start",
    group_cols: Sequence[str] = (),
    scale: int = 10**4,
) -> DataFrame:
    """Fill empty buckets (null value columns) in a bucket-stats frame.

    ``method="locf"``: carry the last observed value forward (leading
    empties stay null).  ``method="linear"``: integer-exact linear
    interpolation between the surrounding observed buckets; leading /
    trailing empties fall back to the single available neighbor.
    """
    if method not in ("locf", "linear"):
        raise ValueError(f"method must be locf|linear, got {method!r}")
    group_cols = list(group_cols)
    base = Window.partitionBy(*group_cols).orderBy(F.col(order_col).asc())
    back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    out = df
    for c in value_cols:
        col = F.col(c)
        prev_v = F.last(col, ignorenulls=True).over(back)
        if method == "locf":
            out = out.withColumn(c, F.coalesce(col, prev_v))
            continue
        next_v = F.first(col, ignorenulls=True).over(fwd)
        t_marked = F.when(col.isNotNull(), F.col(order_col))
        # scaled-integer endpoints and deltas (exact longs)
        out = (
            out.withColumn("_gf_pv", prev_v)
            .withColumn("_gf_nv", next_v)
            .withColumn("_gf_pt", F.last(t_marked, ignorenulls=True).over(back))
            .withColumn("_gf_nt", F.first(t_marked, ignorenulls=True).over(fwd))
        )
        out = out.withColumn(
            "_gf_p",
            (
                F.round(F.col("_gf_nv") * scale).cast("long")
                - F.round(F.col("_gf_pv") * scale).cast("long")
            )
            * (F.col(order_col) - F.col("_gf_pt")),
        ).withColumn("_gf_q", F.col("_gf_nt") - F.col("_gf_pt"))
        lerp = (
            F.round(F.col("_gf_pv") * scale).cast("long")
            + F.when(F.col("_gf_p") < 0, -1).otherwise(1)
            * F.expr("(2 * abs(_gf_p) + _gf_q) div (2 * _gf_q)")
        ) / F.lit(float(scale))
        out = out.withColumn(
            c,
            F.when(col.isNotNull(), col)
            .when(F.col("_gf_pv").isNull(), F.col("_gf_nv"))
            .when(F.col("_gf_nv").isNull(), F.col("_gf_pv"))
            .otherwise(lerp),
        ).drop("_gf_pv", "_gf_nv", "_gf_pt", "_gf_nt", "_gf_p", "_gf_q")
    return out
