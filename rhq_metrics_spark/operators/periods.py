"""W2: condition periods — maximal runs of points satisfying a predicate.

Reference: MetricsServiceImpl.getPeriods (MetricsServiceImpl.java:1026-1056)
with the threshold operators lt/lte/eq/neq/gt/gte from
GaugeHandler.java:735-757.  A period is ``[first_ts, last_ts]`` of a
maximal run of consecutive satisfying points (end = last *satisfying*
point's timestamp, not the next point).

Spark-first gaps-and-islands: flag each point, number runs with a
cumulative sum of flag-changes over a per-series window, then one
hash-agg per run.  Single shuffle by series key.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

_OPS = {
    "lt": lambda v, t: v < t,
    "lte": lambda v, t: v <= t,
    "eq": lambda v, t: v == t,
    "neq": lambda v, t: v != t,
    "gt": lambda v, t: v > t,
    "gte": lambda v, t: v >= t,
}


def predicate(op: str, threshold: float, value_col: str = "value") -> Column:
    """Build the reference's threshold predicate (GaugeHandler.java:735-757)."""
    if op not in _OPS:
        raise ValueError(f"unknown period op: {op!r}")
    return _OPS[op](F.col(value_col).cast("double"), F.lit(float(threshold)))


def periods(
    df: DataFrame,
    pred: Column,
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("tenant_id", "metric"),
) -> DataFrame:
    """Output: ``group_cols…, period_start, period_end`` per maximal run."""
    group_cols = list(group_cols)
    w = Window.partitionBy(*group_cols).orderBy(F.col(ts_col).asc())
    flagged = df.withColumn("_flag", pred.cast("int"))
    run = flagged.withColumn(
        "_run",
        F.sum(
            F.when(
                F.lag("_flag").over(w).isNull()
                | (F.col("_flag") != F.lag("_flag").over(w)),
                1,
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        run.filter(F.col("_flag") == 1)
        .groupBy(*group_cols, "_run")
        .agg(
            F.min(ts_col).alias("period_start"),
            F.max(ts_col).alias("period_end"),
        )
        .drop("_run")
        .orderBy(*group_cols, "period_start")
    )
