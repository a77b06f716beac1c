"""A7: distinct-adjacent — collapse runs of consecutive equal values.

Reference: ``distinct=true`` on availability/string reads
(MetricsServiceImpl.java:968-983,998-1007) uses RxJava
``distinctUntilChanged`` — this is run-length *head selection*, NOT a
set DISTINCT: keep a point iff its value differs from the previous
point of the same series.

Spark-first: a ``lag`` comparison over the per-series window — one
shuffle, no state.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def distinct_adjacent(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("tenant_id", "metric"),
) -> DataFrame:
    w = Window.partitionBy(*list(group_cols)).orderBy(F.col(ts_col).asc())
    prev = F.lag(F.col(value_col)).over(w)
    return df.withColumn("_prev", prev).filter(
        F.col("_prev").isNull() | (F.col(value_col) != F.col("_prev"))
    ).drop("_prev")
