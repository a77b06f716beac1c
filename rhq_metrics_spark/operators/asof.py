"""As-of join: attach to each left row the most recent right row with
``right.ts <= left.ts`` for the same key (optionally within a tolerance).

The classic time-series alignment operator ("what was the sensor reading
when this order was placed?").  Spark has no native ASOF JOIN, and the
naive formulation — a range theta-join + per-left-row max — explodes into
a cartesian product per key.  This implementation uses the **union +
last-value window** strategy instead:

1. union the two inputs into one frame tagged with ``_side`` (right=0,
   left=1, so at equal timestamps the right row sorts first and is
   therefore visible — i.e. the match predicate is ``right.ts <=
   left.ts``, matching DuckDB/pandas ``merge_asof`` backward semantics);
2. one window ``partitionBy(key).orderBy(ts, _side)`` computes
   ``last(right_payload, ignorenulls=True)`` over the unbounded-preceding
   frame;
3. keep only left rows.

Cost at scale: ONE shuffle of |left| + |right| rows on the join key —
the same as any keyed join — and a per-partition sort; no range
explosion, no skewed build side.  The window state is a single struct
(the running "last right row"), so memory per key is O(1).  This is the
plan a 100 TB alignment wants: both sides co-partitioned once, then a
linear merge within each key.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    tolerance_ms: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join of ``right`` onto ``left``.

    Returns all ``left`` columns plus, for each of ``right_cols`` (default:
    every non-key, non-ts column of ``right``), a ``<col><suffix>`` column
    from the matched right row (same key), plus ``ts<suffix>`` (the matched
    right timestamp).  ``direction="backward"`` (default) matches the
    latest right row with ``right.ts <= left.ts``; ``"forward"`` matches
    the earliest right row with ``right.ts >= left.ts`` (same sorted-merge
    plan, reversed sort order).  Unmatched left rows keep nulls (left-join
    semantics).  ``tolerance_ms`` bounds the match distance
    (``left.ts - tolerance_ms`` backward, ``left.ts + tolerance_ms``
    forward).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*on, ts_col)]
    payload = F.struct(
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    r_part = right.select(
        *on,
        F.col(ts_col).alias("_asof_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_rpay"),
    )
    l_part = left.select(
        *left.columns,
        F.col(ts_col).alias("_asof_ts"),
        F.lit(1).alias("_side"),
    )
    unified = l_part.unionByName(r_part, allowMissingColumns=True)

    ts_order = (
        F.col("_asof_ts").asc() if direction == "backward" else F.col("_asof_ts").desc()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unified.withColumn(
        "_match", F.last("_rpay", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    if tolerance_ms is not None:
        mts = F.col(f"_match.{ts_col}{suffix}")
        in_range = (
            mts >= F.col("_asof_ts") - F.lit(tolerance_ms)
            if direction == "backward"
            else mts <= F.col("_asof_ts") + F.lit(tolerance_ms)
        )
        matched = matched.withColumn(
            "_match", F.when(in_range, F.col("_match"))
        )
    out_cols = [c for c in left.columns] + [
        F.col(f"_match.{ts_col}{suffix}").alias(f"{ts_col}{suffix}")
    ] + [F.col(f"_match.{c}{suffix}").alias(f"{c}{suffix}") for c in right_cols]
    return matched.select(*out_cols)
