"""Interval (point-in-range) join: match points ``(key, ts)`` to
intervals ``(key, start, end)`` with ``start <= ts < end``.

The reference expresses this shape as client-side filtering over raw
reads (e.g. matching availability points into condition periods,
MetricsServiceImpl.java's period post-processing); Spark has no native
range-join operator, and the naive formulation

    points JOIN intervals ON key AND ts >= start AND ts < end

equi-joins on ``key`` alone, then filters — each key's full |points| x
|intervals| cross product materializes in the join, a scale-killer when
one key carries millions of rows.

Scale path (the standard bucketed range join, cf. Databricks' range
join hint): quantize time into fixed ``bucket_ms`` buckets; each point
falls in exactly ONE bucket, each interval explodes into the buckets it
overlaps, and the join becomes an equi-join on ``(key, bucket)`` plus
the exact residual predicate.  Each matching pair is produced exactly
once (via the point's unique bucket), so no post-dedup.  Shuffle keys
gain time locality — a key's timeline spreads over many buckets, which
also absorbs per-key skew.  Cost: intervals replicate by
``ceil(span / bucket_ms)``; pick ``bucket_ms`` near the typical
interval span so replication stays O(1).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    bucket_ms: int,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    how: str = "inner",
    max_span_buckets: int = 100_000,
) -> DataFrame:
    """Join each point to every interval of the same key that contains
    it (``start <= ts < end``, half-open like TimeRange).

    ``how='inner'`` keeps matched points; ``'left'`` keeps unmatched
    points with null interval columns (both sides of the bucket join
    stay equi-joined — Catalyst still gets a hash join).

    Non-key column names must not collide between ``points`` and
    ``intervals`` (the output carries both sides' columns unprefixed).
    """
    overlap = (set(points.columns) & set(intervals.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"points and intervals share non-key columns {sorted(overlap)}; "
            "rename one side before joining"
        )
    on = list(on)
    if bucket_ms <= 0:
        raise ValueError("bucket_ms must be positive")

    pt = points.withColumn("_b", (F.col(ts_col) / bucket_ms).cast("long"))
    first_b = (F.col(start_col) / bucket_ms).cast("long")
    # end is exclusive: an interval touching a bucket boundary does not
    # extend into the next bucket.
    last_b = ((F.col(end_col) - 1) / bucket_ms).cast("long")
    # scale guard: one open-ended/garbage interval (end = +inf sentinel)
    # would explode into span/bucket_ms rows and OOM an executor long
    # before any join runs.  Fail loudly at execution instead — callers
    # with genuinely huge intervals should pick a coarser bucket_ms.
    span_ok = F.assert_true(
        (last_b - first_b) < F.lit(int(max_span_buckets)),
        F.concat(
            F.lit(
                f"interval_join: interval spans more than {max_span_buckets}"
                " buckets (start="
            ),
            F.col(start_col).cast("string"),
            F.lit(", end="),
            F.col(end_col).cast("string"),
            F.lit(f", bucket_ms={bucket_ms}); raise bucket_ms"),
        ),
    )
    # fold the assertion into the sequence bound (assert_true yields
    # NULL on success → +0) so column pruning can't eliminate it
    guarded_last = last_b + F.coalesce(span_ok.cast("long"), F.lit(0))
    iv = intervals.withColumn("_b", F.explode(F.sequence(first_b, guarded_last)))

    cond = [pt["_b"] == iv["_b"]] + [pt[c] == iv[c] for c in on]
    residual = (pt[ts_col] >= iv[start_col]) & (pt[ts_col] < iv[end_col])

    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    # One pass for both modes: each point carries exactly ONE bucket row,
    # so a left outer join on cond+residual emits every matched pair once
    # and every unmatched point exactly once with null interval columns —
    # no second anti-join pass over the exploded side (ADVICE r3).
    joined = pt.join(iv, cond + [residual], how)
    keep = [pt[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in on
    ]
    return joined.select(*keep)
