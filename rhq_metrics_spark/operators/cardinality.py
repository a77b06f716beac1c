"""Distinct-entity cardinality over time: exact rollup and mergeable
HLL-sketch partials.

The reference has no cardinality surface (its closest is the metric-
definition index scan, SURVEY.md §2.1 S7); at 100 TB "how many distinct
users/series per metric per day" is a first-class query, and the thing
that makes it serveable is MERGEABILITY: per-slice partials computed
once at ingest/compaction time that any coarser grain can be answered
from without re-scanning raw points.

Two paths:

- :func:`distinct_rollup` — exact ``count(DISTINCT entity)`` per
  (group, grain-bucket) plus a per-group total in ONE aggregation via
  GROUPING SETS.  Catalyst plans distinct aggregation as Expand +
  two-phase hash agg (map-side partial dedup absorbs the raw volume);
  this is the oracle-able path and the right default below ~1e9
  distinct keys per group.
- :func:`hll_sketch_rollup` / :func:`distinct_from_sketches` — the
  scale path: Apache DataSketches HLL partials per fine slice
  (``hll_sketch_agg``, a binary column you can PERSIST alongside the
  b1/b11 continuous aggregates), merged to any coarser grain with
  ``hll_union_agg`` — a query touches #slices sketch rows, never the
  raw points.  Estimates carry ~1.6%/sqrt(2^lgk) relative error;
  tested against the exact path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["distinct_rollup", "hll_sketch_rollup", "distinct_from_sketches"]


def distinct_rollup(
    points: DataFrame,
    grain_ms: int,
    group_col: str = "metric",
    ts_col: str = "ts",
    entity_col: str = "user_id",
) -> DataFrame:
    """Exact distinct-``entity_col`` counts per (group, grain bucket)
    AND per group overall, in one GROUPING SETS aggregation.

    Output: ``(metric, grain, bucket_start, n_distinct)`` with grain in
    ('bucket', 'total'); bucket_start is null for 'total' rows.
    """
    b = (F.floor(F.col(ts_col) / grain_ms) * grain_ms).alias("_b")
    base = points.select(F.col(group_col).alias("_g"), b, F.col(entity_col).alias("_e"))
    agg = base.groupingSets(
        [["_g", "_b"], ["_g"]],
        "_g",
        "_b",
    ).agg(F.count_distinct("_e").alias("n_distinct"))
    return agg.select(
        F.col("_g").alias(group_col),
        F.when(F.col("_b").isNotNull(), F.lit("bucket"))
        .otherwise(F.lit("total"))
        .alias("grain"),
        F.col("_b").alias("bucket_start"),
        "n_distinct",
    )


def hll_sketch_rollup(
    points: DataFrame,
    slice_ms: int,
    group_col: str = "metric",
    ts_col: str = "ts",
    entity_col: str = "user_id",
    lgk: int = 12,
) -> DataFrame:
    """Per-(group, slice) HLL sketch partials — the mergeable state.

    One shuffle on (group, slice); the binary ``sketch`` column is what
    a continuous aggregate persists (parquet BINARY) next to the b1
    slice rollups, written once per slice at compaction time.
    """
    b = (F.floor(F.col(ts_col) / slice_ms) * slice_ms).alias("slice_start")
    return (
        points.select(F.col(group_col).alias(group_col), b, F.col(entity_col).alias("_e"))
        .groupBy(group_col, "slice_start")
        .agg(F.hll_sketch_agg("_e", F.lit(lgk)).alias("sketch"))
    )


def distinct_from_sketches(
    sketches: DataFrame,
    grain_ms: int,
    group_col: str = "metric",
) -> DataFrame:
    """Serve distinct counts at any grain ≥ the sketch slice from the
    persisted partials: union the slice sketches per coarser bucket and
    estimate.  Cost is #sketch-rows, independent of raw data volume.

    Output: ``(metric, bucket_start, n_distinct_est)``.
    """
    b = (F.floor(F.col("slice_start") / grain_ms) * grain_ms).alias("bucket_start")
    return (
        sketches.select(group_col, b, "sketch")
        .groupBy(group_col, "bucket_start")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_distinct_est")
        )
    )
