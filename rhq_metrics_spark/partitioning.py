"""Scale-adaptive input spreading (optimization guide §2.5, input
skew): a parquet table whose files hold few row groups reads as that
few TASKS — a single-row-group file is ONE task — so every
scan-fused computation downstream (edit distances, tokenize+explode,
regex rulesets) serializes on one core no matter how many the cluster
has.  At warehouse scale inputs arrive in hundreds of splits and this
module is a no-op; the hazard is small/awkwardly-written inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Round-robin-spread ``df`` across the cluster's cores when its
    plan yields fewer than ``min_factor ×`` defaultParallelism
    partitions; otherwise return it UNCHANGED (the at-scale path: no
    added exchange).

    Use it where heavy per-row or super-linear (pair-producing) work
    is fused onto a scan.  Row content is unchanged and the
    repartition is deterministic (sort-before-repartition is on by
    default, SPARK-23207), so results are identical either way.
    """
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    # JVM-side partition probe: DataFrame.rdd builds a Python-
    # serialized RDD plan (~0.3 s of driver overhead per call); the
    # JVM RDD answers the same question for ~60 ms (the simhash_pairs
    # lesson, r15)
    if df._jdf.rdd().getNumPartitions() >= min_factor * par:
        return df
    return df.repartition(par)
