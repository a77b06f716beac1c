"""Mergeable cardinality sketches for corpus statistics at 100 TB.

KMV (k-minimum-values) estimates a group's distinct-value count from
the k smallest hash fractions of its values: ``est = (k-1) / h_k``
where ``h_k`` is the k-th smallest.  Unlike ``approx_count_distinct``
(HLL, whose register layout is engine-private), KMV over the repo's
md5 hash fraction is **deterministic and oracle-checkable**: DuckDB
reproduces the identical bottom-k and the identical estimate double.

The bottom-k itself is exact and order-independent, so it distributes:
per-partition partial bottom-k's merged anywhere yield the global
bottom-k.  Here that is expressed as a two-level ranked selection —
level 1 ranks within (group, salt-bucket) so each of ``n_salts`` tasks
sorts only its slice (a single window over a 4-language corpus would
serialize each language through one task); level 2 ranks the ≤
``n_salts × k`` survivors.  Distinct-ing (group, value) first keeps
the ranked input minimal and absorbs value skew in map-side partials.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

#: 60-bit md5 prefix → fraction in [0, 1); matches sampling.hash_fraction
_HASH_BITS = 60
_HASH_DENOM = float(1 << _HASH_BITS)


def _hash_frac(value: Column, salt: str) -> Column:
    h = F.md5(F.concat(F.lit(salt), F.lit(":"), value.cast("string")))
    return F.conv(F.substring(h, 1, _HASH_BITS // 4), 16, 10).cast("long") / F.lit(
        _HASH_DENOM
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
    n_salts: int = 32,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: ``(group, k_used, hk, est)`` — ``k_used`` < k means the
    group had fewer than k distinct values and ``est`` is exact
    (``k_used``); otherwise ``est = (k-1)/hk``, one correctly-rounded
    IEEE division over the portable hash fraction.
    """
    vals = (
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("val"))
        .distinct()
        .withColumn("h", _hash_frac(F.col("val"), salt))
        .withColumn(
            "bucket",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt), F.lit(":b:"), F.col("val").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % n_salts,
        )
    )
    w1 = Window.partitionBy("grp", "bucket").orderBy(F.col("h").asc(), F.col("val").asc())
    survivors = vals.withColumn("r1", F.row_number().over(w1)).filter(F.col("r1") <= k)
    w2 = Window.partitionBy("grp").orderBy(F.col("h").asc(), F.col("val").asc())
    bottomk = survivors.withColumn("r2", F.row_number().over(w2)).filter(
        F.col("r2") <= k
    )
    return (
        bottomk.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("k_used"),
            F.max("h").alias("hk"),
        )
        .withColumn(
            "est",
            F.when(F.col("k_used") < k, F.col("k_used").cast("double")).otherwise(
                F.lit(float(k - 1)) / F.col("hk")
            ),
        )
    )
