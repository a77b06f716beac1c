"""Linear text-classifier scoring with the hashing trick — the
"apply a learned quality/toxicity model to every document" step of a
training-data pipeline, done without leaving the JVM.

A fastText/VW-style linear model is (weights over hashed token
buckets, bias).  Scoring at 100 TB is a broadcast problem, not an ML
problem: hash each token to one of ``dim`` buckets, count, dot with
the broadcast weight vector.  Expressed as explode → broadcast-join the
(tiny) weight table → per-doc sum: one shuffle back onto doc_id, which
AQE partial-aggregates map-side since tokens of a doc co-locate with
their scan split.

Weights here are md5-derived integers (a stand-in for trained floats —
no training corpus ships in this sandbox); integer weights x integer
counts keep the score exact, so the operator is oracle-checkable
bit-for-bit (same convention as BM25's integer idf).  Swapping in real
trained weights is `weights_df` — the plan is identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TOKEN_SPLIT = r"[^a-z0-9]+"


def hashed_weights(spark: SparkSession, dim: int = 1024,
                   seed: str = "clf-v1") -> DataFrame:
    """Deterministic pseudo-trained weight table: one row per bucket,
    integer weight in [-50, 49] derived from md5(seed, bucket)."""
    return spark.range(dim).select(
        F.col("id").cast("int").alias("bucket"),
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(seed + ":"),
                                           F.col("id").cast("string"))), 1, 8),
                16, 10,
            ).cast("long") % 100 - 50
        ).cast("long").alias("weight"),
    )


def linear_score(
    docs: DataFrame,
    weights: DataFrame,
    dim: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score = sum over tokens of count(token) * weight(bucket(token)).

    Output: ``(doc_id, n_tokens, score, label)`` with
    ``label = score > 0`` (keep/drop decision).  Bucket = first 8 md5
    hex digits of the token mod ``dim`` — portable to any engine with
    md5, so the whole pipeline is cross-checkable.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda t: t != "",
            )
        ).alias("token"),
    )
    bucketed = toks.withColumn(
        "bucket",
        (F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
         % dim).cast("int"),
    )
    # ONE shuffle: the weight join is broadcast (no exchange), and the
    # per-doc sum partial-aggregates map-side — tokens of a doc sit in
    # its scan split, so the exchange carries one row per (doc,
    # partial), not per token.  A groupBy(doc, bucket) pre-count would
    # add a second full shuffle for nothing.
    scored = (
        bucketed.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("weight").alias("score"),
        )
    )
    return scored.select(
        id_col,
        "n_tokens",
        "score",
        (F.col("score") > 0).alias("label"),
    )
