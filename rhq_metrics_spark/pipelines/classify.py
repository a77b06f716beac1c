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

from rhq_metrics_spark.localrel import local_df

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


def doc_features(
    docs: DataFrame,
    dim: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashed bag-of-tokens features: one ``(id, bucket, cnt)`` row per
    (doc, bucket) — the shared representation for scoring AND training
    (same md5 bucketing as :func:`linear_score`)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                lambda t: t != "",
            )
        ).alias("token"),
    )
    return (
        toks.withColumn(
            "bucket",
            (F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
             % dim).cast("int"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )


def train_logistic(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    dim: int = 1024,
    iters: int = 10,
    lr: float = 0.5,
) -> dict:
    """TRAIN the quality classifier in-engine: batch gradient descent
    for logistic regression over hashed bag-of-tokens features — the
    fastText-style linear quality/toxicity model pipelines apply at
    scale, learned from a labeled sample without leaving Spark (the
    training twin of :func:`linear_score`, the way ``bpe_learn_merges``
    is the training twin of ``bpe_apply``).

    The distributed form is the classic full-batch step (one pass per
    iteration, the shape MLlib's own LR uses): per iteration, the
    broadcast weight table joins the CACHED feature rows, a doc-key agg
    produces scores (persisted: the loss/bias collect and the gradient
    job both read it, so the feats-×-weights join runs once), the
    per-doc residual ``sigma(s) - y`` joins back (co-partitioned:
    features are repartitioned by doc once), and one bucket-key agg
    emits the ``dim``-row gradient collected to the driver.
    Per-iteration driver state is ``dim + 1`` floats; corpus rows are
    touched exactly twice per iteration, never collected.

    Intrinsically iterative and float-transcendental (``exp``), so —
    like ``bpe_learn_merges``/LTTB — no single-SQL oracle: tests pin it
    against a pure-Python reference trainer (loss-curve equality to
    float tolerance, separable-corpus accuracy).

    Returns ``{"weights": DataFrame(bucket, weight), "bias": float,
    "losses": [per-iteration mean log-loss]}``; feed ``weights`` to
    :func:`linear_score` (identical bucketing) or keep scoring with
    ``score_logistic`` semantics ``sigma(w.x + b)``.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    spark = df.sparkSession
    labels = df.select(F.col(id_col), F.col(label_col).cast("double").alias("_y"))
    feats = (
        doc_features(df, dim, id_col, text_col)
        .join(labels, id_col)
        .repartition(F.col(id_col))
        .persist()
    )
    n_docs = feats.select(id_col).distinct().count()
    if n_docs == 0:
        raise ValueError("no documents with features to train on")
    w = [0.0] * dim
    b = 0.0
    losses: list[float] = []
    eps = 1e-12
    for _ in range(iters):
        wdf = F.broadcast(
            local_df(
                spark, [(j, w[j]) for j in range(dim)], "bucket int, _w double"
            )
        )
        scored = (
            feats.join(wdf, "bucket")
            .groupBy(id_col)
            .agg(
                F.first("_y").alias("_y"),
                (F.sum(F.col("cnt") * F.col("_w")) + F.lit(b)).alias("_s"),
            )
            .withColumn("_p", F.expr("1.0 / (1.0 + exp(-_s))"))
            .withColumn("_r", F.col("_p") - F.col("_y"))
            .persist()  # two collects read it: loss/bias, then gradient
        )
        glob = scored.agg(
            F.sum("_r").alias("gb"),
            F.avg(
                -(
                    F.col("_y") * F.log(F.greatest(F.col("_p"), F.lit(eps)))
                    + (1 - F.col("_y"))
                    * F.log(F.greatest(1 - F.col("_p"), F.lit(eps)))
                )
            ).alias("loss"),
        ).collect()[0]
        grad = {
            r["bucket"]: r["g"]
            for r in feats.join(
                scored.select(id_col, "_r"), id_col
            )
            .groupBy("bucket")
            .agg(F.sum(F.col("cnt") * F.col("_r")).alias("g"))
            .collect()
        }
        scored.unpersist()
        for j, g in grad.items():
            w[j] -= lr * g / n_docs
        b -= lr * float(glob["gb"]) / n_docs
        losses.append(float(glob["loss"]))
    feats.unpersist()
    weights = local_df(
        spark, [(j, w[j]) for j in range(dim)], "bucket int, weight double"
    )
    return {"weights": weights, "bias": b, "losses": losses}
