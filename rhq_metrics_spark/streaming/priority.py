"""Streaming priority sampling: a standing per-group weighted top-k
sample (Duffield–Lund–Thorup) maintained live over a document/point
stream — the continuous twin of ``pipelines/sampling.py
priority_sample``.

Priority samples MERGE exactly like KMV sketches, just at the other
end of the order: the top-(k+1) by priority of (top-(k+1)(A) ∪
top-(k+1)(B)) IS the top-(k+1) of A ∪ B, because any row in the
union's true top-(k+1) is necessarily in its own side's top-(k+1).
Each micro-batch therefore folds its own ≤(k+1)-row-per-group
candidate set into the standing state with one ≤2(k+1)-row re-rank;
the state after batch N is EXACTLY the top-(k+1) of everything seen
(priorities are content-only md5), so :func:`read_priority_sample`
serves the same ``(id, weight, priority_r, est_weight_r)`` rows the
batch operator would produce over the full history — including the
``max(w, τ)`` unbiased subset-sum estimates, since τ (the (k+1)-th
priority) lives in the state by construction.

State is ≤ k+1 rows per group no matter the throughput.  Replay
safety is the committed-``batch-N``-dirs pattern shared with the
KMV / MG / EXACTSUBSTR twins (state for batch N written by OVERWRITE
from the newest committed ``batch-M (M < N)``); ids are deduped on
merge, so at-least-once redelivery of a row is a no-op (same id ⇒
same deterministic priority).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from rhq_metrics_spark.localrel import local_df

from rhq_metrics_spark.pipelines.sampling import priority_q
from rhq_metrics_spark.streaming.heavy_hitters import _state_sources

__all__ = [
    "priority_merge",
    "process_priority_batch",
    "read_priority_sample",
    "start_priority_stream",
]

_STATE_SCHEMA = "grp string, id string, w double, q double"


def priority_merge(base: DataFrame, other: DataFrame, k: int) -> DataFrame:
    """Merge two per-group priority candidate sets (``grp, id, w, q``
    rows, ≤ k+1 per group each) into the candidate set of their union:
    distinct on (grp, id) — the same id carries the same content-only
    priority — then keep each group's k+1 largest (q, id).  Input is
    ≤ 2(k+1) rows per group, so the re-rank is state-sized, never
    data-sized."""
    merged = base.unionByName(other).dropDuplicates(["grp", "id"])
    w = Window.partitionBy("grp").orderBy(F.col("q").desc(), F.col("id").asc())
    return (
        merged.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k + 1)
        .select("grp", "id", "w", "q")
    )


def process_priority_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    group_col: str | None,
    weight_col: str,
    id_col: str,
    k: int,
    state_dir: str,
    salt: str = "prio",
) -> None:
    """Fold one micro-batch into the standing candidate set —
    idempotent under at-least-once replay (state keyed by batch id;
    base read excludes this and later batches)."""
    base_src = _state_sources(spark, state_dir, batch_id)
    base = (
        spark.read.parquet(base_src[1])
        if base_src
        else local_df(spark, [], _STATE_SCHEMA)
    )
    grp = (
        F.col(group_col).cast("string")
        if group_col
        else F.lit("_all")
    )
    cand = batch_df.select(
        grp.alias("grp"),
        F.col(id_col).cast("string").alias("id"),
        F.col(weight_col).cast("double").alias("w"),
        priority_q(F.col(weight_col), F.col(id_col), salt).alias("q"),
    )
    wdw = Window.partitionBy("grp").orderBy(F.col("q").desc(), F.col("id").asc())
    batch_top = (
        cand.withColumn("_r", F.row_number().over(wdw))
        .filter(F.col("_r") <= k + 1)
        .select("grp", "id", "w", "q")
    )
    priority_merge(base, batch_top, k).write.mode("overwrite").parquet(
        state_dir.rstrip("/") + f"/batch-{batch_id}"
    )
    if base_src:
        jvm = spark._jvm
        root = jvm.org.apache.hadoop.fs.Path(state_dir)
        fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith("batch-"):
                try:
                    bid = int(name.split("-", 1)[1])
                except ValueError:
                    continue
                if bid < base_src[0]:
                    fs.delete(st.getPath(), True)


def start_priority_stream(
    stream_df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
    state_dir: str,
    checkpoint_dir: str,
    group_col: str | None = None,
    salt: str = "prio",
    trigger_seconds: int = 1,
):
    """Start the foreachBatch loop; read the live sample with
    :func:`read_priority_sample`."""
    spark = stream_df.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_priority_batch(
            spark, batch_df, batch_id, group_col, weight_col, id_col,
            k, state_dir, salt,
        )

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def read_priority_sample(spark: SparkSession, state_dir: str, k: int) -> DataFrame:
    """The live sample after the newest committed batch: per group the
    top-k rows with ``(id, weight, priority_r, est_weight_r)`` exactly
    as the batch operator serves them — τ is each group's (k+1)-th
    stored priority (0 when the group has ≤ k rows seen)."""
    src = _state_sources(spark, state_dir, 1 << 62)
    state = (
        spark.read.parquet(src[1])
        if src
        else local_df(spark, [], _STATE_SCHEMA)
    )
    wdw = Window.partitionBy("grp").orderBy(F.col("q").desc(), F.col("id").asc())
    gw = Window.partitionBy("grp")
    ranked = (
        state.withColumn("_r", F.row_number().over(wdw))
        .withColumn("_n", F.count(F.lit(1)).over(gw))
        .withColumn(
            "_tau",
            F.max(F.when(F.col("_r") == k + 1, F.col("q"))).over(gw),
        )
    )
    return (
        ranked.filter(F.col("_r") <= k)
        .select(
            "grp",
            "id",
            F.col("w").cast("long").alias("weight"),
            F.round("q", 6).alias("priority_r"),
            F.round(
                F.greatest(F.col("w"), F.coalesce(F.col("_tau"), F.lit(0.0))), 6
            ).alias("est_weight_r"),
        )
        .orderBy("grp", F.col("priority_r").desc(), F.col("id").asc())
    )
