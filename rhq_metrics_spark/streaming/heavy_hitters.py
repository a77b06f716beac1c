"""Streaming heavy hitters: a standing Misra-Gries summary maintained
live over a token/value stream — the continuous twin of
``pipelines/sketches.py heavy_hitters``'s candidate pass.

MG summaries MERGE (Agrawal et al., "Mergeable Summaries", public):
sum matching counters, then subtract the ``(capacity+1)``-th largest
merged count from every counter and drop the non-positive ones — the
result is again an MG summary of the union with error
``eps_a + eps_b + threshold``.  Each micro-batch folds its exact counts
(an MG summary with eps 0) into the standing state, so the state stays
≤ ``capacity`` rows no matter how many distinct values the stream has
seen, and every counter ``cnt`` brackets the true stream count as
``cnt <= true <= cnt + eps`` (``eps`` carried in the state and tested).
No false negatives above ``eps``: anything with true count > eps is
present.

Replay safety (the ADVICE-r8 dedup lesson, same mechanics): state for
batch N is written by OVERWRITE to ``state_dir/batch-N`` and computed
from the newest ``batch-M (M < N)``, so an at-least-once re-run of
batch N converges to the identical state instead of double-counting;
directories are listed through the Hadoop FileSystem API so remote
stores work.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rhq_metrics_spark.localrel import local_df

__all__ = ["mg_merge", "read_heavy_hitters", "start_heavy_hitters_stream"]

_STATE_SCHEMA = "value string, cnt long, eps long"


def mg_merge(base: DataFrame, counts: DataFrame, capacity: int) -> DataFrame:
    """Merge two MG summaries ``(value, cnt, eps)`` into one with at
    most ``capacity`` rows.  ``eps`` is a constant column (the summary's
    count-error budget); the merged eps is ``eps_a + eps_b +
    threshold``.  The threshold top-(capacity+1) runs as a map-side
    partial top-k (TakeOrdered), never a full sort."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    spark = base.sparkSession
    eps_a = (base.select(F.max("eps")).collect()[0][0] or 0) if base.columns else 0
    eps_b = (counts.select(F.max("eps")).collect()[0][0] or 0)
    merged = (
        base.select("value", "cnt")
        .unionByName(counts.select("value", "cnt"))
        .groupBy("value")
        .agg(F.sum("cnt").alias("cnt"))
    )
    top = merged.orderBy(F.col("cnt").desc()).limit(capacity + 1).collect()
    threshold = int(top[-1]["cnt"]) if len(top) > capacity else 0
    eps = int(eps_a) + int(eps_b) + threshold
    out = merged.withColumn("cnt", F.col("cnt") - F.lit(threshold)).filter(
        F.col("cnt") > 0
    )
    return out.withColumn("eps", F.lit(eps).cast("long"))


def _state_sources(spark: SparkSession, state_dir: str, before_batch: int):
    """Newest COMMITTED ``batch-M`` directory with ``M < before_batch``
    (Hadoop FS listing — works on HDFS/S3/local), or None.  Only dirs
    carrying Spark's ``_SUCCESS`` marker count: a concurrent reader (or
    a replay racing the writer) must fall back to the previous committed
    state rather than fail on — or worse, trust — a half-written one."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return None
    best = None
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch-"):
            try:
                bid = int(name.split("-", 1)[1])
            except ValueError:
                continue
            if bid >= before_batch or (best is not None and bid <= best[0]):
                continue
            if not fs.exists(
                jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            ):
                continue
            best = (bid, str(st.getPath()))
    return best


def process_heavy_hitters_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    col: str,
    capacity: int,
    state_dir: str,
) -> None:
    """Fold one micro-batch into the standing MG state — idempotent
    under at-least-once replay (state keyed by batch id, base read
    excludes this and later batches)."""
    base_src = _state_sources(spark, state_dir, batch_id)
    base = (
        spark.read.parquet(base_src[1])
        if base_src
        else local_df(spark, [], _STATE_SCHEMA)
    )
    counts = (
        batch_df.select(F.col(col).cast("string").alias("value"))
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("eps", F.lit(0).cast("long"))
    )
    merged = mg_merge(base, counts, capacity)
    merged.write.mode("overwrite").parquet(
        state_dir.rstrip("/") + f"/batch-{batch_id}"
    )
    # prune state dirs older than the base we just consumed (keep the
    # base itself so an interleaved replay of THIS batch still finds it)
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


def start_heavy_hitters_stream(
    stream_df: DataFrame,
    col: str,
    capacity: int,
    state_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int = 1,
):
    """Start the foreachBatch loop.  The standing summary after the
    latest finished batch is read with :func:`read_heavy_hitters`."""
    spark = stream_df.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_heavy_hitters_batch(
            spark, batch_df, batch_id, col, capacity, state_dir
        )

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def read_heavy_hitters(spark: SparkSession, state_dir: str) -> DataFrame:
    """The standing summary after the newest finished batch:
    ``(value, cnt, eps)`` with ``cnt <= true count <= cnt + eps``."""
    src = _state_sources(spark, state_dir, before_batch=2**62)
    if src is None:
        return local_df(spark, [], _STATE_SCHEMA)
    return spark.read.parquet(src[1])
