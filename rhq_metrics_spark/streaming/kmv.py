"""Streaming KMV: a standing per-group bottom-k sketch maintained live
over a value stream — the continuous twin of
``pipelines/sketches.py kmv_sketch_rows``, completing the sketch
family's twin matrix (CMS / HLL / Bloom / Misra-Gries already stream).

KMV sketches MERGE by union-then-re-rank: the bottom-k of (bottom-k(A)
∪ bottom-k(B)) IS the bottom-k of A ∪ B, because any value ranked in
the union's true bottom-k is necessarily in its own side's bottom-k.
Each micro-batch therefore folds its own ≤k-row sketch into the
standing state with one ≤2k-row-per-group re-rank; the standing sketch
after batch N is EXACTLY ``kmv_sketch_rows`` over all points seen
(bit-identical — hash fractions are content-only md5), so
``kmv_distinct`` estimates and ``kmv_set_ops`` set algebra run on the
live state unchanged.

State is ≤ k rows per group no matter the throughput.  Replay safety
is the committed-``batch-N``-dirs pattern shared with the MG /
EXACTSUBSTR / dedup twins (state for batch N written by OVERWRITE,
computed from the newest committed ``batch-M (M < N)``, `_SUCCESS`
markers honored), so an at-least-once re-run converges to the
identical sketch instead of corrupting rank order.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from rhq_metrics_spark.localrel import local_df

from rhq_metrics_spark.pipelines.sketches import kmv_sketch_rows
from rhq_metrics_spark.streaming.heavy_hitters import _state_sources

__all__ = [
    "kmv_merge",
    "process_kmv_batch",
    "read_kmv_sketch",
    "start_kmv_stream",
]

_STATE_SCHEMA = "grp string, val string, h double"


def kmv_merge(base: DataFrame, other: DataFrame, k: int) -> DataFrame:
    """Merge two per-group KMV sketches (``grp, val, h`` rows, ≤ k per
    group each) into the sketch of their union: distinct on (grp, val)
    — the same value carries the same content-hash — then keep each
    group's k smallest (h, val).  Input is ≤ 2k rows per group, so the
    re-rank is sketch-sized, never data-sized."""
    merged = base.unionByName(other).dropDuplicates(["grp", "val"])
    w = Window.partitionBy("grp").orderBy(F.col("h").asc(), F.col("val").asc())
    return (
        merged.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .select("grp", "val", "h")
    )


def process_kmv_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    group_col: str,
    value_col: str,
    k: int,
    state_dir: str,
    salt: str = "kmv",
    n_salts: int = 32,
) -> None:
    """Fold one micro-batch into the standing sketch — idempotent under
    at-least-once replay (state keyed by batch id; base read excludes
    this and later batches)."""
    base_src = _state_sources(spark, state_dir, batch_id)
    base = (
        spark.read.parquet(base_src[1])
        if base_src
        else local_df(spark, [], _STATE_SCHEMA)
    )
    batch_sk = kmv_sketch_rows(
        batch_df.select(
            F.col(group_col).cast("string").alias("grp"),
            F.col(value_col).cast("string").alias("val"),
        ),
        "grp",
        "val",
        k,
        salt,
        n_salts,
    )
    kmv_merge(base, batch_sk, k).write.mode("overwrite").parquet(
        state_dir.rstrip("/") + f"/batch-{batch_id}"
    )
    # prune dirs older than the base just consumed (keep the base so an
    # interleaved replay of THIS batch still finds it)
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


def start_kmv_stream(
    stream_df: DataFrame,
    group_col: str,
    value_col: str,
    k: int,
    state_dir: str,
    checkpoint_dir: str,
    salt: str = "kmv",
    n_salts: int = 32,
    trigger_seconds: int = 1,
):
    """Start the foreachBatch loop; read the live sketch with
    :func:`read_kmv_sketch` (feed it straight to ``kmv_distinct``-style
    finalization or ``kmv_set_ops``)."""
    spark = stream_df.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_kmv_batch(
            spark, batch_df, batch_id, group_col, value_col, k,
            state_dir, salt, n_salts,
        )

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def read_kmv_sketch(spark: SparkSession, state_dir: str) -> DataFrame:
    """The standing sketch after the newest committed batch (empty
    sketch if none committed yet)."""
    src = _state_sources(spark, state_dir, 1 << 62)
    if not src:
        return local_df(spark, [], _STATE_SCHEMA)
    return spark.read.parquet(src[1])
