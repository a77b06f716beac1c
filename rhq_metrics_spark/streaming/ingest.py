"""Structured Streaming ingest into the hot layer (B1/B4/S9).

Reference streaming semantics (SURVEY.md §2.10): writes land in 2-hour
tumbling slices (DataAccessImpl.java:100-102,186-196); data older than
the current slices is routed to an out-of-order table
(``OUT_OF_ORDER_TABLE_NAME``, DataAccessImpl.java:100) — queries union
every layer, so late rows are always visible.

Spark-first: one ``writeStream.foreachBatch`` that stamps the 2h
``date_slice`` partition column and appends to the hot layer — the
partition directory IS the temp table, so late/out-of-order rows need no
special path: they simply land in an older ``date_slice`` partition
(compaction will re-visit a slice if new files appear).  The insert-event
bus (S9, MetricsService.java:366) falls out for free: any number of
downstream ``readStream`` consumers can subscribe to the same source or
to the hot-layer directory.

Late-data accounting mirrors the reference's route-don't-drop behavior:
when ``late_after_ms`` is given, rows older than the stream's event-time
high-water mark minus ``late_after_ms`` are *still written* (they land
in their older slice), and the count is reported per batch via
``on_late`` — the accounting side of the out-of-order table without a
separate physical path.

A :class:`~rhq_metrics_spark.maintenance.MaintenanceRunner` can be
attached: after each batch the runner sees the event-time high-water
mark and compacts slices the stream has moved past (window-close-driven
compaction, the TempDataCompressor cadence).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from rhq_metrics_spark.sources.store import MetricsStore


def start_ingest_stream(
    stream_df: DataFrame,
    store: MetricsStore,
    metric_type: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    maintenance=None,
    late_after_ms: int | None = None,
    on_late: Callable[[int, int], None] | None = None,
) -> StreamingQuery:
    """Start streaming ingest of a canonical points stream
    ``(tenant_id, metric, ts, value, tags)`` into the store's hot layer.

    Each micro-batch goes through the same batched write path as batch
    ingest (stamping date_slice / tenant_bucket / ingest_seq), so
    last-write-wins and compaction behave identically for both paths.

    ``maintenance``: a MaintenanceRunner; gets the event-time high-water
    mark after each batch and compacts newly-closed slices.
    ``late_after_ms`` + ``on_late(batch_id, n_late)``: count (never drop)
    rows arriving more than ``late_after_ms`` behind the high-water mark.
    """
    state = {"high_water": None}
    track = maintenance is not None or late_after_ms is not None

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.add_data_points(metric_type, batch_df)
        if not track:
            return
        aggs = [F.max("ts").alias("_mx")]
        if late_after_ms is not None and state["high_water"] is not None:
            bound = state["high_water"] - late_after_ms
            aggs.append(
                F.count(F.when(F.col("ts") < F.lit(bound), 1)).alias("_late")
            )
        row = batch_df.agg(*aggs).collect()[0].asDict()
        if late_after_ms is not None and on_late is not None:
            n_late = int(row.get("_late") or 0)
            if n_late:
                on_late(batch_id, n_late)
        mx = row["_mx"]
        if mx is not None:
            hw = state["high_water"]
            state["high_water"] = mx if hw is None else max(hw, mx)
        if maintenance is not None and state["high_water"] is not None:
            maintenance.on_event_time(metric_type, state["high_water"])

    writer = stream_df.writeStream.foreachBatch(_write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def windowed_stream_stats(
    stream_df: DataFrame,
    window_duration: str = "2 hours",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming tumbling-window aggregation over the ingest stream —
    the Structured Streaming analogue of the reference's per-2h-block
    processing, with a watermark bounding late-data state.

    Input needs an event-time column ``event_time`` (timestamp); emits
    per (tenant, metric, window) numeric stats.
    """
    return (
        stream_df.withWatermark("event_time", watermark_delay)
        .groupBy(
            F.col("tenant_id"),
            F.col("metric"),
            F.window("event_time", window_duration).alias("win"),
        )
        .agg(
            F.min("value").alias("min"),
            F.avg("value").alias("avg"),
            F.max("value").alias("max"),
            F.sum("value").alias("sum"),
            F.count("value").alias("samples"),
        )
        .select(
            "tenant_id",
            "metric",
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "min",
            "avg",
            "max",
            "sum",
            "samples",
        )
    )


def session_stream_stats(
    stream_df: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming gap-based sessionization via ``session_window`` — the
    streaming twin of ``operators/sessions.py`` (same semantics: a
    session extends while consecutive events are <= gap apart).

    State per open session is one (start, end, count, key) tuple; the
    watermark closes sessions whose end + gap is past the watermark, so
    state is bounded by the number of concurrently-open sessions, not by
    history.  Emits per (tenant, metric, session) start/end/n_events
    once the session finalizes (append mode).
    """
    return (
        stream_df.withWatermark("event_time", watermark_delay)
        .groupBy(
            F.col("tenant_id"),
            F.col("metric"),
            F.session_window("event_time", gap).alias("sess"),
        )
        .agg(F.count("value").alias("n_events"))
        .select(
            "tenant_id",
            "metric",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def start_rollup_stream(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    window_duration: str = "2 hours",
    watermark_delay: str = "10 minutes",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Continuous aggregate: maintain a parquet rollup table of
    per-(tenant, metric, window) stats as the stream arrives — the
    downsampling companion to retention (raw points expire via
    ``apply_retention``; rollups are what long-range queries read).

    Append mode + watermark means ONLY finalized windows are written —
    each window lands exactly once, so the rollup table needs no
    last-write-wins machinery.  At scale the sink is just another
    partitioned parquet table: long-range dashboards scan years of 2h
    rollups (≈ samples/7200 rows per series-second) instead of raw
    points, and the same bucket-stats operators run on either.
    """
    agg = windowed_stream_stats(stream_df, window_duration, watermark_delay)
    writer = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(path))
        .option("checkpointLocation", str(checkpoint_dir))
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
