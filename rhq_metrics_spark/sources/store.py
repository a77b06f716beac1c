"""Layered Parquet metrics store — the Spark-native replacement for the
reference's Cassandra 3-layer physical model (SURVEY.md §1.3-1.4).

Reference layout (bootstrap.groovy:101-147; DataAccessImpl.java:100-196):

- ``data_temp_<ts>``  — per-2h-slice hot write tables       → **hot layer**
- ``data_compressed`` — Gorilla-compressed 2h blocks        → **cold layer**
  (Parquet encodings + ZSTD replace Gorilla; do NOT port the codec)
- ``data``            — out-of-order/legacy rows            → hot layer too
- ``metrics_idx`` / ``metrics_tags_idx`` / ``retentions_idx`` → definition
  table (tags as a MapType column; the inverted tag index is unnecessary —
  the tag compiler filters the map directly, one scan)

Layout here::

    {base}/points/{type}/hot/date_slice=<2h-floor-ms>/tenant_bucket=<n>/*.parquet
    {base}/points/{type}/cold/date_slice=.../tenant_bucket=.../*.parquet
    {base}/metrics_idx/*.parquet
    {base}/tenants/*.parquet

Scale design:

- partition by ``date_slice`` (2h floor, DateTimeService.java:79-122) and a
  hashed ``tenant_bucket`` — time-range + tenant predicates prune
  partitions; individual metric predicates prune via parquet min/max on the
  sorted ``metric`` column within each file.
- writes append to hot with an ``ingest_seq`` that is the **wall-clock
  microsecond write timestamp** (monotonic-bumped within a process) —
  exactly Cassandra's client-timestamp LWW: correct across process
  restarts and concurrent writers to clock-sync precision, with no
  driver-side state to recover.  Seq ties (same microsecond, or
  duplicate keys within one batch) break deterministically by larger
  ``value``, Cassandra's documented cell tie-break.
- reads union hot+cold and apply **last-write-wins per (tenant, metric,
  ts)** — the CQL-upsert semantics (DataAccessImpl.java:215-221) — via one
  ``row_number`` window (S2/S3 merge+dedup collapses into this).
- maintenance ops (compaction/retention/deletes) serialize on a
  ``flock``-based store lock and publish slice rewrites with two atomic
  renames (old → trash, staging → live), so concurrent maintainers can't
  interleave rewrites.  On object storage (no atomic rename) this layer
  should sit on a table format (Delta/Iceberg) instead — the query and
  LWW semantics above are unchanged by that swap.
- compaction (B2 analogue, TempDataCompressor.java:40-98) rewrites closed
  slices: dedup → sort by (metric, ts) → cold, then drops the hot slice.
  Queries never see Gorilla blocks; they see sorted, ZSTD-Parquet row
  groups with min/max pruning.
- retention (B6) and tenant/metric deletion (B7) are partition-level
  rewrites/drops.
"""

from __future__ import annotations

import contextlib
import fcntl
import os
import shutil
import time
import uuid
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import IntegerType, LongType, StructType

from rhq_metrics_spark.model import (
    METRICS_IDX_SCHEMA,
    SCHEMAS,
    TENANTS_SCHEMA,
    TWO_HOURS_MS,
    MetricType,
)

_LAYERS = ("hot", "cold")

# -- pure-Python XXH64 (public algorithm; github.com/Cyan4973/xxHash spec) --
# Matches Spark's ``xxhash64`` expression on string input (UTF-8 bytes,
# seed 42) so tenant buckets can be computed driver-side without a job.

_XP1 = 0x9E3779B185EBCA87
_XP2 = 0xC2B2AE3D27D4EB4F
_XP3 = 0x165667B19E3779F9
_XP4 = 0x85EBCA77C2B2AE63
_XP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xx_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _XP2) & _M64
    return (_rotl64(acc, 31) * _XP1) & _M64


def _xxhash64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XP1 + _XP2) & _M64
        v2 = (seed + _XP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XP1) & _M64
        while i + 32 <= n:
            v1 = _xx_round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xx_round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _xx_round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _xx_round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _xx_round(0, v)) * _XP1 + _XP4) & _M64
    else:
        h = (seed + _XP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _xx_round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl64(h, 27) * _XP1 + _XP4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _XP1) & _M64
        h = (_rotl64(h, 23) * _XP2 + _XP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XP5) & _M64
        h = (_rotl64(h, 11) * _XP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XP2) & _M64
    h ^= h >> 29
    h = (h * _XP3) & _M64
    h ^= h >> 32
    return h


class MetricsStore:
    """Filesystem-backed layered store with last-write-wins semantics."""

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        slice_ms: int = TWO_HOURS_MS,
        tenant_buckets: int = 16,
    ):
        self.spark = spark
        self.base = Path(base_path)
        self.slice_ms = slice_ms
        self.tenant_buckets = tenant_buckets
        self._last_seq = 0

    # -- paths -------------------------------------------------------------

    def _points_path(self, metric_type: str, layer: str) -> Path:
        assert layer in _LAYERS
        return self.base / "points" / MetricType.check(metric_type) / layer

    # -- write path (S5) -----------------------------------------------------

    def _next_seq(self) -> int:
        """Per-batch write timestamp: wall-clock microseconds, bumped to
        stay strictly monotonic within this process.  Mirrors Cassandra
        client timestamps (CQL ``USING TIMESTAMP`` microseconds,
        DataAccessImpl.java:215-221): a reopened store or a second
        concurrent writer keeps winning LWW without recovering any state
        from disk."""
        self._last_seq = max(self._last_seq + 1, time.time_ns() // 1_000)
        return self._last_seq

    def _stamp(self, df: DataFrame) -> DataFrame:
        """Add storage columns: date_slice partition, tenant bucket, ingest seq."""
        return (
            df.withColumn(
                # integer floor (not truncation): negative epoch-millis
                # must land in the slice the read path (model.time_slice,
                # find_data_points) computes with floor division
                "date_slice",
                F.floor(F.col("ts") / F.lit(self.slice_ms)).cast("long")
                * F.lit(self.slice_ms),
            )
            .withColumn(
                "tenant_bucket",
                F.pmod(F.xxhash64("tenant_id"), F.lit(self.tenant_buckets)).cast("int"),
            )
            .withColumn("ingest_seq", F.lit(self._next_seq()))
        )

    def add_data_points(self, metric_type: str, df: DataFrame) -> None:
        """Batch ingest into the hot layer (append; LWW applied at read)."""
        out = self._stamp(df)
        (
            out.repartition("date_slice", "tenant_bucket")
            .sortWithinPartitions("metric", "ts")
            .write.mode("append")
            .option("compression", "zstd")
            .partitionBy("date_slice", "tenant_bucket")
            .parquet(str(self._points_path(metric_type, "hot")))
        )

    # -- read path (S1-S4, S6) ----------------------------------------------

    def _read_layer(self, metric_type: str, layer: str) -> DataFrame | None:
        path = self._points_path(metric_type, layer)
        if not path.exists() or not any(path.iterdir()):
            return None
        # StructType.add mutates in place — build a fresh copy each time
        schema = StructType(list(SCHEMAS[metric_type].fields))
        schema = (
            schema.add("ingest_seq", LongType())
            .add("date_slice", LongType())
            .add("tenant_bucket", IntegerType())
        )
        df = self.spark.read.schema(schema).parquet(str(path))
        # cold rows outrank nothing; hot rows with higher ingest_seq win.
        priority = F.col("ingest_seq") if layer == "hot" else F.lit(-1)
        return df.withColumn("_layer_seq", priority.cast("long"))

    def _merged_lww(self, metric_type: str, filter_fn=None) -> DataFrame | None:
        """hot ∪ cold with last-write-wins, windowing ONLY the slices that
        actually have hot data.

        Replaces SortedMerge + distinctUntilChanged (SortedMerge.java:46-79;
        MetricsServiceImpl.java:680-693).  Compacted (cold-only) slices are
        already deduped — at scale that is almost all of the data, so the
        LWW ``row_number`` shuffle covers only the few open slices instead
        of the whole scan.  ``filter_fn`` is applied per layer BEFORE the
        window so pushdown/pruning reach the parquet scans.
        """
        hot = self._read_layer(metric_type, "hot")
        cold = self._read_layer(metric_type, "cold")
        if filter_fn is not None:
            hot = filter_fn(hot) if hot is not None else None
            cold = filter_fn(cold) if cold is not None else None
        if hot is None and cold is None:
            return None
        if hot is None:
            return cold
        overlap = self.hot_slices(metric_type)
        clean = None
        df = hot
        if cold is not None and overlap:
            df = df.unionByName(cold.filter(F.col("date_slice").isin(overlap)))
            clean = cold.filter(~F.col("date_slice").isin(overlap))
        elif cold is not None:
            clean = cold
        # seq ties (same-microsecond writers, duplicate keys in one batch)
        # break by larger value — Cassandra's deterministic cell tie-break
        w = Window.partitionBy("tenant_id", "metric", "ts").orderBy(
            F.col("_layer_seq").desc(), F.col("value").desc_nulls_last()
        )
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        return df.unionByName(clean) if clean is not None else df

    def points(self, metric_type: str, dedup: bool = True) -> DataFrame:
        """Unified hot ∪ cold view with last-write-wins per (tenant, metric, ts)."""
        if not dedup:
            layers = [
                lyr
                for lyr in (
                    self._read_layer(metric_type, "hot"),
                    self._read_layer(metric_type, "cold"),
                )
                if lyr is not None
            ]
            if not layers:
                return self.spark.createDataFrame([], SCHEMAS[metric_type])
            df = layers[0]
            for other in layers[1:]:
                df = df.unionByName(other)
            return df.select("tenant_id", "metric", "ts", "value", "tags")
        merged = self._merged_lww(metric_type)
        if merged is None:
            return self.spark.createDataFrame([], SCHEMAS[metric_type])
        return merged.select("tenant_id", "metric", "ts", "value", "tags")

    def find_data_points(
        self,
        metric_type: str,
        tenant_id: str,
        metric: str | list[str] | None,
        start: int,
        end: int,
        limit: int = 0,
        order: str = "asc",
    ) -> DataFrame:
        """S1/S4 raw scan: partition-pruned, half-open [start, end).

        The date_slice/tenant filters are applied *before* the LWW window so
        pruning reaches the parquet scan.
        """
        first_slice = (start // self.slice_ms) * self.slice_ms
        bucket = self._tenant_bucket_of(tenant_id)

        def prune(df: DataFrame) -> DataFrame:
            df = df.filter(
                (F.col("date_slice") >= F.lit(first_slice))
                & (F.col("date_slice") < F.lit(end))
                & (F.col("tenant_bucket") == F.lit(bucket))
                & (F.col("tenant_id") == tenant_id)
                & (F.col("ts") >= start)
                & (F.col("ts") < end)
            )
            if metric is not None:
                if isinstance(metric, str):
                    df = df.filter(F.col("metric") == metric)
                else:
                    df = df.filter(F.col("metric").isin(metric))
            return df

        merged = self._merged_lww(metric_type, prune)
        if merged is None:
            return self.spark.createDataFrame([], SCHEMAS[metric_type])
        df = merged.select("tenant_id", "metric", "ts", "value", "tags")
        df = df.orderBy(F.col("ts").asc() if order == "asc" else F.col("ts").desc())
        return df.limit(limit) if limit and limit > 0 else df

    def _tenant_bucket_of(self, tenant_id: str) -> int:
        """Driver-side twin of the ``pmod(xxhash64(tenant_id), buckets)``
        stamp — pure Python, no 1-row Spark job per service call."""
        h = _xxhash64(tenant_id.encode("utf-8"), seed=42)
        if h >= 1 << 63:  # Spark's xxhash64 returns a signed long
            h -= 1 << 64
        return h % self.tenant_buckets

    # -- maintenance serialization --------------------------------------------

    @contextlib.contextmanager
    def _maintenance_lock(self):
        """Cross-process mutex for maintenance ops (compaction, retention,
        deletes): two maintainers must not interleave slice rewrites.
        ``flock`` on local/NFS filesystems; on object storage replace the
        whole publish layer with a table format (module docstring)."""
        self.base.mkdir(parents=True, exist_ok=True)
        fd = os.open(str(self.base / "_maintenance.lock"), os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def _swap_in(self, src: Path, dst: Path) -> None:
        """Publish a rewritten partition with two atomic renames: live →
        trash, staging → live.  Readers racing the swap see either the
        old or the new data (or, in the instant between renames, neither)
        — never a half-written mix; the trash dir is dropped last."""
        trash = dst.parent / f"_trash-{uuid.uuid4().hex}"
        if dst.exists():
            os.rename(dst, trash)
        dst.parent.mkdir(parents=True, exist_ok=True)
        os.rename(src, dst)
        shutil.rmtree(trash, ignore_errors=True)

    # -- lifecycle jobs (B2/B6/B7) -------------------------------------------

    def hot_slices(self, metric_type: str) -> list[int]:
        return self._layer_slices(metric_type, "hot")

    def cold_slices(self, metric_type: str) -> list[int]:
        return self._layer_slices(metric_type, "cold")

    def _layer_slices(self, metric_type: str, layer: str) -> list[int]:
        path = self._points_path(metric_type, layer)
        if not path.exists():
            return []
        return sorted(
            int(p.name.split("=", 1)[1])
            for p in path.iterdir()
            if p.is_dir() and p.name.startswith("date_slice=")
        )

    def compact(self, metric_type: str, closed_before_ms: int) -> list[int]:
        """B2 analogue: merge every closed hot slice (strictly older than
        ``closed_before_ms``) with its cold slice under last-write-wins,
        rewrite sorted into cold, drop the hot slices.

        All closed slices compact in ONE Spark job (the date_slice
        partition column splits the output): a backfill with hundreds of
        slices costs one shuffle, not one job per slice."""
        with self._maintenance_lock():
            return self._compact_locked(metric_type, closed_before_ms)

    def _compact_locked(self, metric_type: str, closed_before_ms: int) -> list[int]:
        closed = [
            s
            for s in self.hot_slices(metric_type)
            if s + self.slice_ms <= closed_before_ms
        ]
        if not closed:
            return []
        hot = self._read_layer(metric_type, "hot").filter(
            F.col("date_slice").isin(closed)
        )
        cold_layer = self._read_layer(metric_type, "cold")
        merged = hot
        if cold_layer is not None:
            merged = hot.unionByName(
                cold_layer.filter(F.col("date_slice").isin(closed))
            )
        w = Window.partitionBy("tenant_id", "metric", "ts").orderBy(
            F.col("_layer_seq").desc(), F.col("value").desc_nulls_last()
        )
        compacted = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "tenant_id",
                "metric",
                "ts",
                "value",
                "tags",
                F.lit(0).cast("long").alias("ingest_seq"),
                "date_slice",
                "tenant_bucket",
            )
        )
        staging = self.base / "_staging" / f"{metric_type}_compact"
        (
            compacted.repartition("date_slice", "tenant_bucket")
            .sortWithinPartitions("metric", "ts")
            .write.mode("overwrite")
            .option("compression", "zstd")
            # v2 data pages: DELTA_BINARY_PACKED on the sorted ts column
            # (the Gorilla delta-of-delta axis) — ~10% smaller cold files
            .option("parquet.writer.version", "v2")
            .partitionBy("date_slice", "tenant_bucket")
            .parquet(str(staging))
        )
        cold_root = self._points_path(metric_type, "cold")
        cold_root.mkdir(parents=True, exist_ok=True)
        done = []
        for slice_start in closed:
            src = staging / f"date_slice={slice_start}"
            if not src.exists():
                continue
            self._swap_in(src, cold_root / f"date_slice={slice_start}")
            # retire the hot slice: atomic rename out of the readable
            # tree first, then delete at leisure
            hot_slice = (
                self._points_path(metric_type, "hot") / f"date_slice={slice_start}"
            )
            if hot_slice.exists():
                retired = hot_slice.parent / f"_trash-{uuid.uuid4().hex}"
                os.rename(hot_slice, retired)
                shutil.rmtree(retired, ignore_errors=True)
            done.append(slice_start)
        shutil.rmtree(staging, ignore_errors=True)
        return done

    def apply_retention(self, metric_type: str, cutoff_ms: int) -> list[int]:
        """B6: drop whole slices whose every point is older than cutoff —
        a partition-level delete, no data rewrite."""
        dropped = []
        with self._maintenance_lock():
            for layer in _LAYERS:
                root = self._points_path(metric_type, layer)
                if not root.exists():
                    continue
                for p in sorted(root.glob("date_slice=*")):
                    slice_start = int(p.name.split("=", 1)[1])
                    if slice_start + self.slice_ms <= cutoff_ms:
                        retired = root / f"_trash-{uuid.uuid4().hex}"
                        os.rename(p, retired)
                        shutil.rmtree(retired, ignore_errors=True)
                        dropped.append(slice_start)
        return dropped

    def apply_row_retention(
        self,
        metric_type: str,
        cutoffs: DataFrame,
        default_cutoff_ms: int,
    ) -> int:
        """B6 with per-metric TTLs: ``cutoffs`` is a small frame
        ``(tenant_id, metric, cutoff_ms)``; rows older than their series'
        cutoff (or ``default_cutoff_ms``) are removed by rewriting only
        the slices that can contain them.  Whole-slice drops should be
        done first via :meth:`apply_retention` (cheaper).  Returns the
        number of rewritten slice partitions."""
        with self._maintenance_lock():
            return self._apply_row_retention_locked(
                metric_type, cutoffs, default_cutoff_ms
            )

    def _apply_row_retention_locked(
        self,
        metric_type: str,
        cutoffs: DataFrame,
        default_cutoff_ms: int,
    ) -> int:
        max_cutoff_row = cutoffs.agg(F.max("cutoff_ms")).collect()[0][0]
        max_cutoff = max(default_cutoff_ms, max_cutoff_row or 0)
        rewritten = 0
        for layer in _LAYERS:
            root = self._points_path(metric_type, layer)
            if not root.exists():
                continue
            affected = [
                int(p.name.split("=", 1)[1])
                for p in root.glob("date_slice=*")
                if int(p.name.split("=", 1)[1]) < max_cutoff
            ]
            if not affected:
                continue
            df = self._read_layer(metric_type, layer).filter(
                F.col("date_slice").isin(affected)
            )
            kept = (
                df.join(F.broadcast(cutoffs), ["tenant_id", "metric"], "left")
                .filter(
                    F.col("ts")
                    >= F.coalesce(F.col("cutoff_ms"), F.lit(default_cutoff_ms))
                )
                .select(
                    "tenant_id", "metric", "ts", "value", "tags",
                    "ingest_seq", "date_slice", "tenant_bucket",
                )
            )
            staging = self.base / "_staging" / f"ret_{metric_type}_{layer}"
            kept.write.mode("overwrite").option("compression", "zstd").partitionBy(
                "date_slice", "tenant_bucket"
            ).parquet(str(staging))
            for slice_start in affected:
                dst = root / f"date_slice={slice_start}"
                src = staging / f"date_slice={slice_start}"
                if src.exists():
                    self._swap_in(src, dst)
                elif dst.exists():  # every row in the slice expired
                    retired = root / f"_trash-{uuid.uuid4().hex}"
                    os.rename(dst, retired)
                    shutil.rmtree(retired, ignore_errors=True)
                rewritten += 1
            shutil.rmtree(staging, ignore_errors=True)
        return rewritten

    def delete_tenant(self, tenant_id: str) -> None:
        """B7: cascading delete — rewrite affected tenant_bucket partitions
        without the tenant's rows, and scrub the definition tables
        *including* the tenant row itself (DeleteTenant.java:53,103-104 —
        a re-created tenant must not inherit stale retention policies)."""
        with self._maintenance_lock():
            self._delete_tenant_locked(tenant_id)

    def _delete_tenant_locked(self, tenant_id: str) -> None:
        bucket = self._tenant_bucket_of(tenant_id)
        for metric_type in MetricType.USER_WRITABLE:
            for layer in _LAYERS:
                root = self._points_path(metric_type, layer)
                if not root.exists():
                    continue
                matches = list(root.glob(f"date_slice=*/tenant_bucket={bucket}"))
                if not matches:
                    continue
                df = self._read_layer(metric_type, layer)
                kept = df.filter(
                    (F.col("tenant_bucket") == bucket)
                    & (F.col("tenant_id") != tenant_id)
                ).select(
                    "tenant_id", "metric", "ts", "value", "tags",
                    "ingest_seq", "date_slice", "tenant_bucket",
                )
                staging = self.base / "_staging" / f"del_{metric_type}_{layer}"
                kept.write.mode("overwrite").partitionBy(
                    "date_slice", "tenant_bucket"
                ).parquet(str(staging))
                for m in matches:
                    shutil.rmtree(m)
                for sdir in Path(staging).glob(
                    f"date_slice=*/tenant_bucket={bucket}"
                ):
                    dst = root / sdir.parent.name / sdir.name
                    dst.parent.mkdir(parents=True, exist_ok=True)
                    shutil.move(str(sdir), str(dst))
                shutil.rmtree(staging, ignore_errors=True)
        # definitions
        idx = self.metrics_idx()
        if idx is not None:
            self.save_metrics_idx(idx.filter(F.col("tenant_id") != tenant_id))
        tenants = self.tenants()
        if tenants is not None:
            self.save_tenants(tenants.filter(F.col("id") != tenant_id))

    def delete_metric(
        self,
        metric_type: str,
        tenant_id: str,
        metric: str,
        include_cold: bool = False,
    ) -> int:
        """Reference ``deleteMetric`` (MetricsServiceImpl.java:1086-1097):
        purge the metric's raw (hot-layer) rows.  The reference leaves
        compressed data in place ("compressed data is not deleted due to
        using TWCS", :1087) and lets retention expire it; ``include_cold``
        opts into a full purge.  Returns rewritten partition count."""
        with self._maintenance_lock():
            return self._delete_metric_locked(
                metric_type, tenant_id, metric, include_cold
            )

    def _delete_metric_locked(
        self, metric_type: str, tenant_id: str, metric: str, include_cold: bool
    ) -> int:
        bucket = self._tenant_bucket_of(tenant_id)
        target = (
            (F.col("tenant_bucket") == bucket)
            & (F.col("tenant_id") == tenant_id)
            & (F.col("metric") == metric)
        )
        rewritten = 0
        for layer in _LAYERS if include_cold else ("hot",):
            root = self._points_path(metric_type, layer)
            if not root.exists():
                continue
            df = self._read_layer(metric_type, layer)
            # one pruned scan lists the slices that actually hold the
            # metric — only those partitions get rewritten
            affected = [
                r["date_slice"]
                for r in df.filter(target).select("date_slice").distinct().collect()
            ]
            if not affected:
                continue
            kept = df.filter(
                F.col("date_slice").isin(affected)
                & (F.col("tenant_bucket") == bucket)
                & ~((F.col("tenant_id") == tenant_id) & (F.col("metric") == metric))
            ).select(
                "tenant_id", "metric", "ts", "value", "tags",
                "ingest_seq", "date_slice", "tenant_bucket",
            )
            staging = self.base / "_staging" / f"delm_{metric_type}_{layer}"
            kept.write.mode("overwrite").option("compression", "zstd").partitionBy(
                "date_slice", "tenant_bucket"
            ).parquet(str(staging))
            for slice_start in affected:
                part = f"date_slice={slice_start}/tenant_bucket={bucket}"
                src, dst = staging / part, root / part
                if src.exists():
                    self._swap_in(src, dst)
                elif dst.exists():  # the metric was the bucket's only data
                    retired = root / f"_trash-{uuid.uuid4().hex}"
                    os.rename(dst, retired)
                    shutil.rmtree(retired, ignore_errors=True)
                rewritten += 1
            shutil.rmtree(staging, ignore_errors=True)
        return rewritten

    # -- definition tables (metrics_idx / tenants) ---------------------------

    def metrics_idx(self) -> DataFrame | None:
        path = self.base / "metrics_idx"
        if not path.exists():
            return None
        return self.spark.read.schema(METRICS_IDX_SCHEMA).parquet(str(path))

    def save_metrics_idx(self, df: DataFrame) -> None:
        staging = self.base / "_staging" / "metrics_idx"
        df.coalesce(1).write.mode("overwrite").parquet(str(staging))
        self._swap_in(staging, self.base / "metrics_idx")

    def upsert_metric_definitions(self, df: DataFrame) -> None:
        """Create-or-replace metric definitions keyed by (tenant, type, metric)."""
        existing = self.metrics_idx()
        if existing is not None:
            merged = df.unionByName(
                existing.join(
                    df.select("tenant_id", "type", "metric"),
                    ["tenant_id", "type", "metric"],
                    "left_anti",
                )
            )
        else:
            merged = df
        self.save_metrics_idx(merged)

    def tenants(self) -> DataFrame | None:
        path = self.base / "tenants"
        if not path.exists():
            return None
        return self.spark.read.schema(TENANTS_SCHEMA).parquet(str(path))

    def save_tenants(self, df: DataFrame) -> None:
        staging = self.base / "_staging" / "tenants"
        df.coalesce(1).write.mode("overwrite").parquet(str(staging))
        self._swap_in(staging, self.base / "tenants")

    # -- expiration index analogue (B9) ---------------------------------------

    def expiration_index(self, metric_type: str) -> DataFrame:
        """Last-write tracking per metric (metrics_expiration_idx,
        schema-0.26.0.groovy:23-30): derived, not maintained — one agg."""
        return (
            self.points(metric_type, dedup=False)
            .groupBy("tenant_id", "metric")
            .agg(F.max("ts").alias("last_write_ts"))
        )

    def refresh_expiration_index(self, metric_type: str) -> int:
        """Persist a snapshot of :meth:`expiration_index` (the reference
        maintains metrics_expiration_idx as a table; here the maintenance
        pass materializes it so expiration queries don't rescan points).
        Returns the row count of the refreshed snapshot."""
        df = self.expiration_index(metric_type)
        staging = self.base / "_staging" / f"expiration_idx_{metric_type}"
        df.coalesce(1).write.mode("overwrite").parquet(str(staging))
        target = self.base / "expiration_idx" / metric_type
        self._swap_in(staging, target)
        return self.spark.read.parquet(str(target)).count()

    def expiration_index_snapshot(self, metric_type: str) -> DataFrame | None:
        """The last persisted expiration index, or None if maintenance has
        never run for this type."""
        path = self.base / "expiration_idx" / metric_type
        if not path.exists():
            return None
        return self.spark.read.parquet(str(path))
