"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The *decode* step is a pluggable callable with two shipped
implementations:

- :func:`rhq_metrics_spark.pipelines.codecs.real_decode` — a REAL
  decoder: PNG (pure stdlib zlib + numpy, all filter types, CRC-checked)
  and PCM WAV (stdlib ``wave``); Pillow is picked up automatically when
  importable for other image formats.  Unsupported codecs raise with
  the library that would handle them — no silent fakes.
- :func:`fake_decode` — a deterministic hash-expansion pseudo-decoder,
  kept as the ORACLE FIXTURE: DuckDB can recompute its output in the
  hex domain, so the mm_* correctness rows stay cross-engine checkable
  (real pixels would need the same codec on both sides).

The Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas``
signatures, partition sizing — is identical under either decoder;
swapping changes no plan shape.

Scale notes: media payloads ride as parquet ``binary``; metadata stays
in typed columns so filters (kind, width, duration) prune row groups
WITHOUT touching the blobs (parquet column pruning — the scan never
reads payload bytes for metadata-only queries).  Decode/feature steps
are ``mapInPandas`` (Arrow-batched); batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low for
large blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("codec", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("feat_mean", StringType(), True),   # stringified for stability
        StructField("feat_sum", LongType(), True),      # exact integer checksum
        StructField("feat_dim", IntegerType(), True),
        StructField("sha256", StringType(), True),
    ]
)


def fake_decode(payload: bytes, out_elems: int = 64) -> np.ndarray:
    """STUB decoder: deterministic pseudo-pixels from a hash expansion.

    Hashes the canonical lowercase-hex form of the payload (not the raw
    bytes) so engines whose hash functions only take VARCHAR — DuckDB —
    can reproduce the expansion for oracle checks; the pseudo-pixels are
    the digest's little-endian uint32 words tiled to ``out_elems`` and
    scaled to [0, 1].  Replace with a real codec (``PIL.Image.open`` /
    ``soundfile.read``) in production — the surrounding Spark plumbing
    is unchanged.
    """
    if payload is None:
        raise NotImplementedError(
            "fake_decode got a null payload; for real media bytes use "
            "pipelines.codecs.real_decode (PNG/WAV built in, Pillow when "
            "importable) via media_features(decoder=real_decode)"
        )
    h = hashlib.sha256(payload.hex().encode()).digest()
    reps = (out_elems * 4 // len(h)) + 1
    raw = (h * reps)[: out_elems * 4]
    return np.frombuffer(raw, dtype="<u4").astype(np.float64) / np.iinfo(np.uint32).max


def media_features(
    df: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_decode,
    feat_dim: int = 64,
) -> DataFrame:
    """Decode + feature-extract media payloads via Arrow-batched
    ``mapInPandas``.  Output: FEATURE_SCHEMA (one row per media item)."""

    _u32max = int(np.iinfo(np.uint32).max)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, means, sums, shas, nb = [], [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    nb.append(None), means.append(None), shas.append(None)
                    feats.append(None), sums.append(None)
                    continue
                arr = decoder(bytes(payload))
                nb.append(len(payload))
                means.append(f"{float(arr.mean()):.10f}")
                # exact integer checksum: de-quantize back to uint32 words
                # (exact for quantized decoders like the stub; a stable
                # rounded checksum for real ones) and sum in int64
                sums.append(int(np.rint(arr * _u32max).astype(np.int64).sum()))
                # checksum of the canonical hex form — reproducible by
                # VARCHAR-only hash functions (same convention as mm_meta)
                shas.append(hashlib.sha256(bytes(payload).hex().encode()).hexdigest())
                feats.append(len(arr))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.array(nb, dtype="Int32"),
                    "feat_mean": means,
                    "feat_sum": pd.array(sums, dtype="Int64"),
                    "feat_dim": pd.array(feats, dtype="Int32"),
                    "sha256": shas,
                }
            )

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_ts_ms", LongType(), False),
    ]
)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand (media_id, duration) into one
    row per sampled frame timestamp — pure JVM ``sequence``/``explode``;
    the per-frame decode then rides :func:`media_features`' path.
    Sampling the plan before decode keeps the blob reads proportional
    to frames wanted, not media length."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def resize_plan(
    df: DataFrame,
    target_w: int,
    target_h: int,
    decoder: Callable[[bytes], np.ndarray] = fake_decode,
    real: bool = False,
) -> DataFrame:
    """Image resize: decode → resample → emit new dims + a deterministic
    checksum of the resized buffer.

    ``real=True`` runs the REAL path: :func:`codecs.decode_image`
    (pure-Python PNG or Pillow) then nearest-neighbor resampling
    (:func:`codecs.resize_nearest`) over actual pixels.  The default
    keeps the hash-expansion fixture whose checksum a SQL oracle can
    recompute.  Same ``mapInPandas`` plan either way."""

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("resized_sha", StringType(), True),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real:
            from rhq_metrics_spark.pipelines.codecs import (
                decode_image,
                resize_nearest,
            )
        for pdf in batches:
            shas = []
            for payload in pdf["payload"]:
                if payload is None:
                    shas.append(None)
                    continue
                if real:
                    img = decode_image(bytes(payload))
                    resized = np.ascontiguousarray(
                        resize_nearest(img, target_w, target_h)
                    )
                else:
                    arr = decoder(bytes(payload))                  # fixture
                    resized = np.resize(arr, target_w * target_h)  # fixture
                shas.append(hashlib.sha256(resized.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array([target_w] * len(pdf), dtype="Int32"),
                    "height": pd.array([target_h] * len(pdf), dtype="Int32"),
                    "resized_sha": shas,
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(_resize, schema=out_schema)


def media_from_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table synthesized from a text corpus (the
    container ships no media testdata): payload = unhex(md5(text)) as a
    real ``binary`` column, kind cycles image/audio/video by id, and
    typed metadata is derived arithmetically.  Gives every binary-column
    code path a reproducible input that a SQL oracle can recompute in
    the hex domain."""
    did = F.col(id_col)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (did % 3 + 1).cast("int"),
    )
    return docs.select(
        did.alias("media_id"),
        kind.alias("kind"),
        F.unhex(F.md5(F.col(text_col))).alias("payload"),
        F.when(kind == "image", (64 + did % 512).cast("int")).alias("width"),
        F.when(kind == "image", (64 + (did * 7) % 512).cast("int")).alias("height"),
        F.when(kind == "audio", F.lit(16_000)).cast("int").alias("sample_rate"),
        F.when(kind != "image", (did % 60 + 1) * 1000).cast("long").alias("duration_ms"),
        F.lit("fake/v1").alias("codec"),
    )
