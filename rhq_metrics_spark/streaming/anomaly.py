"""Streaming W5: rolling z-score anomaly flags over a live point
stream — the continuous twin of ``operators/anomaly.py``.

The batch operator computes each point's baseline from a trailing
window frame; a stream can't re-read the previous micro-batch, so the
per-series state is the trailing ring of the last ``window_n`` values
plus their running sum / sum-of-squares, held via
``applyInPandasWithState``.  Semantics match the batch path exactly
(baseline = the ``window_n`` points strictly before the current one,
``min_n`` floor, zero-variance guard), so a stream and a batch replay
of the same points produce identical flags.

State is O(``window_n``) doubles per series — independent of
throughput; with the default 20 that's ~200 bytes/series, fine for
millions of live series per executor.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ANOMALY_OUTPUT_SCHEMA = StructType(
    [
        StructField("tenant_id", StringType(), False),
        StructField("metric", StringType(), False),
        StructField("ts", LongType(), False),
        StructField("value", DoubleType(), False),
        StructField("z", DoubleType(), True),
        StructField("is_anomaly", BooleanType(), False),
    ]
)

ANOMALY_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType(), True),
        StructField("ring", ArrayType(DoubleType()), True),
    ]
)


def _make_anomaly_fn(window_n: int, min_n: int, threshold: float):
    def _group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        tenant_id, metric = key
        if state.exists:
            last_ts, ring = state.get
            ring = list(ring or [])
        else:
            last_ts, ring = None, []

        out: dict[str, list] = {"ts": [], "value": [], "z": [], "flag": []}
        # Replay guard = the state's last_ts AT BATCH ENTRY: points from
        # prior micro-batches are late/replayed (batch path owns them),
        # but distinct points sharing a ts WITHIN this batch are all
        # processed, in the batch window's (ts, value) order (ADVICE r3).
        # Residual contract gap: a same-ts pair SPLIT ACROSS two
        # micro-batches still drops the later arrival.
        entry_ts = last_ts
        frames = list(pdfs)
        merged = pd.concat(frames) if frames else pd.DataFrame()
        if len(merged):
            merged = merged.sort_values(["ts", "value"])
            for ts, value in zip(merged["ts"], merged["value"]):
                ts, value = int(ts), float(value)
                if entry_ts is not None and ts <= entry_ts:
                    continue  # late/replayed — batch path owns history
                z = None
                n = len(ring)
                if n >= min_n:
                    mean = sum(ring) / n
                    var = max(sum(v * v for v in ring) / n - mean * mean, 0.0)
                    if var > 0:
                        z = round((value - mean) / math.sqrt(var), 4)
                out["ts"].append(ts)
                out["value"].append(value)
                out["z"].append(z)
                out["flag"].append(z is not None and abs(z) > threshold)
                ring.append(value)
                if len(ring) > window_n:
                    ring.pop(0)
                last_ts = ts

        state.update((last_ts, ring))
        if out["ts"]:
            yield pd.DataFrame(
                {
                    "tenant_id": tenant_id,
                    "metric": metric,
                    "ts": out["ts"],
                    "value": out["value"],
                    "z": out["z"],
                    "is_anomaly": out["flag"],
                }
            )

    return _group


def streaming_zscore(
    stream_df: DataFrame,
    window_n: int = 20,
    min_n: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Input: streaming ``(tenant_id, metric, ts, value)``.  Output
    stream: one row per point with its trailing-window z and anomaly
    flag — same numbers the batch ``rolling_zscore`` produces over a
    replay of the same points."""
    return stream_df.groupBy("tenant_id", "metric").applyInPandasWithState(
        _make_anomaly_fn(window_n, min_n, threshold),
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming W10: truncated-EWMA smoothing — continuous twin of
# operators/anomaly.py:ewma_smooth.

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("tenant_id", StringType(), False),
        StructField("metric", StringType(), False),
        StructField("ts", LongType(), False),
        StructField("value", LongType(), False),
        StructField("ewma", DoubleType(), False),
    ]
)

EWMA_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType(), True),
        StructField("ring", ArrayType(LongType()), True),
    ]
)


def _make_ewma_fn(window_n: int, alpha_num: int, alpha_den: int):
    from rhq_metrics_spark.operators.anomaly import ewma_weights

    ws = ewma_weights(window_n, alpha_num, alpha_den)

    def _group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        tenant_id, metric = key
        if state.exists:
            last_ts, ring = state.get
            ring = list(ring or [])  # oldest -> newest
        else:
            last_ts, ring = None, []

        out: dict[str, list] = {"ts": [], "value": [], "ewma": []}
        entry_ts = last_ts  # same replay guard as streaming_zscore
        frames = list(pdfs)
        merged = pd.concat(frames) if frames else pd.DataFrame()
        if len(merged):
            merged = merged.sort_values(["ts", "value"])
            for ts, value in zip(merged["ts"], merged["value"]):
                ts, value = int(ts), int(value)
                if entry_ts is not None and ts <= entry_ts:
                    continue
                ring.append(value)
                if len(ring) > window_n:
                    ring.pop(0)
                # exact Python-int num/den, ONE float division — the
                # same IEEE op the batch operator's LONG casts perform,
                # so stream == batch bit-for-bit
                newest_first = ring[::-1]
                num = sum(w * v for w, v in zip(ws, newest_first))
                den = sum(ws[: len(newest_first)])
                out["ts"].append(ts)
                out["value"].append(value)
                out["ewma"].append(num / den)
                last_ts = ts

        state.update((last_ts, ring))
        if out["ts"]:
            yield pd.DataFrame(
                {
                    "tenant_id": tenant_id,
                    "metric": metric,
                    "ts": out["ts"],
                    "value": out["value"],
                    "ewma": out["ewma"],
                }
            )

    return _group


def streaming_ewma(
    stream_df: DataFrame,
    window_n: int = 8,
    alpha_num: int = 1,
    alpha_den: int = 4,
) -> DataFrame:
    """Input: streaming ``(tenant_id, metric, ts, value)`` with values
    already integer-quantized (the batch contract).  Output stream: one
    row per point with its truncated-EWMA — bit-identical to the batch
    ``ewma_smooth`` over a replay of the same points, because both sum
    the exact integer weights/values and divide once.

    State is the trailing ring of ≤ ``window_n`` longs per series —
    O(window_n) and throughput-independent, same bound as the z-score
    twin above.
    """
    return stream_df.groupBy("tenant_id", "metric").applyInPandasWithState(
        _make_ewma_fn(window_n, alpha_num, alpha_den),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
