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


# ---------------------------------------------------------------------------
# Streaming W12: two-window mean-shift changepoints — continuous twin
# of operators/anomaly.py:mean_shift_changepoints.

CHANGEPOINT_OUTPUT_SCHEMA = StructType(
    [
        StructField("tenant_id", StringType(), False),
        StructField("metric", StringType(), False),
        StructField("ts", LongType(), False),
        StructField("value", DoubleType(), False),
        StructField("n_prev", LongType(), False),
        StructField("n_next", LongType(), False),
        StructField("mean_prev", DoubleType(), False),
        StructField("mean_next", DoubleType(), False),
        StructField("score", DoubleType(), True),
        StructField("is_change", BooleanType(), False),
    ]
)

CHANGEPOINT_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType(), True),
        StructField("ts_buf", ArrayType(LongType()), True),
        StructField("vq_buf", ArrayType(LongType()), True),
        StructField("val_buf", ArrayType(DoubleType()), True),
    ]
)


def _quantize_half_up(value: float, scale: int) -> int:
    """Mirror Spark's F.round(v * scale) HALF_UP (away from zero on
    .5), not Python's banker's round."""
    x = value * scale
    if x >= 0:
        return int(math.floor(x + 0.5))
    return -int(math.floor(-x + 0.5))


def _make_changepoint_fn(
    window_n: int, min_n: int, threshold: float, value_scale: int
):
    def _group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        tenant_id, metric = key
        if state.exists:
            last_ts, ts_buf, vq_buf, val_buf = state.get
            ts_buf = list(ts_buf or [])
            vq_buf = list(vq_buf or [])
            val_buf = list(val_buf or [])
        else:
            last_ts, ts_buf, vq_buf, val_buf = None, [], [], []

        cols = ("ts", "value", "n_prev", "n_next",
                "mean_prev", "mean_next", "score", "flag")
        out: dict[str, list] = {c: [] for c in cols}
        entry_ts = last_ts  # same replay guard as streaming_zscore
        frames = list(pdfs)
        merged = pd.concat(frames) if frames else pd.DataFrame()
        if len(merged):
            merged = merged.sort_values(["ts", "value"])
            for ts, value in zip(merged["ts"], merged["value"]):
                ts, value = int(ts), float(value)
                if entry_ts is not None and ts <= entry_ts:
                    continue
                ts_buf.append(ts)
                vq_buf.append(_quantize_half_up(value, value_scale))
                val_buf.append(value)
                last_ts = ts
                # this append completes exactly one point's LEADING
                # frame: the one window_n positions back
                j = len(vq_buf) - 1 - window_n
                if j < 0:
                    continue
                lo = max(0, j - window_n + 1)
                prev = vq_buf[lo : j + 1]
                nxt = vq_buf[j + 1 : j + 1 + window_n]
                n_p, n_n = len(prev), len(nxt)
                s_p, s_n = sum(prev), sum(nxt)
                sq_p = sum(v * v for v in prev)
                sq_n = sum(v * v for v in nxt)
                # the batch operator's FIXED IEEE op sequence, on the
                # same exact int64 partials -> bit-identical doubles
                m_p, m_n = s_p / n_p, s_n / n_n
                var_p = max(sq_p / n_p - m_p * m_p, 0.0)
                var_n = max(sq_n / n_n - m_n * m_n, 0.0)
                pooled = math.sqrt((var_p * n_p + var_n * n_n) / (n_p + n_n))
                score = None
                if n_p >= min_n and n_n >= min_n and pooled > 0:
                    score = (m_n - m_p) / pooled
                out["ts"].append(ts_buf[j])
                out["value"].append(val_buf[j])
                out["n_prev"].append(n_p)
                out["n_next"].append(n_n)
                out["mean_prev"].append(m_p / value_scale)
                out["mean_next"].append(m_n / value_scale)
                out["score"].append(score)
                out["flag"].append(
                    score is not None and abs(score) > threshold
                )
                # finalized prefix only ever needs window_n - 1 rows of
                # history before the NEXT candidate: cap at 2x window_n
                if len(vq_buf) > 2 * window_n:
                    ts_buf.pop(0)
                    vq_buf.pop(0)
                    val_buf.pop(0)

        state.update((last_ts, ts_buf, vq_buf, val_buf))
        if out["ts"]:
            yield pd.DataFrame(
                {
                    "tenant_id": tenant_id,
                    "metric": metric,
                    "ts": out["ts"],
                    "value": out["value"],
                    "n_prev": out["n_prev"],
                    "n_next": out["n_next"],
                    "mean_prev": out["mean_prev"],
                    "mean_next": out["mean_next"],
                    "score": out["score"],
                    "is_change": out["flag"],
                }
            )

    return _group


def streaming_changepoints(
    stream_df: DataFrame,
    window_n: int = 10,
    min_n: int = 5,
    threshold: float = 3.0,
    value_scale: int = 100,
) -> DataFrame:
    """Input: streaming ``(tenant_id, metric, ts, value)``.  Output
    stream: one mean-shift row per point, emitted once ``window_n``
    successors have arrived (a point's LEADING frame needs the future,
    so the stream runs exactly ``window_n`` points behind the head —
    the inherent latency of a two-sided detector, not an
    approximation).  Emitted rows are bit-identical to the batch
    ``mean_shift_changepoints`` rows whose leading frame is complete
    (``n_next == window_n``) over a replay of the same points: same
    HALF_UP quantization, same exact int64 frame partials, same fixed
    IEEE op sequence.  The trailing ``window_n`` points of a quiet
    series stay pending until new points (or the batch path) cover
    them — the same finalization contract as the watermark-based
    twins.

    State per series is ≤ ``2 × window_n`` (ts, long, double) triples —
    throughput-independent, ~500 bytes at the default 10.
    """
    return stream_df.groupBy("tenant_id", "metric").applyInPandasWithState(
        _make_changepoint_fn(window_n, min_n, threshold, value_scale),
        outputStructType=CHANGEPOINT_OUTPUT_SCHEMA,
        stateStructType=CHANGEPOINT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
