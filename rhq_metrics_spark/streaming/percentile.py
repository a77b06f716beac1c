"""Streaming P² percentile: per-series running estimates over a live
point stream.

This is literally what the reference's production read path does —
NumericDataPointCollector.java:45-61 streams points through a
PSquarePercentile per requested quantile — expressed as
``applyInPandasWithState``: the P² marker state (5 heights + 5
positions + desired positions, ~15 doubles per quantile) rides the
state store, and each arriving point emits the series' updated
estimate.  A replay of the same points in the same order produces the
same estimates as the batch ``P2Estimator`` — asserted in tests.

State is O(quantiles) per series, independent of throughput.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from rhq_metrics_spark.operators.percentile import P2Estimator
from rhq_metrics_spark.operators.stats import percentile_col_name


def _pack(ests: list[P2Estimator]) -> list[float]:
    out: list[float] = []
    for e in ests:
        if e.q:  # warmed up: 5 markers
            out += [1.0, *e.q, *map(float, e.pos), *e.want]
        else:
            out += [0.0, float(len(e.n)), *e.n, *([0.0] * (14 - len(e.n)))]
    return out


def _unpack(flat: list[float], qs: list[float]) -> list[P2Estimator]:
    ests = []
    for i, q in enumerate(qs):
        chunk = flat[i * 16:(i + 1) * 16]
        e = P2Estimator(q)
        if chunk[0] >= 1.0:
            e.n = [0.0] * 5  # marks warmed-up (len>=5); raw obs unused
            e.q = list(chunk[1:6])
            e.pos = [int(x) for x in chunk[6:11]]
            e.want = list(chunk[11:16])
        else:
            k = int(chunk[1])
            e.n = list(chunk[2:2 + k])
        ests.append(e)
    return ests


def _make_p2_fn(qs: list[float], cols: list[str]):
    def _group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        tenant_id, metric = key
        if state.exists:
            last_ts, flat = state.get
            ests = _unpack(list(flat or []), qs)
        else:
            last_ts, ests = None, [P2Estimator(q) for q in qs]

        out: dict[str, list] = {"ts": [], "value": []}
        for c in cols:
            out[c] = []
        # Replay guard = last_ts at batch entry; same-ts points within
        # this batch all feed the estimators in (ts, value) order —
        # matching the batch p2 order_cols (ADVICE r3).  A same-ts pair
        # split across micro-batches still drops the later arrival.
        entry_ts = last_ts
        frames = list(pdfs)
        merged = pd.concat(frames) if frames else pd.DataFrame()
        if len(merged):
            merged = merged.sort_values(["ts", "value"])
            for ts, value in zip(merged["ts"], merged["value"]):
                ts, value = int(ts), float(value)
                if entry_ts is not None and ts <= entry_ts:
                    continue  # late/replayed — batch path owns history
                for e in ests:
                    e.add(value)
                out["ts"].append(ts)
                out["value"].append(value)
                for c, e in zip(cols, ests):
                    out[c].append(e.result())
                last_ts = ts

        state.update((last_ts, _pack(ests)))
        if out["ts"]:
            yield pd.DataFrame(
                {"tenant_id": tenant_id, "metric": metric, **out}
            )

    return _group


def streaming_p2(
    stream_df: DataFrame,
    percentiles: Sequence[float],
) -> DataFrame:
    """Input: streaming ``(tenant_id, metric, ts, value)``.  Output
    stream: one row per point with the series' running P² estimate for
    each quantile (percent units) — identical values to feeding the
    batch ``P2Estimator`` the same points in the same order."""
    qs = [float(q) / 100.0 for q in percentiles]
    cols = [percentile_col_name(float(q)) for q in percentiles]
    out_schema = StructType(
        [
            StructField("tenant_id", StringType(), False),
            StructField("metric", StringType(), False),
            StructField("ts", LongType(), False),
            StructField("value", DoubleType(), False),
        ]
        + [StructField(c, DoubleType(), True) for c in cols]
    )
    state_schema = StructType(
        [
            StructField("last_ts", LongType(), True),
            StructField("markers", ArrayType(DoubleType()), True),
        ]
    )

    return stream_df.groupBy("tenant_id", "metric").applyInPandasWithState(
        _make_p2_fn(qs, cols),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
