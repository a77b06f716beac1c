"""Streaming A2 companion: turn a live availability-point stream into
closed STATE SEGMENTS ``(state, seg_start, seg_end)`` per series.

The batch A2 operator (operators/availability.py) derives durations
from adjacent-point pairs with ``lag``; a stream can't see the previous
micro-batch's point, so this keeps ``(last_ts, last_state)`` per series
via ``applyInPandasWithState`` and emits one segment per consecutive
pair — exactly the lag pairs the batch operator would see on a replay.
Downstream, segments are plain rows: windowed uptime is a JVM
aggregation over them (duration-weight each segment into the buckets it
overlaps via ``interval_join`` on the bucket grid, or group whole
segments when buckets align), so the stateful part stays O(1) per
series and the math stays in codegen.

State: one (long, string) per series — independent of throughput.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SEGMENT_OUTPUT_SCHEMA = StructType(
    [
        StructField("tenant_id", StringType(), False),
        StructField("metric", StringType(), False),
        StructField("state", StringType(), False),
        StructField("seg_start", LongType(), False),
        StructField("seg_end", LongType(), False),
    ]
)

SEGMENT_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType(), True),
        StructField("last_state", StringType(), True),
    ]
)


def _segments_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    tenant_id, metric = key
    if state.exists:
        last_ts, last_state = state.get
    else:
        last_ts, last_state = None, None

    out: dict[str, list] = {"state": [], "start": [], "end": []}
    # Replay guard = last_ts at batch entry; distinct same-ts points
    # within this batch are processed in deterministic (ts, value) order
    # (the batch lag orders by ts alone, leaving ties unspecified — the
    # streaming path pins them; ADVICE r3).  Same-ts segments are
    # zero-length and duration-free downstream.  A same-ts pair split
    # across micro-batches still drops the later arrival.
    entry_ts = last_ts
    frames = list(pdfs)
    merged = pd.concat(frames) if frames else pd.DataFrame()
    if len(merged):
        merged = merged.sort_values(["ts", "value"])
        for ts, value in zip(merged["ts"], merged["value"]):
            ts = int(ts)
            if entry_ts is not None and ts <= entry_ts:
                continue  # late/replayed — batch path owns history
            if last_ts is not None:
                out["state"].append(last_state)
                out["start"].append(last_ts)
                out["end"].append(ts)
            last_ts, last_state = ts, str(value)

    state.update((last_ts, last_state))
    if out["state"]:
        yield pd.DataFrame(
            {
                "tenant_id": tenant_id,
                "metric": metric,
                "state": out["state"],
                "seg_start": out["start"],
                "seg_end": out["end"],
            }
        )


def streaming_state_segments(stream_df: DataFrame) -> DataFrame:
    """Input: streaming ``(tenant_id, metric, ts, value)`` availability
    points (value = state string).  Output stream: one CLOSED segment
    per consecutive pair — identical to the batch lag pairs over a
    replay of the same points.  The open tail segment stays in state
    until the next point closes it (matching A2, which only counts time
    between observations)."""
    return stream_df.groupBy("tenant_id", "metric").applyInPandasWithState(
        _segments_group,
        outputStructType=SEGMENT_OUTPUT_SCHEMA,
        stateStructType=SEGMENT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
