"""Custom stateful streaming operator: distinct-adjacent across
micro-batches (the streaming form of A7, SURVEY.md §2.4/§2.10).

The batch operator (``operators/distinct.py``) collapses runs of equal
values with a ``lag`` window; a stream can't see the previous batch's
last value, so this keeps per-series state — the last emitted
``(ts, value)`` — via ``applyInPandasWithState`` (Arrow-batched, one
state row per series).

Semantics: within each micro-batch rows are processed in ts order
(sorted per group); a row is emitted iff its value differs from the
previously *seen* value for that series (seeded from state across
batches).  Late rows older than the stored last-ts are ignored (the
batch path over the store remains the source of truth for reordered
history — mirrors the reference's route-to-cold-layer behavior B4).

State size: O(#series), independent of throughput — safe at scale.
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

OUTPUT_SCHEMA = StructType(
    [
        StructField("tenant_id", StringType(), False),
        StructField("metric", StringType(), False),
        StructField("ts", LongType(), False),
        StructField("value", StringType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType(), True),
        StructField("last_value", StringType(), True),
    ]
)


def _dedup_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    tenant_id, metric = key
    if state.exists:
        last_ts, last_value = state.get
    else:
        last_ts, last_value = -1, None

    out_ts: list[int] = []
    out_val: list[str] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            ts = int(ts)
            if ts <= last_ts:
                continue  # late/replayed row — batch path owns history rewrites
            if value != last_value:
                out_ts.append(ts)
                out_val.append(value)
                last_value = value
            last_ts = ts

    state.update((last_ts, last_value))
    if out_ts:
        yield pd.DataFrame(
            {
                "tenant_id": tenant_id,
                "metric": metric,
                "ts": out_ts,
                "value": out_val,
            }
        )


def streaming_distinct_adjacent(stream_df: DataFrame) -> DataFrame:
    """Input: streaming frame with (tenant_id, metric, ts, value[str]).
    Output stream: only state-change rows, exactly like batch A7."""
    return (
        stream_df.groupBy("tenant_id", "metric")
        .applyInPandasWithState(
            _dedup_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
