"""Streaming W15: live ordered-funnel progression — the continuous
twin of ``operators/funnel.py funnel_steps``.

The batch operator chains per-user min aggregations; a stream instead
carries each user's funnel position as state (anchor time, steps
completed, last completion time — four scalars per user, independent
of throughput) via ``applyInPandasWithState`` and emits one row per
STEP ADVANCE.  Over an in-order replay of the same events, the
distinct users emitted at step k equal the batch funnel's step-k count
(tested) — the same in-order contract as the z-score twin; the batch
path owns out-of-order history.

Advances are idempotent under same-ts replays by construction: a
replayed event's type no longer matches the NEXT expected step, so it
is ignored; the cross-batch ``last_ts`` guard handles whole-batch
replays like the sibling twins.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("step_idx", IntegerType(), False),
        StructField("step", StringType(), False),
        StructField("ts", LongType(), False),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType(), True),
        StructField("t1", LongType(), True),
        StructField("k", IntegerType(), True),
        StructField("tk", LongType(), True),
    ]
)


def _make_funnel_fn(steps: Sequence[str], window_ms: int | None):
    steps = list(steps)
    n_steps = len(steps)

    def _group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts, t1, k, tk = state.get
        else:
            last_ts, t1, k, tk = None, None, 0, None

        out: dict[str, list] = {"step_idx": [], "step": [], "ts": []}
        entry_ts = last_ts  # replay guard, same as the z-score twin
        frames = list(pdfs)
        merged = pd.concat(frames) if frames else pd.DataFrame()
        if len(merged):
            merged = merged.sort_values(["ts", "metric"])
            for ts, et in zip(merged["ts"], merged["metric"]):
                ts = int(ts)
                if entry_ts is not None and ts <= entry_ts:
                    continue
                last_ts = ts
                if k >= n_steps or et != steps[k]:
                    continue
                if k == 0:
                    t1, tk = ts, ts
                else:
                    if ts <= tk:
                        continue  # strict ordering
                    if window_ms is not None and ts > t1 + window_ms:
                        continue
                    tk = ts
                k += 1
                out["step_idx"].append(k)
                out["step"].append(steps[k - 1])
                out["ts"].append(ts)

        state.update((last_ts, t1, k, tk))
        if out["ts"]:
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "step_idx": out["step_idx"],
                    "step": out["step"],
                    "ts": out["ts"],
                }
            )

    return _group


def streaming_funnel(
    stream_df: DataFrame,
    steps: Sequence[str],
    window_ms: int | None = None,
) -> DataFrame:
    """Input: streaming ``(user_id, metric, ts)`` events.  Output
    stream: one append row per funnel ADVANCE — (user, step_idx, step,
    completion ts).  ``groupBy(step).approx/exact count distinct`` on
    the sink gives the live conversion table; over an in-order replay
    the per-step user sets equal the batch ``funnel_steps`` counts.
    State is four scalars per user."""
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _make_funnel_fn(steps, window_ms),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
