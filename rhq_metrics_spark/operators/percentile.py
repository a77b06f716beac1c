"""P² (P-square) streaming percentile estimation.

The reference's PRODUCTION percentile path is a P² estimator fed in
arrival order (NumericDataPointCollector.java:45-61 wraps a
PSquarePercentile per requested quantile); its tests use exact
percentiles, which is what this engine's default stats path matches.
This module supplies the production-parity option: the textbook P²
algorithm (Jain & Chlamtac, CACM 1985 — five markers, parabolic
adjustment), usable standalone or over Spark groups.

P² is ORDER-DEPENDENT by construction: feeding the same points in a
different order gives a (slightly) different estimate.  The Spark entry
point therefore requires an explicit order — per-series time order,
exactly what the reference's collector sees — which makes results
deterministic for a given dataset.

Scale shape: one `applyInPandas` per (series, bucket) group; state is
five markers per (group, quantile) and each group's points stream
through a single sorted pass — O(points) work, O(1) memory per group,
no shuffle beyond the one keyed exchange every bucket-stats query
already pays.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rhq_metrics_spark.operators.stats import percentile_col_name


class P2Estimator:
    """Single-quantile P² estimator (Jain & Chlamtac 1985).

    Pure Python so the same code is the Spark UDF's kernel AND the test
    oracle; exact (sorted linear interpolation, the R-7 rule) below 5
    observations like the reference's small-sample behavior."""

    __slots__ = ("p", "n", "q", "pos", "want", "dwant")

    def __init__(self, p: float):
        if not 0.0 < p < 1.0:
            raise ValueError(f"quantile must be in (0, 1): {p}")
        self.p = p
        self.n: list[float] = []  # first 5 raw observations, then unused
        self.q: list[float] = []
        self.pos: list[int] = []
        self.want: list[float] = []
        self.dwant = [0.0, p / 2.0, p, (1.0 + p) / 2.0, 1.0]

    def add(self, x: float) -> None:
        p = self.p
        if len(self.n) < 5:
            self.n.append(x)
            if len(self.n) == 5:
                self.q = sorted(self.n)
                self.pos = [1, 2, 3, 4, 5]
                self.want = [1.0, 1.0 + 2.0 * p, 1.0 + 4.0 * p,
                             3.0 + 2.0 * p, 5.0]
            return
        q, pos = self.q, self.pos
        if x < q[0]:
            q[0] = x
            k = 0
        elif x >= q[4]:
            q[4] = x
            k = 3
        else:
            k = 0
            while x >= q[k + 1]:
                k += 1
        for i in range(k + 1, 5):
            pos[i] += 1
        for i in range(5):
            self.want[i] += self.dwant[i]
        for i in (1, 2, 3):
            d = self.want[i] - pos[i]
            if (d >= 1.0 and pos[i + 1] - pos[i] > 1) or (
                d <= -1.0 and pos[i - 1] - pos[i] < -1
            ):
                s = 1 if d >= 0 else -1
                qi = self._parabolic(i, s)
                if not (q[i - 1] < qi < q[i + 1]):
                    qi = self._linear(i, s)
                q[i] = qi
                pos[i] += s

    def _parabolic(self, i: int, s: int) -> float:
        q, n = self.q, self.pos
        return q[i] + s / float(n[i + 1] - n[i - 1]) * (
            (n[i] - n[i - 1] + s) * (q[i + 1] - q[i]) / (n[i + 1] - n[i])
            + (n[i + 1] - n[i] - s) * (q[i] - q[i - 1]) / (n[i] - n[i - 1])
        )

    def _linear(self, i: int, s: int) -> float:
        q, n = self.q, self.pos
        return q[i] + s * (q[i + s] - q[i]) / float(n[i + s] - n[i])

    def result(self) -> float | None:
        if not self.n:
            return None
        if len(self.n) < 5 or not self.q:
            xs = sorted(self.n)
            # R-7 linear interpolation (numpy default) for small samples
            h = (len(xs) - 1) * self.p
            lo = int(h)
            hi = min(lo + 1, len(xs) - 1)
            return xs[lo] + (h - lo) * (xs[hi] - xs[lo])
        return self.q[2]


def p2_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    percentiles: Sequence[float],
    value_col: str = "value",
) -> DataFrame:
    """Per-group P² percentile estimates, feeding each group's values in
    ``order_cols`` order (use the series' time order for reference
    parity).  Output: group cols + ``samples`` + one
    ``percentile_<q>`` column per requested q (percent units, like the
    exact stats path)."""
    group_cols = list(group_cols)
    order_cols = list(order_cols)
    qs = [float(q) for q in percentiles]
    out_fields = ", ".join(
        f"`{percentile_col_name(q)}` double" for q in qs
    )
    schema_parts = [
        f"`{c}` {t}" for c, t in df.select(*group_cols).dtypes
    ] + ["samples bigint", out_fields]
    out_schema = ", ".join(s for s in schema_parts if s)

    def _per_group(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_cols, kind="mergesort")
        ests = [P2Estimator(q / 100.0) for q in qs]
        vals = pdf[value_col].astype(float)
        for x in vals:
            for e in ests:
                e.add(x)
        row = {c: pdf[c].iloc[0] for c in group_cols}
        row["samples"] = len(vals)
        for q, e in zip(qs, ests):
            row[percentile_col_name(q)] = e.result()
        return pd.DataFrame([row])

    return df.groupBy(*group_cols).applyInPandas(_per_group, out_schema)
