"""Tests for operators/downsample.py — min/max decimation, LTTB, value
histograms."""

import numpy as np
import pytest

from rhq_metrics_spark.operators.downsample import (
    lttb,
    lttb_select,
    minmax_downsample,
    value_histogram,
)

HOUR = 3_600_000


def _pts(spark, rows):
    return spark.createDataFrame(rows, "metric string, ts long, value double")


def test_minmax_keeps_extreme_points(spark):
    rows = [
        ("m", 0, 5.0), ("m", 10, 1.0), ("m", 20, 9.0), ("m", 30, 3.0),
        ("m", HOUR + 1, 7.0),
    ]
    out = {
        (r["kind"], r["bucket_start"]): (r["ts"], r["value"])
        for r in minmax_downsample(_pts(spark, rows), HOUR).collect()
    }
    assert out[("min", 0)] == (10, 1.0)
    assert out[("max", 0)] == (20, 9.0)
    # single-point bucket: both kinds at that point
    assert out[("min", HOUR)] == out[("max", HOUR)] == (HOUR + 1, 7.0)


def test_minmax_value_ties_take_earliest_ts(spark):
    rows = [("m", 5, 2.0), ("m", 1, 2.0), ("m", 3, 2.0)]
    out = {
        r["kind"]: r["ts"]
        for r in minmax_downsample(_pts(spark, rows), HOUR).collect()
    }
    assert out == {"min": 1, "max": 1}


def _lttb_reference(ts, vals, n_out):
    """Straight-from-the-thesis scalar implementation."""
    n = len(ts)
    if n_out >= n:
        return list(range(n))
    edges = np.linspace(1, n - 1, n_out - 1).astype(int)
    out = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo, nhi = edges[i + 1], (edges[i + 2] if i + 2 < len(edges) else n)
        cx = sum(ts[nlo:nhi]) / (nhi - nlo)
        cy = sum(vals[nlo:nhi]) / (nhi - nlo)
        best, besta = -1.0, lo
        for j in range(lo, hi):
            area = abs(
                (ts[a] - cx) * (vals[j] - vals[a])
                - (ts[a] - ts[j]) * (cy - vals[a])
            )
            if area > best:
                best, besta = area, j
        a = besta
        out.append(a)
    out.append(n - 1)
    return out


def test_lttb_select_matches_reference():
    rng = np.random.RandomState(9)
    ts = np.arange(500, dtype=np.float64) * 7
    vals = np.cumsum(rng.randn(500))
    for n_out in (3, 10, 100, 499):
        got = lttb_select(ts, vals, n_out).tolist()
        want = _lttb_reference(ts.tolist(), vals.tolist(), n_out)
        assert got == want, n_out


def test_lttb_keeps_endpoints_and_spikes(spark):
    vals = [0.0] * 100
    vals[37] = 100.0  # a spike LTTB must keep
    rows = [("m", t * 1000, v) for t, v in enumerate(vals)]
    out = lttb(_pts(spark, rows), 10).collect()
    got_ts = sorted(r["ts"] for r in out)
    assert len(out) == 10
    assert got_ts[0] == 0 and got_ts[-1] == 99_000
    assert 37_000 in got_ts


def test_lttb_short_series_passthrough(spark):
    rows = [("m", i, float(i)) for i in range(5)]
    assert lttb(_pts(spark, rows), 10).count() == 5


def test_lttb_multiple_series_independent(spark):
    rows = [("a", i * 100, float(i % 7)) for i in range(200)]
    rows += [("b", i * 100, float(-i)) for i in range(50)]
    out = lttb(_pts(spark, rows), 20).collect()
    by = {}
    for r in out:
        by.setdefault(r["metric"], []).append(r)
    assert len(by["a"]) == 20 and len(by["b"]) == 20


def test_histogram_bins_and_clamping(spark):
    rows = [("m", 0, -5.0), ("m", 1, 0.0), ("m", 2, 31.9), ("m", 3, 32.0),
            ("m", 4, 999.0)]
    out = {
        r["bin"]: (r["bin_lo"], r["count"])
        for r in value_histogram(_pts(spark, rows), 0.0, 512.0, 16).collect()
    }
    assert out[0] == (0.0, 3)   # -5 clamps in; 0.0 and 31.9 inside
    assert out[1] == (32.0, 1)  # boundary value goes to its own bin
    assert out[15] == (480.0, 1)  # 999 clamps to the last bin


def test_histogram_validation(spark):
    df = _pts(spark, [("m", 0, 1.0)])
    with pytest.raises(ValueError):
        value_histogram(df, 0.0, 0.0, 4)
    with pytest.raises(ValueError):
        value_histogram(df, 0.0, 1.0, 0)
