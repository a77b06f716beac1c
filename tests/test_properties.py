"""Property-based tests (hypothesis) for the pure-Python model layer and
for operator semantics vs brute-force Python oracles.

Spark-facing properties use small row counts (collect-compare) and a
module-scoped session; the grid/parser properties are pure Python and
run hundreds of cases.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rhq_metrics_spark.model import Buckets
from rhq_metrics_spark.tags.parser import (
    And,
    Cmp,
    Exists,
    In,
    Or,
    parse_tag_query,
)

# ---------------------------------------------------------------------------
# Buckets grid arithmetic (reference: Buckets.java:129-172)


@given(
    start=st.integers(min_value=0, max_value=10**12),
    span=st.integers(min_value=1, max_value=10**10),
    count=st.integers(min_value=1, max_value=10_000),
)
@settings(max_examples=300)
def test_from_count_invariants(start, span, count):
    end = start + span
    try:
        b = Buckets.from_count(start, end, count)
    except ValueError:
        assert span // count == 0 or (count - 1) * (span // count + 1) >= span
        return
    assert b.count == count
    q, r = divmod(span, count)
    # step is the quotient, bumped only under the exact reference rule
    # (fromCount does NOT guarantee the last bucket covers `end` —
    # documented in BucketsTest.java)
    if r != 0 and (count - 1) * (q + 1) < span:
        assert b.step == q + 1
    else:
        assert b.step == q
    # every ts inside the grid lands in a valid bucket index
    for ts in (b.start, b.end - 1, b.start + (b.end - b.start) // 2):
        idx = (ts - b.start) // b.step
        assert 0 <= idx < b.count


@given(
    start=st.integers(min_value=0, max_value=10**12),
    span=st.integers(min_value=1, max_value=10**10),
    step=st.integers(min_value=1, max_value=10**9),
)
@settings(max_examples=300)
def test_from_step_invariants(start, span, step):
    end = start + span
    try:
        b = Buckets.from_step(start, end, step)
    except ValueError:
        # count > Integer.MAX_VALUE guard (Buckets.java:168-170)
        assert -(-span // step) > 2**31 - 1
        return
    assert b.step == step
    assert b.start + b.step * b.count >= end
    if step <= span:
        # minimal cover: one fewer bucket would not reach end
        assert b.start + b.step * (b.count - 1) < end


# ---------------------------------------------------------------------------
# Tag-query parser: parse(print(ast)) == ast round trip


def _render(node) -> str:
    if isinstance(node, And):
        return f"({_render(node.left)} AND {_render(node.right)})"
    if isinstance(node, Or):
        return f"({_render(node.left)} OR {_render(node.right)})"
    if isinstance(node, Cmp):
        return f"{node.key} {node.op} '{node.value}'"
    if isinstance(node, In):
        vals = ", ".join(f"'{v}'" for v in node.values)
        return f"{node.key} {'NOT IN' if node.negated else 'IN'} [{vals}]"
    if isinstance(node, Exists):
        return f"NOT {node.key}" if node.negated else node.key
    raise TypeError(node)


_key = st.from_regex(r"[a-zA-Z_][a-zA-Z_0-9.]{0,8}", fullmatch=True).filter(
    lambda s: s.upper() not in ("AND", "OR", "NOT", "IN")
)
_value = st.text(
    alphabet=st.characters(blacklist_characters="'\\", min_codepoint=32, max_codepoint=126),
    min_size=1,
    max_size=12,
)

_leaf = st.one_of(
    st.builds(lambda k, o, v: Cmp(k, o, v), _key, st.sampled_from(["=", "!=", "~", "!~"]), _value),
    st.builds(lambda k, vs, n: In(k, tuple(vs), n), _key, st.lists(_value, min_size=1, max_size=4), st.booleans()),
    st.builds(Exists, _key, st.booleans()),
)

_ast = st.recursive(
    _leaf,
    lambda children: st.one_of(
        st.builds(And, children, children),
        st.builds(Or, children, children),
    ),
    max_leaves=8,
)


@given(_ast)
@settings(max_examples=200)
def test_parser_roundtrip(ast):
    assert parse_tag_query(_render(ast)) == ast


# ---------------------------------------------------------------------------
# Operator semantics vs Python oracles (small Spark frames)

T0 = 1_700_000_000_000

_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),  # ts offset (sec)
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
    ),
    min_size=2,
    max_size=30,
    unique_by=lambda t: t[0],
)


@given(pts=_series)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rate_matches_python_oracle(spark, pts):
    from rhq_metrics_spark.operators import rate

    rows = [("t", "m", T0 + off * 1000, float(v)) for off, v in sorted(pts)]
    df = spark.createDataFrame(rows, "tenant_id string, metric string, ts long, value double")
    got = {r["ts"]: r["rate"] for r in rate(df).collect()}
    want = {}
    for r1, r2 in zip(rows, rows[1:]):
        want[r2[2]] = 60_000.0 * (r2[3] - r1[3]) / (r2[2] - r1[2])
    assert set(got) == set(want)
    for ts, r in want.items():
        assert got[ts] == pytest.approx(r)


@given(pts=_series, threshold=st.floats(min_value=-500, max_value=500, allow_nan=False))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_periods_match_python_oracle(spark, pts, threshold):
    from rhq_metrics_spark.operators import periods, predicate

    rows = [("t", "m", T0 + off * 1000, float(v)) for off, v in sorted(pts)]
    df = spark.createDataFrame(rows, "tenant_id string, metric string, ts long, value double")
    got = [
        (r["period_start"], r["period_end"])
        for r in periods(df, predicate("gt", threshold)).orderBy("period_start").collect()
    ]
    want, run = [], None
    prev_ts = None
    for _, _, ts, v in rows:
        if v > threshold:
            if run is None:
                run = ts
            prev_ts = ts
        elif run is not None:
            want.append((run, prev_ts))
            run = None
    if run is not None:
        want.append((run, prev_ts))
    assert got == want


# ---------------------------------------------------------------------------
# gapfill linear interpolation vs a pure-Python integer oracle


def _lerp_oracle(series: list[tuple[int, float | None]], scale: int = 10**4):
    """Reference implementation of operators/gapfill.py linear fill."""
    obs = [(t, v) for t, v in series if v is not None]
    out = {}
    for t, v in series:
        if v is not None:
            out[t] = v
            continue
        prev = max(((tt, vv) for tt, vv in obs if tt <= t), default=None)
        nxt = min(((tt, vv) for tt, vv in obs if tt >= t), default=None)
        if prev is None and nxt is None:
            out[t] = None
        elif prev is None:
            out[t] = nxt[1]
        elif nxt is None:
            out[t] = prev[1]
        else:
            pi, ni = round(prev[1] * scale), round(nxt[1] * scale)
            p, q = (ni - pi) * (t - prev[0]), nxt[0] - prev[0]
            sign = -1 if p < 0 else 1
            out[t] = (pi + sign * ((2 * abs(p) + q) // (2 * q))) / scale
    return out


@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.decimals(
                min_value=-10**6, max_value=10**6, places=4, allow_nan=False
            ).map(float),
        ),
        min_size=1,
        max_size=12,
    ),
    step=st.integers(min_value=1, max_value=10**7),
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_linear_fill_matches_python_oracle(spark, vals, step):
    from rhq_metrics_spark.operators.gapfill import fill_gaps

    series = [(i * step, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        [(t, v) for t, v in series], "start long, avg double"
    )
    got = {r["start"]: r["avg"] for r in fill_gaps(df, ["avg"], "linear").collect()}
    want = _lerp_oracle(series)
    assert got == want


# ---------------------------------------------------------------------------
# PII regex portability + repetition fractions vs pure-Python oracles

_PII_ALPHABET = st.sampled_from(
    list("abc XY9.-_@/:") + ["@example.com", "https://a.io/p", "10.0.0.1", "  "]
)
_pii_text = st.lists(_PII_ALPHABET, min_size=0, max_size=25).map("".join)


@given(texts=st.lists(_pii_text, min_size=1, max_size=8))
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_pii_scan_matches_python_re(spark, texts):
    """Java regex (Spark) must agree with Python re for the PII patterns
    on adversarial text — the same property the DuckDB (RE2) oracle
    relies on.  Counts AND the redacted string are compared."""
    import re

    from rhq_metrics_spark.pipelines.text import (
        EMAIL_PATTERN,
        IPV4_PATTERN,
        URL_PATTERN,
        pii_scan,
    )

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scan(df).collect()}
    for i, t in enumerate(texts):
        assert got[i]["n_emails"] == len(re.findall(EMAIL_PATTERN, t)), t
        assert got[i]["n_urls"] == len(re.findall(URL_PATTERN, t)), t
        assert got[i]["n_ips"] == len(re.findall(IPV4_PATTERN, t)), t
        want_red = re.sub(
            IPV4_PATTERN,
            "<IP>",
            re.sub(
                EMAIL_PATTERN, "<EMAIL>", re.sub(URL_PATTERN, "<URL>", t)
            ),
        )
        assert got[i]["redacted"] == want_red, t


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_repetition_stats_match_python(spark, texts):
    from rhq_metrics_spark.pipelines.text import repetition_stats

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for i, t in enumerate(texts):
        # mirror Spark split on \s+ of trimmed text: empty text -> [""]
        toks = t.strip().lower().split() if t.strip() else [""]

        def grams(n):
            return [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]

        def dup_frac(xs):
            return round(1.0 - len(set(xs)) / len(xs), 6) if xs else 0.0

        assert got[i]["n_words"] == len(toks), t
        assert got[i]["dup_word_frac"] == pytest.approx(dup_frac(toks), abs=1e-9), t
        assert got[i]["dup_2gram_frac"] == pytest.approx(dup_frac(grams(2)), abs=1e-9), t
        assert got[i]["dup_3gram_frac"] == pytest.approx(dup_frac(grams(3)), abs=1e-9), t


# ---------------------------------------------------------------------------
# round-3 operators vs brute-force Python oracles


@given(
    pts=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 500)),
        min_size=1, max_size=40,
    ),
    ivs=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(0, 500),
            st.integers(1, 200),
        ),
        min_size=1, max_size=15,
    ),
    bucket_ms=st.sampled_from([1, 7, 64, 1000]),
)
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interval_join_matches_bruteforce(spark, pts, ivs, bucket_ms):
    from rhq_metrics_spark.operators.interval import interval_join

    pdf = spark.createDataFrame(
        [(k, t, float(i)) for i, (k, t) in enumerate(pts)],
        "key string, ts long, value double",
    )
    idf = spark.createDataFrame(
        [(k, s, s + d, i) for i, (k, s, d) in enumerate(ivs)],
        "key string, start long, end long, iv_id long",
    )
    got = {
        (r["key"], r["ts"], r["value"], r["iv_id"])
        for r in interval_join(pdf, idf, on=["key"], bucket_ms=bucket_ms).collect()
    }
    exp = {
        (k, t, float(i), j)
        for i, (k, t) in enumerate(pts)
        for j, (k2, s, d) in enumerate(ivs)
        if k == k2 and s <= t < s + d
    }
    assert got == exp


@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    window_n=st.sampled_from([3, 5, 10]),
    min_n=st.sampled_from([2, 3]),
)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rolling_zscore_matches_python(spark, vals, window_n, min_n):
    import math

    from rhq_metrics_spark.operators.anomaly import rolling_zscore

    df = spark.createDataFrame(
        [("k", t, float(v)) for t, v in enumerate(vals)],
        "key string, ts long, value double",
    )
    got = {
        r["ts"]: (r["base_mean"], r["base_std"], r["z"])
        for r in rolling_zscore(
            df, on=["key"], order=["ts"], value_col="value",
            window_n=window_n, min_n=min_n,
        ).collect()
    }
    from decimal import ROUND_HALF_UP, Decimal

    def spark_round(x: float, d: int = 4) -> float:
        # Spark's round() is BigDecimal.valueOf(double) — the SHORTEST
        # decimal repr — rounded HALF_UP; Python's round() is half-even
        # on the binary value.  They differ exactly on .xxxx5 decimal
        # boundaries (hypothesis found z = 41/32 = 1.28125 → Spark
        # 1.2813, Python round 1.2812), so the oracle must reproduce
        # Spark's semantics, not Python's.
        q = Decimal(1).scaleb(-d)
        return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))

    for t in range(len(vals)):
        frame = [float(v) for v in vals[max(0, t - window_n):t]]
        if not frame:
            assert got[t] == (None, None, None), t
            continue
        n = len(frame)
        mean = sum(frame) / n
        var = max(sum(v * v for v in frame) / n - mean * mean, 0.0)
        std = math.sqrt(var)
        z = (
            spark_round((vals[t] - mean) / std)
            if n >= min_n and std > 0
            else None
        )
        assert got[t] == (spark_round(mean), spark_round(std), z), t


@given(
    n_tokens=st.integers(0, 40),
    chunk=st.sampled_from([1, 3, 8]),
    stride=st.sampled_from([1, 2, 8]),
)
@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunk_documents_covers_every_token_once_per_window(
    spark, n_tokens, chunk, stride
):
    from rhq_metrics_spark.pipelines.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        (r["chunk_id"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=chunk, stride=stride).collect()
    )
    if n_tokens == 0:
        assert out == []
        return
    # expected: windows at 0, stride, 2*stride ... covering the tail
    exp = []
    i = 0
    starts = [0] if n_tokens <= chunk else list(
        range(0, n_tokens - chunk + stride, stride)
    )
    # python twin of 1 + ceil((n-chunk)/stride) windows
    n_chunks = 1 if n_tokens <= chunk else -(-(n_tokens - chunk) // stride) + 1
    starts = [s * stride for s in range(n_chunks)]
    for ci, s in enumerate(starts):
        exp.append((ci, " ".join(f"t{j}" for j in range(s, min(s + chunk, n_tokens)))))
    assert out == exp


# ---------------------------------------------------------------------------
# r5 mergeable serving partials: merge == batch, property-based.
# hypothesis explores series shapes (gaps, resets, boundary-hugging
# timestamps, single-point slices) the fixed-seed tests can't.

_SLICE = 600_000
_BUCKET = 3_600_000

_partial_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4 * _BUCKET // 1000 - 1),  # sec offset
        st.integers(min_value=0, max_value=4000),  # scaled value
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@given(pts=_partial_series, counter=st.booleans())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_increase_rollup_merge_equals_batch_property(spark, pts, counter):
    from rhq_metrics_spark.operators.rate import (
        bucket_increase,
        increase_from_rollup,
        increase_rollup,
    )

    rows = [("m", off * 1000, v / 100.0) for off, v in pts]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    merged = increase_from_rollup(
        increase_rollup(df, _SLICE, counter=counter),
        _BUCKET, _SLICE, counter=counter,
    )
    batch = bucket_increase(df, _BUCKET, counter=counter)
    got = {r["bucket_start"]: (r["n_pairs"], r["increase"])
           for r in merged.collect()}
    exp = {r["bucket_start"]: (r["n_pairs"], r["increase"])
           for r in batch.collect()}
    assert got == exp


@given(pts=_partial_series, gap=st.sampled_from([None, 120_000]))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_twa_rollup_merge_equals_batch_property(spark, pts, gap):
    from rhq_metrics_spark.operators.rate import (
        time_weighted_avg,
        twa_from_rollup,
        twa_rollup,
    )

    rows = [("m", off * 1000, v / 100.0) for off, v in pts]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    merged = twa_from_rollup(
        twa_rollup(df, _SLICE, max_gap_ms=gap), _BUCKET, _SLICE, max_gap_ms=gap
    )
    batch = time_weighted_avg(df, _BUCKET, max_gap_ms=gap)
    got = {r["bucket_start"]: (r["n_pairs"], r["held_ms"], r["twa"])
           for r in merged.collect()}
    exp = {r["bucket_start"]: (r["n_pairs"], r["held_ms"], r["twa"])
           for r in batch.collect()}
    assert got == exp


_avail_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4 * _BUCKET // 1000 - 1),
        st.sampled_from(["up", "down", "unknown", "admin"]),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@given(pts=_avail_series)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_availability_rollup_merge_equals_batch_property(spark, pts):
    from rhq_metrics_spark.operators.availability import (
        availability_from_rollup,
        availability_rollup,
        availability_stats,
    )

    rows = [("m", off * 1000, state) for off, state in pts]
    df = spark.createDataFrame(rows, "metric string, ts long, value string")
    b = Buckets.from_step(0, 4 * _BUCKET, _BUCKET)
    merged = availability_from_rollup(
        availability_rollup(df, _SLICE, group_cols=["metric"]),
        b, _SLICE, group_cols=["metric"],
    )
    batch = availability_stats(df, b, group_cols=["metric"])
    cols = batch.columns
    got = {r["start"]: tuple(r[c] for c in cols) for r in merged.collect()}
    exp = {r["start"]: tuple(r[c] for c in cols) for r in batch.collect()}
    assert got == exp


# ---------------------------------------------------------------------------
# Grid fill: the join-free union-zeros fill (numeric_bucket_stats without
# group_cols) vs a brute-force Python oracle — pins that dropping the
# broadcast dimension join kept the A1 contract exactly: one row per grid
# bucket, empty buckets null stats with samples=0, half-open membership.

_grid_pts = st.lists(
    st.tuples(
        st.integers(min_value=-100, max_value=1100),  # offset seconds (incl. out-of-grid)
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    ),
    min_size=0,
    max_size=40,
    unique_by=lambda t: t[0],
)


@given(
    pts=_grid_pts,
    step_s=st.integers(min_value=1, max_value=400),
    count=st.integers(min_value=1, max_value=12),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bucket_stats_fill_matches_python_oracle(spark, pts, step_s, count):
    from rhq_metrics_spark.operators.stats import numeric_bucket_stats

    T0 = 1_700_000_000_000
    b = Buckets(T0, step_s * 1000, count)
    rows = [("t", "m", T0 + off * 1000, float(v)) for off, v in pts]
    df = spark.createDataFrame(
        rows, "tenant_id string, metric string, ts long, value double"
    )
    got = {r["start"]: r for r in numeric_bucket_stats(df, b).collect()}

    want: dict[int, list[float]] = {i: [] for i in range(count)}
    for _, _, ts, v in rows:
        if b.start <= ts < b.start + b.step * b.count:
            want[(ts - b.start) // b.step].append(v)
    assert set(got) == {b.start + i * b.step for i in range(count)}
    for i, vals in want.items():
        r = got[b.start + i * b.step]
        assert r["end"] == b.start + (i + 1) * b.step
        assert r["samples"] == len(vals)
        if not vals:
            for c in ("min", "avg", "median", "max", "sum"):
                assert r[c] is None, (c, r)
        else:
            assert r["min"] == pytest.approx(min(vals))
            assert r["max"] == pytest.approx(max(vals))
            assert r["sum"] == pytest.approx(sum(vals))
            assert r["avg"] == pytest.approx(sum(vals) / len(vals))


@given(
    texts=st.lists(
        st.lists(st.sampled_from([f"w{i}" for i in range(6)]),
                 min_size=0, max_size=14).map(" ".join),
        min_size=1, max_size=6,
    ),
    window=st.sampled_from([2, 3]),
)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_substring_dup_spans_matches_python(spark, texts, window):
    """EXACTSUBSTR vs a brute-force Python oracle on tiny-vocab docs
    (small vocabulary forces real cross-doc window collisions)."""
    from rhq_metrics_spark.pipelines.text import substring_dup_spans

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in
           substring_dup_spans(df, window=window).collect()}

    def wins(text):
        toks = text.split()
        return [" ".join(toks[i:i + window])
                for i in range(len(toks) - window + 1)]

    doc_wins = {i: wins(t) for i, t in enumerate(texts)}
    owners: dict = {}
    for i, ws in doc_wins.items():
        for w in set(ws):
            owners.setdefault(w, set()).add(i)
    for i, ws in doc_wins.items():
        n_dup = sum(1 for w in ws if len(owners[w]) >= 2)
        max_share = max((len(owners[w]) for w in ws), default=0)
        r = got[i]
        assert r["n_windows"] == len(ws), (i, texts)
        assert r["n_dup_windows"] == n_dup, (i, texts)
        assert r["max_share"] == max_share, (i, texts)
        exp_bp = (n_dup * 1_000_000) // len(ws) if ws else 0
        assert r["dup_bp"] == exp_bp, (i, texts)


@given(
    n_docs=st.integers(1, 12),
    parts_a=st.integers(0, 5),
    parts_b=st.integers(0, 5),
    budget=st.integers(0, 500),
)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_token_mixture_invariants(spark, n_docs, parts_a, parts_b, budget):
    """Mixture realization invariants: copies per doc ∈ {n_full,
    n_full+1}; per-group realized tokens within one doc of target when
    rates < 1... more precisely, group copy totals lie in the exact
    integer envelope implied by the plan (n_full*N .. (n_full+1)*N)."""
    if parts_a + parts_b == 0:
        return
    from rhq_metrics_spark.pipelines.sampling import (
        token_mixture_plan,
        token_mixture_sample,
    )

    rows = [(i, "A" if i % 2 == 0 else "B",
             " ".join(f"t{k}" for k in range(5)))
            for i in range(n_docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    parts = {"A": parts_a, "B": parts_b}
    plan = {r["group"]: r for r in
            token_mixture_plan(df, parts, budget).collect()}
    out = token_mixture_sample(df, parts, budget).collect()
    by_group: dict = {}
    per_doc: dict = {}
    for r in out:
        by_group[r["group"]] = by_group.get(r["group"], 0) + 1
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
        assert r["n_tokens"] == 5
    n_in = {g: sum(1 for i in range(n_docs)
                   if (g == "A") == (i % 2 == 0)) for g in ("A", "B")}
    for g in ("A", "B"):
        if g not in plan or n_in[g] == 0:
            continue
        nf, fr = plan[g]["n_full_copies"], plan[g]["frac_ppm"]
        lo = nf * n_in[g]
        hi = (nf + (1 if fr > 0 else 0)) * n_in[g]
        assert lo <= by_group.get(g, 0) <= hi, (g, plan[g])
    for i, c in per_doc.items():
        g = "A" if i % 2 == 0 else "B"
        nf = plan[g]["n_full_copies"]
        assert c in (nf, nf + 1), (i, c, nf)


@given(
    vals=st.lists(st.integers(-10**7, 10**7), min_size=1, max_size=40),
    window_n=st.sampled_from([2, 5, 8]),
)
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ewma_matches_python_exactly_property(spark, vals, window_n):
    """The EWMA exactness contract on arbitrary int64-safe inputs: the
    Spark double equals Python's exact-int num/den division bit for
    bit, at every warmup length."""
    from rhq_metrics_spark.operators.anomaly import ewma_smooth, ewma_weights

    df = spark.createDataFrame(
        [("k", t, v) for t, v in enumerate(vals)],
        "key string, ts long, value long",
    )
    got = {
        r["ts"]: r["ewma"]
        for r in ewma_smooth(
            df, on=["key"], order=["ts"], value_col="value",
            window_n=window_n,
        ).collect()
    }
    ws = ewma_weights(window_n, 1, 4)
    for t in range(len(vals)):
        lags = [vals[t - j] for j in range(min(t + 1, window_n))]
        num = sum(w * v for w, v in zip(ws, lags))
        den = sum(ws[: len(lags)])
        assert got[t] == num / den, t


@given(
    vals=st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=60),
    trim_den=st.sampled_from([4, 10, 20]),
)
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_trimmed_stats_match_python_property(spark, vals, trim_den):
    """Trimmed mean over one bucket == Python sort-trim-average on the
    quantized integers (exact ratio, Spark HALF_UP 4-dp quantization)."""
    from decimal import ROUND_HALF_UP, Decimal

    from rhq_metrics_spark.operators.stats import trimmed_bucket_stats

    df = spark.createDataFrame(
        [(t, v / 100.0) for t, v in enumerate(vals)],
        "ts long, value double",
    )
    b = Buckets(0, len(vals) + 1, 1)
    r = trimmed_bucket_stats(
        df, b, trim_num=1, trim_den=trim_den, value_scale=100
    ).collect()[0]
    n = len(vals)
    k = n // trim_den
    kept = sorted(vals)[k : n - k]
    assert r["samples"] == n and r["n_kept"] == len(kept)
    # mirror quantize(): round(ksum * 100 / n_kept) / 10000, HALF_UP on
    # the exact integer ratio
    exact = Decimal(sum(kept)) * 100 / Decimal(len(kept))
    expected = float(
        exact.quantize(Decimal(1), rounding=ROUND_HALF_UP)
    ) / 10000
    assert r["trimmed_avg"] == pytest.approx(expected, abs=1e-12)
    assert r["t_min"] == min(kept) / 100 and r["t_max"] == max(kept) / 100


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c.d-#\n"),
            min_size=0, max_size=60,
        ),
        min_size=1, max_size=6,
    )
)
@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bpe_pair_counts_match_python_counter(spark, texts):
    """BPE pair frequencies == a brute-force Python Counter over the
    same tokenization, including rank tie-breaks."""
    from collections import Counter

    from rhq_metrics_spark.pipelines.text import bpe_pair_counts

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = [(r["rank"], r["pair"], r["n"]) for r in bpe_pair_counts(df).collect()]

    c: Counter = Counter()
    for text in texts:
        for w in text.strip().lower().split():
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += 1
    expected = [
        (i + 1, pair, n)
        for i, (pair, n) in enumerate(
            sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
        )
    ]
    assert got == expected


@given(
    words=st.lists(
        st.sampled_from([f"w{i}" for i in range(12)]), min_size=1, max_size=80
    )
)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cms_guarantee_property(spark, words):
    """CMS one-sided guarantee on arbitrary streams: estimate >= true
    for every present value, == for absent probes' zero floor."""
    from collections import Counter

    from rhq_metrics_spark.pipelines.sketches import cms_build, cms_estimate

    df = spark.createDataFrame([(w,) for w in words], "w string")
    sketch = cms_build(df, "w")
    probes = df.distinct()
    est = {
        r["w"]: r["est_n"] for r in cms_estimate(sketch, probes, "w").collect()
    }
    true = Counter(words)
    assert all(est[w] >= c for w, c in true.items())


@given(
    a=st.dictionaries(
        st.sampled_from(list("abcdefgh")), st.integers(1, 50), max_size=6
    ),
    b=st.dictionaries(
        st.sampled_from(list("abcdefgh")), st.integers(1, 50), max_size=6
    ),
    cap=st.sampled_from([1, 3, 6]),
)
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mg_merge_property(spark, a, b, cap):
    """Spark MG merge == the textbook merge (sum, subtract (cap+1)-th
    largest, drop non-positive) on arbitrary summaries."""
    from collections import Counter

    from rhq_metrics_spark.streaming.heavy_hitters import mg_merge

    def df_of(d, eps):
        return spark.createDataFrame(
            [(v, c, eps) for v, c in d.items()],
            "value string, cnt long, eps long",
        )

    got = {
        r["value"]: r["cnt"]
        for r in mg_merge(df_of(a, 2), df_of(b, 3), cap).collect()
    }
    merged = Counter(a)
    merged.update(b)
    thr = (
        sorted(merged.values(), reverse=True)[cap]
        if len(merged) > cap
        else 0
    )
    exp = {v: c - thr for v, c in merged.items() if c > thr}
    assert got == exp and len(got) <= cap


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1, max_size=25,
    ),
    n_merges=st.sampled_from([3, 5]),
)
@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bpe_learn_matches_reference_property(spark, words, n_merges):
    """bpe_learn_merges == the in-memory Sennrich trainer on arbitrary
    small corpora: pins the JVM merge fold (greedy non-overlap, e.g.
    'aaaa') and the (count desc, pair asc) argmax tiebreak."""
    from collections import Counter

    from rhq_metrics_spark.pipelines.text import bpe_learn_merges

    df = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    got = bpe_learn_merges(df, n_merges)

    wf = Counter(words)
    vocab = {w: list(w) for w in wf}
    want = []
    for _ in range(n_merges):
        pc = Counter()
        for w, f in wf.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want.append((a, b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    assert got == want


@given(
    host=st.from_regex(r"[a-z]{2,8}(\.[a-z]{2,5}){1,2}", fullmatch=True),
    www=st.booleans(),
    upper=st.booleans(),
    scheme=st.sampled_from(["http", "https"]),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.from_regex(r"(/[A-Za-z0-9]{1,6}){0,3}/?", fullmatch=True),
    params=st.lists(
        st.sampled_from(
            ["utm_source=x", "utm_b=2", "gclid=g", "fbclid=f",
             "id=7", "q=abc", "page=2"]
        ),
        max_size=4,
    ),
    frag=st.sampled_from(["", "#sec", "#a/b"]),
)
@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_canonical_url_idempotent_and_tracking_free_property(
    spark, host, www, upper, scheme, port, path, params, frag
):
    """canonical_url is IDEMPOTENT (a canonical form canonicalizes to
    itself — the property that catches rule interactions), never emits
    tracking params or fragments, and always lowercases the prefix."""
    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.text import canonical_url

    prefix = f"{scheme}://{'www.' if www else ''}{host}{port}"
    if upper:
        prefix = prefix.upper()
    q = ("?" + "&".join(params)) if params else ""
    url = prefix + path + q + frag
    df = spark.createDataFrame([(url,), ], "url string")
    c1 = df.select(canonical_url(F.col("url")).alias("c"))
    first = c1.collect()[0]["c"]
    second = c1.select(
        canonical_url(F.col("c")).alias("c2")
    ).collect()[0]["c2"]
    assert second == first, (url, first, second)
    assert "#" not in first
    for bad in ("utm_", "gclid=", "fbclid="):
        assert bad not in first, (url, first)
    # surviving non-tracking params are kept
    for keep in ("id=7", "q=abc", "page=2"):
        if keep in params:
            assert keep in first, (url, first)
    # prefix case-folded
    assert first.startswith(("http://", "https://"))


@given(
    counts=st.lists(st.integers(1, 10**9), min_size=1, max_size=8),
    alpha_quarters=st.sampled_from([1, 2, 3, 4]),
)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_temperature_parts_match_python_property(spark, counts, alpha_quarters):
    """floor(n^alpha * 1e6) via sqrt compositions == Python's identical
    IEEE sequence, bit for bit, at every quarter alpha."""
    import math

    import pyspark.sql.functions as F

    from rhq_metrics_spark.pipelines.sampling import temperature_parts

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(counts)],
        "i long, available_tokens long",
    )
    got = {
        r["i"]: r["part"]
        for r in df.select(
            "i", temperature_parts(alpha_quarters).alias("part")
        ).collect()
    }
    for i, n in enumerate(counts):
        x = float(n)
        r2 = math.sqrt(x)
        r4 = math.sqrt(r2)
        w = {1: r4, 2: r2, 3: r2 * r4, 4: x}[alpha_quarters]
        assert got[i] == math.floor(w * 1_000_000.0), (n, alpha_quarters)


@given(st.integers(min_value=1, max_value=2**62))
@settings(max_examples=500, deadline=None)
def test_log2_fxp_int_bounds_and_monotone(n):
    """The exact integer log2 gadget: always within one output ulp
    BELOW the true log2 (truncation contract), never above, and
    monotone across the power-of-two boundary neighbors."""
    import math

    from rhq_metrics_spark.pipelines.retrieval import log2_fxp_int

    got = log2_fxp_int(n)
    true = math.log2(n)
    assert got / 65536 <= true + 1e-12
    # 20-bit mantissa + 16 fractional output bits: error < 2^-15
    assert true - got / 65536 < 2 ** -15 + 1e-12
    if n > 1:
        assert log2_fxp_int(n - 1) <= got
    # exact at powers of two
    if n & (n - 1) == 0:
        assert got == (n.bit_length() - 1) * 65536


@given(
    st.lists(
        st.tuples(
            st.tuples(st.integers(0, 1), st.integers(0, 1)),
            st.integers(min_value=1, max_value=10**9),
        ),
        min_size=1,
        max_size=4,
        unique_by=lambda p: p[0],
    ),
    st.integers(min_value=1, max_value=30),
)
@settings(max_examples=200, deadline=None)
def test_fs_em_recurrence_invariants(patterns, iters):
    """The integer-ppm EM recurrence: every estimate stays on the ppm
    grid in [0, 1e6], and the result is invariant under pattern-order
    permutation (integer sums are order-free — the property the
    DuckDB recursive-CTE oracle relies on)."""
    from rhq_metrics_spark.pipelines.dedup import _fs_em_iterate

    p, m, u = _fs_em_iterate(patterns, 2, iters, 100_000, 900_000, 100_000)
    assert 0 <= p <= 1_000_000
    assert all(0 <= x <= 1_000_000 for x in m + u)
    p2, m2, u2 = _fs_em_iterate(
        list(reversed(patterns)), 2, iters, 100_000, 900_000, 100_000
    )
    assert (p, m, u) == (p2, m2, u2)
