"""Gap-based sessionization (batch gaps-and-islands)."""

from __future__ import annotations

from rhq_metrics_spark.operators.sessions import session_stats, sessionize

T0 = 1_700_000_000_000
GAP = 10_000


def _events(spark):
    return spark.createDataFrame(
        [
            # u1: two sessions — [0, 5s, 14s] then [40s, 41s]
            ("u1", T0),
            ("u1", T0 + 5_000),
            ("u1", T0 + 14_000),
            ("u1", T0 + 40_000),
            ("u1", T0 + 41_000),
            # u2: one singleton session
            ("u2", T0 + 2_000),
        ],
        "user string, ts long",
    )


def test_session_ids_are_per_key_and_gap_bounded(spark):
    out = sessionize(_events(spark), on=["user"], gap_ms=GAP).collect()
    sid = {(r["user"], r["ts"]): r["session_id"] for r in out}
    assert sid[("u1", T0)] == sid[("u1", T0 + 5_000)] == sid[("u1", T0 + 14_000)] == 1
    assert sid[("u1", T0 + 40_000)] == sid[("u1", T0 + 41_000)] == 2
    assert sid[("u2", T0 + 2_000)] == 1


def test_session_stats_rollup(spark):
    rows = {
        (r["user"], r["session_id"]): r
        for r in session_stats(_events(spark), on=["user"], gap_ms=GAP).collect()
    }
    s1 = rows[("u1", 1)]
    assert (s1["session_start"], s1["session_end"]) == (T0, T0 + 14_000)
    assert s1["n_events"] == 3 and s1["duration_ms"] == 14_000
    s2 = rows[("u1", 2)]
    assert s2["n_events"] == 2 and s2["duration_ms"] == 1_000
    assert rows[("u2", 1)]["n_events"] == 1
    assert rows[("u2", 1)]["duration_ms"] == 0


def test_exact_gap_stays_in_session(spark):
    df = spark.createDataFrame(
        [("u", T0), ("u", T0 + GAP)], "user string, ts long"
    )
    out = sessionize(df, on=["user"], gap_ms=GAP).collect()
    assert {r["session_id"] for r in out} == {1}
