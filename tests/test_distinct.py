"""A7 distinct-adjacent — run-length head selection, not set DISTINCT."""

from rhq_metrics_spark.operators import distinct_adjacent

T0 = 1_700_000_000_000


def test_collapse_consecutive_equal(availability_points_factory):
    states = ["up", "up", "down", "down", "up", "up", "up", "down"]
    rows = [("t1", "a", T0 + i * 1000, s) for i, s in enumerate(states)]
    out = (
        distinct_adjacent(availability_points_factory(rows))
        .orderBy("ts")
        .collect()
    )
    assert [(r["ts"] - T0) // 1000 for r in out] == [0, 2, 4, 7]
    assert [r["value"] for r in out] == ["up", "down", "up", "down"]


def test_repeated_value_after_gap_kept(string_points_factory):
    # 'a','b','a' keeps all three — DISTINCT would drop the second 'a'
    rows = [
        ("t1", "s", T0, "a"),
        ("t1", "s", T0 + 1000, "b"),
        ("t1", "s", T0 + 2000, "a"),
    ]
    out = distinct_adjacent(string_points_factory(rows)).orderBy("ts").collect()
    assert [r["value"] for r in out] == ["a", "b", "a"]


def test_per_series_isolation(string_points_factory):
    rows = [
        ("t1", "s1", T0, "x"),
        ("t1", "s2", T0 + 500, "x"),  # different series → kept
    ]
    assert distinct_adjacent(string_points_factory(rows)).count() == 2
