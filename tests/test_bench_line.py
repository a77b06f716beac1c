"""The driver parses the LAST ~2000 chars of bench.py stdout; the final
JSON line must therefore NEVER exceed bench._TAIL_BUDGET regardless of
how many queries/KPIs a round accumulates (BENCH_r05 and BENCH_r08 both
came back ``parsed: null`` when it did).  These tests pin the structural
guarantee, not any particular timing."""

from __future__ import annotations

import json

import bench


def _fake_timings(n_kpis: int = 23) -> dict:  # r8 had 23 graded KPIs
    t = {q: 1.2345 for q in bench.BENCH_QUERIES}
    for i in range(n_kpis):
        t[f"stats_fake_kpi_number_{i:02d}_ms"] = 123456.789
    return t


def _payload(timings: dict) -> dict:
    return {
        "metric": "headline_queries_total_time",
        "value": round(sum(v for k, v in timings.items()
                           if k in set(bench.BENCH_QUERIES)), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
    }


def test_final_line_fits_budget_and_parses():
    timings = _fake_timings()
    line = bench._final_line(_payload(timings), timings, errors={})
    assert len(line) <= bench._TAIL_BUDGET
    rec = json.loads(line)
    assert rec["metric"] == "headline_queries_total_time"
    assert rec["unit"] == "sec"
    assert isinstance(rec["value"], float)
    start, emitted, total = rec["q_window"]
    assert total == len(bench.BENCH_QUERIES)
    # the rotated window must carry a meaningful slice of query timings
    assert emitted >= 20
    emitted_queries = [k for k in rec["queries"] if k in set(bench.BENCH_QUERIES)]
    assert len(emitted_queries) == emitted
    rotated = bench.BENCH_QUERIES[start:] + bench.BENCH_QUERIES[:start]
    assert emitted_queries == rotated[:emitted]


def test_final_line_keeps_graded_kpis_over_queries():
    timings = _fake_timings(n_kpis=23)
    line = bench._final_line(_payload(timings), timings, errors={})
    rec = json.loads(line)
    kpis = [k for k in rec["queries"] if k.startswith("stats_fake_kpi")]
    assert len(kpis) == 23  # all graded KPIs survive; queries rotate


def test_final_line_sheds_diagnostics_always():
    timings = _fake_timings(n_kpis=5)
    timings["embed_ivf_recall_probe4of16"] = 0.93
    timings["stats_latency_samples_ms"] = 12.3
    line = bench._final_line(_payload(timings), timings, errors={})
    rec = json.loads(line)
    assert "embed_ivf_recall_probe4of16" not in rec["queries"]
    assert "stats_latency_samples_ms" not in rec["queries"]


def test_final_line_hard_guarantee_under_pathological_kpis():
    # 200 KPIs with long names: queries AND KPIs must both be trimmed
    # rather than ever exceeding the budget
    timings = _fake_timings(n_kpis=200)
    line = bench._final_line(_payload(timings), timings, errors={"x": "y"})
    assert len(line) <= bench._TAIL_BUDGET
    rec = json.loads(line)
    assert rec["error_count"] == 1


def test_final_line_round_constant_bumped():
    # process discipline: the rotation constant must advance each round
    # so successive BENCH_r{N}.json files cover different query slices
    assert bench._FINAL_LINE_ROUND >= 10


def test_final_line_carries_load_markers():
    """VERDICT r9 item 1: per-section loadavg/mem markers must ride the
    final line so a loaded bench pass is self-evident in the artifact."""
    timings = _fake_timings(n_kpis=22)
    markers: list[str] = []
    for tag in ("warm", "queries", "ann", "ingest", "latency", "end"):
        bench._sys_marker(markers, tag)
    timings["load_markers"] = ",".join(markers)
    line = bench._final_line(_payload(timings), timings, errors={})
    assert len(line) <= bench._TAIL_BUDGET
    rec = json.loads(line)
    lm = rec["queries"]["load_markers"]
    assert lm.startswith("warm:") and ",end:" in lm
    # each marker is tag:load1:memGB
    part = lm.split(",")[0].split(":")
    assert len(part) == 3 and float(part[1]) >= 0.0
