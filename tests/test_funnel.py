"""Tests for operators/funnel.py: ordered-funnel conversion and cohort
retention — first-touch semantics, strict ordering, window bounds."""

from __future__ import annotations

DAY = 86_400_000


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, metric string, ts long")


def test_funnel_ordering_window_and_first_touch(spark):
    from rhq_metrics_spark.operators.funnel import funnel_steps

    W = 10 * DAY
    rows = [
        # A: full conversion in order
        (1, "view", 1 * DAY), (1, "click", 2 * DAY), (1, "purchase", 3 * DAY),
        # B: purchase without click -> stops at view
        (2, "view", 1 * DAY), (2, "purchase", 2 * DAY),
        # C: click BEFORE the first view doesn't count; later click does
        (3, "click", 1 * DAY), (3, "view", 2 * DAY), (3, "click", 5 * DAY),
        (3, "purchase", 6 * DAY),
        # D: purchase outside the window anchored at the view
        (4, "view", 1 * DAY), (4, "click", 2 * DAY),
        (4, "purchase", 1 * DAY + W + 1),
        # E: never views -> not in the funnel at all
        (5, "click", 1 * DAY), (5, "purchase", 2 * DAY),
        # F: click at the SAME ts as the view -> strict > excludes it
        (6, "view", 1 * DAY), (6, "click", 1 * DAY),
    ]
    out = {
        r["step"]: r
        for r in funnel_steps(
            _ev(spark, rows), ["view", "click", "purchase"], window_ms=W
        ).collect()
    }
    assert out["view"]["users"] == 5  # A B C D F
    assert out["click"]["users"] == 3  # A C D
    assert out["purchase"]["users"] == 2  # A C
    assert out["view"]["conversion_ppm"] == 1_000_000
    assert out["click"]["conversion_ppm"] == 3 * 1_000_000 // 5
    assert out["purchase"]["conversion_ppm"] == 2 * 1_000_000 // 5
    assert [out[s]["step_idx"] for s in ("view", "click", "purchase")] == [
        1, 2, 3,
    ]


def test_funnel_without_window_counts_any_later_step(spark):
    from rhq_metrics_spark.operators.funnel import funnel_steps

    rows = [
        (1, "view", 0), (1, "click", 400 * DAY),
    ]
    out = {r["step"]: r["users"]
           for r in funnel_steps(_ev(spark, rows), ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 1}


def test_cohort_retention_matrix(spark):
    from rhq_metrics_spark.operators.funnel import cohort_retention

    WEEK = 7 * DAY
    rows = [
        # cohort week 0: users 1, 2 (first activity in [0, WEEK))
        (1, "view", 1 * DAY), (1, "view", 8 * DAY),   # active weeks 0, 1
        (2, "click", 2 * DAY), (2, "view", 16 * DAY),  # active weeks 0, 2
        # cohort week 1: user 3
        (3, "view", 8 * DAY), (3, "view", 15 * DAY),   # active weeks 1, 2 -> k 0, 1
        # a ts one ms shy of the next week boundary stays in its week
        (4, "view", WEEK - 1),                          # cohort 0, k 0 only
    ]
    got = {
        (r["cohort_period"], r["period_k"]): (
            r["active_users"], r["cohort_size"], r["retention_ppm"]
        )
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    assert got[(0, 0)] == (3, 3, 1_000_000)  # users 1, 2, 4
    assert got[(0, 1)] == (1, 3, 333_333)
    assert got[(0, 2)] == (1, 3, 333_333)
    assert got[(1, 0)] == (1, 1, 1_000_000)
    assert got[(1, 1)] == (1, 1, 1_000_000)
    assert set(got) == {(0, 0), (0, 1), (0, 2), (1, 0), (1, 1)}


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """Advance rows emitted across micro-batches yield per-step user
    sets equal to the batch funnel over an in-order replay — including
    a user whose click and purchase land in different batches."""
    import json
    import time

    from rhq_metrics_spark.operators.funnel import funnel_steps
    from rhq_metrics_spark.streaming.funnel import streaming_funnel

    W = 10 * DAY
    rows = [
        (1, "view", 1 * DAY), (1, "click", 2 * DAY), (1, "purchase", 3 * DAY),
        (2, "view", 1 * DAY), (2, "purchase", 2 * DAY),
        (3, "click", 1 * DAY), (3, "view", 2 * DAY), (3, "click", 5 * DAY),
        (3, "purchase", 6 * DAY),
        (4, "view", 1 * DAY), (4, "click", 2 * DAY),
        (4, "purchase", 1 * DAY + W + 1),
        (5, "click", 1 * DAY), (5, "purchase", 2 * DAY),
        (6, "view", 1 * DAY), (6, "click", 1 * DAY),
    ]
    rows = sorted(rows, key=lambda r: (r[2], r[0]))  # in-order stream
    pts = [{"user_id": u, "metric": m, "ts": t} for u, m, t in rows]
    src = tmp_path / "fn_in"
    src.mkdir()
    out_dir = tmp_path / "fn_out"
    split = len(pts) // 2
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in pts[:split]))

    schema = "user_id long, metric string, ts long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        streaming_funnel(stream, ["view", "click", "purchase"], window_ms=W)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "fn_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90

        def rows_out():
            try:
                return spark.read.parquet(str(out_dir)).count()
            except Exception:
                return 0

        while rows_out() < 1 and time.time() < deadline:
            time.sleep(0.5)
        (src / "b2.json").write_text(
            "\n".join(json.dumps(r) for r in pts[split:])
        )
        # expected advances: 5 views + 3 clicks + 2 purchases = 10
        while rows_out() < 10 and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()

    adv = spark.read.parquet(str(out_dir)).collect()
    by_step: dict = {}
    for r in adv:
        by_step.setdefault(r["step"], set()).add(r["user_id"])
    batch = {
        r["step"]: r["users"]
        for r in funnel_steps(
            _ev(spark, rows), ["view", "click", "purchase"], window_ms=W
        ).collect()
    }
    assert {s: len(us) for s, us in by_step.items()} == batch
    assert by_step["purchase"] == {1, 3}
    # one advance row per (user, step): idempotent first-touch
    assert len(adv) == sum(batch.values())


def test_streaming_step_latency_matches_batch(spark, tmp_path):
    """W15b twin (VERDICT r13 item 7): per-step latency rows emitted
    across micro-batches aggregate to the batch funnel_step_latency
    stats over an in-order replay — including a user whose click and
    purchase land in different batches."""
    import json
    import time

    from rhq_metrics_spark.operators.funnel import funnel_step_latency
    from rhq_metrics_spark.streaming.funnel import streaming_step_latency

    W = 10 * DAY
    rows = [
        (1, "view", 1 * DAY), (1, "click", 2 * DAY), (1, "purchase", 3 * DAY),
        (2, "view", 1 * DAY), (2, "purchase", 2 * DAY),
        (3, "click", 1 * DAY), (3, "view", 2 * DAY), (3, "click", 5 * DAY),
        (3, "purchase", 6 * DAY),
        (4, "view", 1 * DAY), (4, "click", 2 * DAY),
        (4, "purchase", 1 * DAY + W + 1),
        (5, "click", 1 * DAY), (5, "purchase", 2 * DAY),
        (6, "view", 1 * DAY), (6, "click", 1 * DAY),
    ]
    rows = sorted(rows, key=lambda r: (r[2], r[0]))  # in-order stream
    pts = [{"user_id": u, "metric": m, "ts": t} for u, m, t in rows]
    src = tmp_path / "sl_in"
    src.mkdir()
    out_dir = tmp_path / "sl_out"
    split = len(pts) // 2
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in pts[:split]))

    schema = "user_id long, metric string, ts long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        streaming_step_latency(
            stream, ["view", "click", "purchase"], window_ms=W
        )
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "sl_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90

        def rows_out():
            try:
                return spark.read.parquet(str(out_dir)).count()
            except Exception:
                return 0

        while rows_out() < 1 and time.time() < deadline:
            time.sleep(0.5)
        (src / "b2.json").write_text(
            "\n".join(json.dumps(r) for r in pts[split:])
        )
        # expected k>=2 advances: 3 clicks (users 1, 3, 4) + 2
        # purchases (users 1, 3) = 5 latency rows
        while rows_out() < 5 and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()

    got = spark.read.parquet(str(out_dir)).collect()
    by_step: dict = {}
    for r in got:
        by_step.setdefault(r["step_idx"], []).append(
            (r["user_id"], r["latency_ms"])
        )
    # per-user latencies match the batch chain exactly
    assert sorted(by_step[2]) == [
        (1, 1 * DAY), (3, 3 * DAY), (4, 1 * DAY),
    ]
    assert sorted(by_step[3]) == [(1, 1 * DAY), (3, 1 * DAY)]
    # the batch stats are one tiny agg over the stream's sink
    batch = {
        r["step_idx"]: r
        for r in funnel_step_latency(
            _ev(spark, rows), ["view", "click", "purchase"], window_ms=W
        ).collect()
    }
    for idx, pairs in by_step.items():
        lats = sorted(lat for _, lat in pairs)
        b = batch[idx]
        assert b["users"] == len(lats)
        assert b["sum_ms"] == sum(lats)
        assert b["mean_ms"] == sum(lats) // len(lats)
        assert b["p50_ms"] == lats[(len(lats) + 1) // 2 - 1]
        assert b["max_ms"] == max(lats)


def test_streaming_cohort_matches_batch(spark, tmp_path):
    """First-activity-in-period rows across micro-batches aggregate to
    the batch cohort matrix; repeats within a period dedup."""
    import json
    import time

    import pyspark.sql.functions as F

    from rhq_metrics_spark.operators.funnel import cohort_retention
    from rhq_metrics_spark.streaming.funnel import streaming_cohort_activity

    WEEK = 7 * DAY
    rows = [
        (1, 1 * DAY), (1, 2 * DAY), (1, 8 * DAY),   # cohort 0: k 0, 1
        (2, 2 * DAY), (2, 16 * DAY),                # cohort 0: k 0, 2
        (3, 8 * DAY), (3, 15 * DAY), (3, 16 * DAY), # cohort 1: k 0, 1
        (4, WEEK - 1),                              # cohort 0: k 0 only
    ]
    rows = sorted(rows, key=lambda r: (r[1], r[0]))
    pts = [{"user_id": u, "ts": t} for u, t in rows]
    src = tmp_path / "co_in"
    src.mkdir()
    out_dir = tmp_path / "co_out"
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in pts[:5]))

    stream = (
        spark.readStream.schema("user_id long, ts long")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        streaming_cohort_activity(stream, period_ms=WEEK)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "co_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90

        def n():
            try:
                return spark.read.parquet(str(out_dir)).count()
            except Exception:
                return 0

        while n() < 1 and time.time() < deadline:
            time.sleep(0.5)
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in pts[5:]))
        while n() < 7 and time.time() < deadline:  # 7 first-activity rows
            time.sleep(0.5)
    finally:
        q.stop()

    live = (
        spark.read.parquet(str(out_dir))
        .groupBy("cohort_period", "period_k")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
    got = {(r["cohort_period"], r["period_k"]): r["active_users"]
           for r in live.collect()}
    ev = spark.createDataFrame(
        [(u, "e", t) for u, t in rows],
        "user_id long, metric string, ts long",
    )
    want = {(r["cohort_period"], r["period_k"]): r["active_users"]
            for r in cohort_retention(ev, period_ms=WEEK).collect()}
    assert got == want
    # exactly one row per (user, offset): in-period repeats deduped
    assert spark.read.parquet(str(out_dir)).count() == 7


def test_event_transitions_hand_computed(spark):
    """Adjacent-pair counts, per-source totals and ppm probabilities on
    a planted two-user timeline, including the same-ts composite-order
    tie-break."""
    from rhq_metrics_spark.operators.funnel import event_transitions

    rows = [
        # user 1: view -> click -> view -> purchase
        (1, "view", 10, 1.0), (1, "click", 20, 1.0),
        (1, "view", 30, 1.0), (1, "purchase", 40, 1.0),
        # user 2: same-ts tie at 20 orders (click, view) by type
        (2, "view", 10, 1.0), (2, "click", 20, 1.0), (2, "view", 20, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, metric string, ts long, value double"
    )
    out = {
        (r["from_type"], r["to_type"]): (
            r["transitions"], r["from_total"], r["prob_ppm"]
        )
        for r in event_transitions(df).collect()
    }
    # user1: view->click, click->view, view->purchase
    # user2: view->click (ts10->20 click first by type), click->view
    assert out[("view", "click")] == (2, 3, 666_666)
    assert out[("view", "purchase")] == (1, 3, 333_333)
    assert out[("click", "view")] == (2, 2, 1_000_000)
    assert set(out) == {("view", "click"), ("view", "purchase"), ("click", "view")}


def test_event_transitions_single_event_user_emits_nothing(spark):
    from rhq_metrics_spark.operators.funnel import event_transitions

    df = spark.createDataFrame(
        [(1, "view", 10, 1.0)], "user_id long, metric string, ts long, value double"
    )
    assert event_transitions(df).count() == 0


def test_streaming_transitions_matches_batch(spark, tmp_path):
    """Transition rows emitted across micro-batches equal the batch
    operator's pair expansion over an in-order replay — including a
    transition that SPANS the micro-batch boundary."""
    import json
    import time

    from rhq_metrics_spark.operators.funnel import event_transitions
    from rhq_metrics_spark.streaming.funnel import streaming_transitions

    rows = [
        (1, "view", 10, 1.0), (1, "click", 20, 1.0), (1, "view", 30, 1.0),
        (1, "purchase", 40, 1.0),
        (2, "view", 10, 1.0), (2, "click", 25, 1.0),
        (3, "error", 15, 1.0),
    ]
    rows = sorted(rows, key=lambda r: (r[2], r[0]))
    pts = [
        {"user_id": u, "metric": m, "ts": t, "value": v} for u, m, t, v in rows
    ]
    src = tmp_path / "tr_in"
    src.mkdir()
    out_dir = tmp_path / "tr_out"
    split = len(pts) // 2
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in pts[:split]))

    schema = "user_id long, metric string, ts long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        streaming_transitions(stream)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "tr_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90

        def rows_out():
            try:
                return spark.read.parquet(str(out_dir)).count()
            except Exception:
                return 0

        # the first half holds each user's FIRST event only — zero
        # transitions — so wait for the checkpoint commit, not output
        first_commit = tmp_path / "tr_ckpt" / "commits" / "0"
        while not first_commit.exists() and time.time() < deadline:
            time.sleep(0.5)
        (src / "b2.json").write_text(
            "\n".join(json.dumps(r) for r in pts[split:])
        )
        # expected transitions: user1 has 3, user2 has 1, user3 has 0
        while rows_out() < 4 and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()

    streamed = spark.read.parquet(str(out_dir)).collect()
    from collections import Counter

    got = Counter((r["from_type"], r["to_type"]) for r in streamed)
    batch_df = spark.createDataFrame(
        rows, "user_id long, metric string, ts long, value double"
    )
    want = {
        (r["from_type"], r["to_type"]): r["transitions"]
        for r in event_transitions(batch_df).collect()
    }
    assert dict(got) == want
    assert len(streamed) == sum(want.values())  # exactly-once per pair


def test_active_users_hand_computed(spark):
    """DAU/WAU interval-merge counts on a planted activity grid,
    including a gap that splits a user's coverage interval."""
    from rhq_metrics_spark.operators.funnel import active_users

    P = 1000  # period_ms
    rows = [
        # user 1 active periods {0, 1, 4}; user 2 active {1}; two
        # events in one period collapse to one activity
        (1, 10), (1, 20), (1, 1500), (1, 4100),
        (2, 1999),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long")
    out = {
        (r["period"], r["window_periods"]): r["active_users"]
        for r in active_users(df, period_ms=P, windows=(1, 3)).collect()
    }
    # w=1 (DAU): p0={1}, p1={1,2}, p2={}, p3={}, p4={1}
    assert [out[(p, 1)] for p in range(5)] == [1, 2, 0, 0, 1]
    # w=3: p covers users active in (p-3, p]
    # p0={1}, p1={1,2}, p2={1,2}, p3={1,2}, p4={1}
    assert [out[(p, 3)] for p in range(5)] == [1, 2, 2, 2, 1]
    assert len(out) == 10  # full spine x 2 windows


def test_active_users_matches_brute_force(spark):
    """Interval-merge == naive per-period distinct recount on a random
    fixture (the oracle semantics)."""
    import hashlib

    from rhq_metrics_spark.operators.funnel import active_users

    rows = []
    for i in range(500):
        h = int(hashlib.md5(f"au:{i}".encode()).hexdigest(), 16)
        rows.append((h % 37, (h // 37) % 60_000))
    df = spark.createDataFrame(rows, "user_id long, ts long")
    P = 1000
    acts = {(u, t // P) for u, t in rows}
    lo = min(p for _, p in acts)
    hi = max(p for _, p in acts)
    got = {
        (r["period"], r["window_periods"]): r["active_users"]
        for r in active_users(df, period_ms=P, windows=(1, 7, 30)).collect()
    }
    for w in (1, 7, 30):
        for p in range(lo, hi + 1):
            want = len({u for (u, pa) in acts if p - w < pa <= p})
            assert got[(p, w)] == want, (p, w)


def test_active_users_empty_and_validation(spark):
    import pytest

    from rhq_metrics_spark.operators.funnel import active_users

    df = spark.createDataFrame([], "user_id long, ts long")
    assert active_users(df).count() == 0
    with pytest.raises(ValueError, match="windows"):
        active_users(df, windows=())
    with pytest.raises(ValueError, match="windows"):
        active_users(df, windows=(0,))


def test_frequent_paths_hand_computed(spark):
    from rhq_metrics_spark.operators.funnel import frequent_paths

    rows = [
        # user 1: v>c>v>p  -> paths v>c>v, c>v>p
        (1, "v", 10, 1.0), (1, "c", 20, 1.0), (1, "v", 30, 1.0),
        (1, "p", 40, 1.0),
        # user 2: v>c>v    -> path v>c>v
        (2, "v", 10, 1.0), (2, "c", 20, 1.0), (2, "v", 30, 1.0),
        # user 3: one event, no complete path
        (3, "v", 10, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, metric string, ts long, value double"
    )
    got = [
        (r["path"], r["occurrences"], r["n_users"], r["rank"])
        for r in frequent_paths(df, length=3, k=10).collect()
    ]
    assert got == [("v>c>v", 2, 2, 1), ("c>v>p", 1, 1, 2)]
    # length=2 degenerates to the transition pair multiset
    pairs = {
        r["path"]: r["occurrences"]
        for r in frequent_paths(df, length=2, k=10).collect()
    }
    assert pairs == {"v>c": 2, "c>v": 2, "v>p": 1}


def test_frequent_paths_same_ts_composite_order_and_validation(spark):
    import pytest

    from rhq_metrics_spark.operators.funnel import frequent_paths

    rows = [(1, "b", 10, 2.0), (1, "a", 10, 1.0), (1, "c", 20, 1.0)]
    df = spark.createDataFrame(
        rows, "user_id long, metric string, ts long, value double"
    )
    got = [r["path"] for r in frequent_paths(df, length=2, k=10).collect()]
    # same-ts tie orders by type: a before b
    assert sorted(got) == ["a>b", "b>c"]
    with pytest.raises(ValueError, match="length"):
        frequent_paths(df, length=1)
    with pytest.raises(ValueError, match="k"):
        frequent_paths(df, k=0)


def test_frequent_paths_null_type_filtered(spark):
    """ADVICE r13: a NULL event type must not yield a silently
    shortened 'complete' path via concat_ws — null-type rows are
    filtered up front, so the surviving events become adjacent."""
    from rhq_metrics_spark.operators.funnel import frequent_paths

    rows = [
        (1, "v", 10, 1.0), (1, None, 20, 1.0), (1, "c", 30, 1.0),
        (1, "p", 40, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, metric string, ts long, value double"
    )
    got = [
        (r["path"], r["occurrences"])
        for r in frequent_paths(df, length=3, k=10).collect()
    ]
    # without the filter, concat_ws('>', v, null, c) -> "v>c" would be
    # counted as complete at length 3; with it the timeline is v,c,p
    assert got == [("v>c>p", 1)]


def test_funnel_step_latency_hand_computed(spark):
    """Latencies between first-touch completions, exact lower median
    (odd and even n), window_ms exclusion."""
    from rhq_metrics_spark.operators.funnel import funnel_step_latency

    rows = [
        # u1: view@10 -> click@30 (lat 20) -> buy@100 (lat 70)
        (1, "view", 10), (1, "click", 30), (1, "buy", 100),
        # u2: view@10 -> click@20 (lat 10), no buy
        (2, "view", 10), (2, "click", 20),
        # u3: view@10 -> click@50 (lat 40) -> buy@60 (lat 10)
        (3, "view", 10), (3, "click", 50), (3, "buy", 60),
        # u4: click@5 only (no anchor -> excluded)
        (4, "click", 5),
    ]
    df = spark.createDataFrame(rows, "user_id long, metric string, ts long")
    got = {
        r["step_idx"]: (
            r["step"], r["users"], r["sum_ms"], r["mean_ms"], r["p50_ms"],
            r["max_ms"],
        )
        for r in funnel_step_latency(df, ["view", "click", "buy"]).collect()
    }
    # click latencies: 20, 10, 40 -> n=3, sum=70, mean=23, p50=20, max=40
    assert got[2] == ("click", 3, 70, 23, 20, 40)
    # buy latencies: 70, 10 -> n=2 (even), sum=80, mean=40, p50=10 (lower
    # median = element (n+1) div 2 = 1st), max=70
    assert got[3] == ("buy", 2, 80, 40, 10, 70)
    # window_ms=45 anchored at step 1: u1 buy@100 > 10+45 excluded;
    # u3 click@50 > 55? no: 50 <= 55 kept, buy@60 excluded
    got_w = {
        r["step_idx"]: (r["users"], r["p50_ms"])
        for r in funnel_step_latency(
            df, ["view", "click", "buy"], window_ms=45
        ).collect()
    }
    assert got_w[2] == (3, 20)
    assert 3 not in got_w  # nobody converted to buy inside the window


def test_funnel_step_latency_validation(spark):
    import pytest

    from rhq_metrics_spark.operators.funnel import funnel_step_latency

    df = spark.createDataFrame([(1, "a", 1)], "user_id long, metric string, ts long")
    with pytest.raises(ValueError, match="steps"):
        funnel_step_latency(df, ["a"])


def test_attribution_last_touch_hand_computed(spark):
    """Last-touch credit with lookback exclusion, (none) bucket, and
    exact micro-unit value sums."""
    from rhq_metrics_spark.operators.funnel import attribution

    rows = [
        # u1: ad@10, email@20, BUY@30(v=1.5) -> email; BUY@100(v=2) ->
        #     email but outside lookback 50 -> (none)
        (1, "ad", 10, 0.0), (1, "email", 20, 0.0),
        (1, "buy", 30, 1.5), (1, "buy", 100, 2.0),
        # u2: BUY@5 with no touch -> (none)
        (2, "buy", 5, 0.5),
        # u3: ad@10, BUY@40(v=null) -> ad, credits 0 value
        (3, "ad", 10, 0.0), (3, "buy", 40, None),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, metric string, ts long, value double"
    )
    got = {
        r["touch_type"]: (r["conversions"], r["users"], r["value_micro"])
        for r in attribution(
            df, "buy", ["ad", "email"], lookback_ms=50
        ).collect()
    }
    assert got == {
        "email": (1, 1, 1_500_000),
        "ad": (1, 1, 0),
        "(none)": (2, 2, 2_500_000),
    }
    # no lookback: the late buy credits email
    got2 = {
        r["touch_type"]: r["conversions"]
        for r in attribution(df, "buy", ["ad", "email"]).collect()
    }
    assert got2 == {"email": 2, "ad": 1, "(none)": 1}


def test_attribution_validation(spark):
    import pytest

    from rhq_metrics_spark.operators.funnel import attribution

    df = spark.createDataFrame(
        [(1, "a", 1, 1.0)], "user_id long, metric string, ts long, value double"
    )
    with pytest.raises(ValueError, match="touch_types"):
        attribution(df, "buy", [])
    with pytest.raises(ValueError, match="conversion_type"):
        attribution(df, "buy", ["buy", "ad"])


def test_active_users_hll_registers_match_exact_merge(spark):
    """The windowed register merge equals building registers directly
    over each window's activity (mergeability), and raw_est tracks the
    exact count within HLL error at m=64."""
    import hashlib

    from rhq_metrics_spark.operators.funnel import active_users, active_users_hll
    from rhq_metrics_spark.pipelines.sketches import hll_registers

    rows = []
    for i in range(3000):
        h = int(hashlib.md5(f"hau:{i}".encode()).hexdigest(), 16)
        rows.append((h % 400, (h // 7) % 20_000))
    df = spark.createDataFrame(rows, "user_id long, ts long")
    P = 1000
    out = active_users_hll(df, period_ms=P, windows=(1, 7)).collect()
    got = {(r["period"], r["window_periods"]): r for r in out}

    # mergeability pin for one (period, window) cell: registers built
    # directly over the window's raw activity give the same summary
    import pyspark.sql.functions as F

    acts = {(u, t // P) for u, t in rows}
    hi = max(p for _, p in acts)
    probe_p, probe_w = hi, 7
    direct_rows = [
        (u, pa) for (u, pa) in acts if probe_p - probe_w < pa <= probe_p
    ]
    ddf = spark.createDataFrame(direct_rows, "user_id long, p long").select(
        F.lit(1).alias("g"), F.col("user_id")
    )
    direct = hll_registers(ddf, group_col="g", value_col="user_id")
    d_sum = direct.agg(
        F.count(F.lit(1)), F.sum(F.expr("cast(pow(2, 40 - rho) as bigint)"))
    ).first()
    cell = got[(probe_p, probe_w)]
    assert cell["regs_used"] == d_sum[0]
    assert cell["sum_scaled"] == d_sum[1] + (64 - d_sum[0]) * (1 << 40)

    # estimate sanity vs exact (HLL at m=64 ~ 13% rse; allow 4 sigma)
    exact = {
        (r["period"], r["window_periods"]): r["active_users"]
        for r in active_users(df, period_ms=P, windows=(1, 7)).collect()
    }
    for key, r in got.items():
        true = exact[key]
        if true >= 50:  # raw branch meaningful above linear-count range
            assert abs(r["raw_est"] - true) / true < 0.55, (key, r["raw_est"], true)


def test_active_users_hll_validation(spark):
    import pytest

    from rhq_metrics_spark.operators.funnel import active_users_hll

    df = spark.createDataFrame([], "user_id long, ts long")
    assert active_users_hll(df).count() == 0
    with pytest.raises(ValueError, match="windows"):
        active_users_hll(df, windows=())
