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
