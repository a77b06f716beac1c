"""As-of join (union + last-value window strategy).

Oracle semantics: backward as-of — latest right row with
``right.ts <= left.ts`` per key (DuckDB ASOF JOIN / pandas merge_asof
defaults); left-join on no match; tolerance drops stale matches.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from rhq_metrics_spark.operators.asof import asof_join

T0 = 1_700_000_000_000


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", T0 + 100, 1.0),
            ("u1", T0 + 200, 2.0),
            ("u1", T0 + 50, 0.5),   # before any right row
            ("u2", T0 + 100, 9.0),  # key with no right rows at all
        ],
        "key string, ts long, lval double",
    )
    right = spark.createDataFrame(
        [
            ("u1", T0 + 60, 10.0),
            ("u1", T0 + 100, 20.0),  # equal-ts with a left row
            ("u1", T0 + 150, 30.0),
        ],
        "key string, ts long, rval double",
    )
    return left, right


def test_backward_match_and_left_semantics(spark):
    left, right = _frames(spark)
    out = {
        r["ts"]: r
        for r in asof_join(left, right, on=["key"]).collect()
        if r["key"] == "u1"
    }
    # equal timestamp matches (right.ts <= left.ts)
    assert out[T0 + 100]["rval_right"] == 20.0
    assert out[T0 + 100]["ts_right"] == T0 + 100
    # latest earlier row wins
    assert out[T0 + 200]["rval_right"] == 30.0
    # left row before all right rows -> null
    assert out[T0 + 50]["rval_right"] is None


def test_unmatched_key_is_null(spark):
    left, right = _frames(spark)
    u2 = asof_join(left, right, on=["key"]).filter(F.col("key") == "u2").collect()
    assert len(u2) == 1 and u2[0]["rval_right"] is None


def test_tolerance_drops_stale_matches(spark):
    left, right = _frames(spark)
    out = {
        r["ts"]: r
        for r in asof_join(left, right, on=["key"], tolerance_ms=40).collect()
        if r["key"] == "u1"
    }
    # ts=200 best match is 150 (50ms old) -> outside 40ms tolerance
    assert out[T0 + 200]["rval_right"] is None
    # ts=100 matches its own timestamp (0ms old)
    assert out[T0 + 100]["rval_right"] == 20.0


def test_row_count_preserved(spark):
    left, right = _frames(spark)
    assert asof_join(left, right, on=["key"]).count() == left.count()


def test_forward_direction(spark):
    left, right = _frames(spark)
    out = {
        r["ts"]: r
        for r in asof_join(left, right, on=["key"], direction="forward").collect()
        if r["key"] == "u1"
    }
    # earliest right row at-or-after each left ts
    assert out[T0 + 50]["rval_right"] == 10.0   # next right is at +60
    assert out[T0 + 100]["rval_right"] == 20.0  # equal ts matches
    assert out[T0 + 200]["rval_right"] is None  # nothing after +150


def test_forward_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r["ts"]: r
        for r in asof_join(
            left, right, on=["key"], direction="forward", tolerance_ms=5
        ).collect()
        if r["key"] == "u1"
    }
    assert out[T0 + 50]["rval_right"] is None  # +60 is 10ms away > 5ms
    assert out[T0 + 100]["rval_right"] == 20.0


def test_forward_matches_duckdb_asof(spark):
    """Cross-engine check on real data: forward asof == DuckDB ASOF with
    l.ts <= r.ts."""
    import duckdb
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev_raw = spark.read.parquet(f"{sf}/events.parquet")
    # ts is long nanos under nanosAsLong for TIMESTAMP(NANOS) files, a
    # timestamp(_ntz) for TIMESTAMP(MICROS) files; both floor to millis.
    ts_ms = (
        F.expr("ts div 1000000")
        if dict(ev_raw.dtypes)["ts"] in ("bigint", "long")
        else F.expr("unix_micros(cast(ts as timestamp)) div 1000")
    )
    ev = ev_raw.select("user_id", ts_ms.alias("ts"), "event_type", "value")
    left = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    right = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    got = {
        (r["user_id"], r["ts"]): (r["ts_right"], r["value_right"])
        for r in asof_join(left, right, on=["user_id"], direction="forward").collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW ev AS SELECT user_id, epoch_ms(ts) AS ts, event_type, value "
        f"FROM read_parquet('{sf}/events.parquet')"
    )
    exp = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            """
            WITH l AS (SELECT user_id, ts FROM ev WHERE event_type='purchase'),
                 r AS (SELECT user_id, ts, value FROM ev WHERE event_type='view')
            SELECT l.user_id, l.ts, r.ts, r.value
            FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
            """
        ).fetchall()
    }
    assert got == exp
