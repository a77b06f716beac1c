"""Guards against driver testdata schema drift.

Round 2 regression: the driver regenerated ``events.parquet`` with
``ts`` as TIMESTAMP(MICROS) (Spark: ``timestamp_ntz``) where round 1
shipped TIMESTAMP(NANOS) (Spark under ``nanosAsLong``: ``bigint``),
which broke every events-based query at the correctness gate.  These
tests pin the *contract* instead of the physical encoding: the entry
module's canonical point view must load and agree with DuckDB's
``epoch_ms`` regardless of how the parquet writer encoded timestamps.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def test_events_points_loads_any_ts_encoding(spark):
    pts = entry._events_points(spark, SF)
    assert dict(pts.dtypes) == {
        "metric": "string",
        "ts": "bigint",
        "value": "double",
        "user_id": "bigint",
        "props": "string",
    }
    assert pts.count() > 0


def test_events_ts_matches_duckdb_epoch_ms(spark):
    import duckdb

    got = {
        (r["metric"], r["ts"])
        for r in entry._events_points(spark, SF).limit(0).collect()
    }  # force analysis first; then compare a deterministic slice
    df = entry._events_points(spark, SF)
    spark_rows = sorted(
        (r["metric"], r["ts"], r["user_id"])
        for r in df.orderBy("ts", "metric", "user_id").limit(200).collect()
    )
    con = duckdb.connect()
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT event_type, epoch_ms(ts), user_id FROM "
            f"read_parquet('{SF}/events.parquet') ORDER BY 2, 1, 3 LIMIT 200"
        ).fetchall()
    )
    assert spark_rows == duck_rows
    assert got == set()


def test_all_tables_load(spark):
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        df = entry._table(spark, SF, t)
        assert len(df.columns) > 0, t
