#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf directory; compare row count, column names, and an
order-insensitive value comparison.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    return v


def _dtype_kind(dtype) -> str:
    """Collapse a pandas dtype to the equivalence class the driver's
    hasher distinguishes: integer vs float vs bool vs datetime vs other.

    DuckDB HUGEINT/DECIMAL sums come back as float64/object where Spark
    emits int64 — the driver's value-hash sees ``67.0`` vs ``67`` and
    fails even when every value is numerically identical.  Compare kinds
    so the local gate catches exactly that class of oracle-typing bug
    (the r4 ``b13_hist_quantile`` escape)."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in ("M", "m"):
        return "datetime"
    return "other"


def compare_frames(sdf, odf) -> list[str]:
    """Driver-parity compare: row count, sorted column names, per-column
    dtype kind, then an order-insensitive 6-dp value compare.  Returns a
    list of human-readable mismatch descriptions (empty == match)."""
    status: list[str] = []
    scols, srows = _frame_to_rows(sdf)
    ocols, orows = _frame_to_rows(odf)
    if len(srows) != len(orows):
        status.append(f"rowcount {len(srows)} != {len(orows)}")
    if scols != ocols:
        status.append(f"columns {scols} != {ocols}")
        return status
    for c in scols:
        sk, ok = _dtype_kind(sdf[c].dtype), _dtype_kind(odf[c].dtype)
        if sk != ok and "other" not in (sk, ok):
            status.append(
                f"dtype[{c}] {sdf[c].dtype}({sk}) != {odf[c].dtype}({ok})")
    if not status:
        mismatches = sum(1 for a, b in zip(srows, orows) if a != b)
        if mismatches:
            status.append(f"{mismatches}/{len(srows)} row mismatches")
            for a, b in zip(srows, orows):
                if a != b:
                    print(f"    spark : {a}\n    oracle: {b}")
                    break
    return status


def _frame_to_rows(df) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(r[c]) for c in cols) for r in df.to_dict("records")]
    rows.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return cols, rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from rhq_metrics_spark.session import get_spark

    spark = get_spark(app_name="correctness-check", master="local[8]",
                      shuffle_partitions=16)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle — rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                failures.append(name)
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        status = compare_frames(sdf, odf)
        if status:
            print(f"FAIL  {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
