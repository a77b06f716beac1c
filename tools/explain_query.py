#!/usr/bin/env python3
"""Dump .explain("formatted") for named registry queries to files —
the before/after plan evidence for optimization rounds.

Usage: python tools/explain_query.py <out_dir> <suffix> <query> [query...]
Writes <out_dir>/<query>_<suffix>.txt for each query, built at sf0.01.
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402
from rhq_metrics_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    out_dir, suffix = Path(sys.argv[1]), sys.argv[2]
    names = sys.argv[3:]
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="explain-query")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        p = out_dir / f"{name}_{suffix}.txt"
        p.write_text(plan)
        print(f"wrote {p} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
