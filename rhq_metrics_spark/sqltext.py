"""Shared helpers for the parsed-SQL-string serving paths.

At serving latency, per-Column Py4J plan construction rivals execution
(SCALE.md "Plan-construction overhead is a serving axis"), so the hot
request paths compose filters/projections as SQL text and parse them
JVM-side in one round trip.  Everything interpolated into that text as
a string literal MUST go through :func:`sql_str`.
"""

from __future__ import annotations


def sql_str(v) -> str:
    """Render ``v`` as a safely-escaped Spark SQL string literal.

    Escapes backslashes then single quotes with backslashes — correct
    and injection-safe under Spark's DEFAULT parser mode, which
    :func:`rhq_metrics_spark.session.get_spark` pins explicitly
    (``spark.sql.parser.escapedStringLiterals=false``): under the
    legacy mode a trailing ``\\'`` would terminate the literal instead
    of escaping the quote (ADVICE r8).
    """
    return "'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'"
