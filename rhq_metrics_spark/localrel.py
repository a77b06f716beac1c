"""Driver-built bounded frames as TRUE LocalRelations (r17 opt, guide
§4/§5).

``spark.createDataFrame(list_of_rows)`` does NOT build a LocalRelation:
it parallelizes the rows as a defaultParallelism-slice Python RDD
(``LogicalRDD`` over ``ParallelCollectionRDD`` + ``PythonRDD``).  Every
scan or broadcast build of such a frame is a full Spark job whose 32
tasks each pay a Python-worker round trip — measured 0.4-0.8 s per
referencing query stage at local[32], re-paid every time an AQE stage
or broadcast subtree references the frame (exchange reuse does not
apply to non-shuffle subtrees).  That fixed cost is why several serve
KPIs ran FASTER at 8 cores than 32 (BENCH_r16 scaling block).

Routing the same rows through a pyarrow Table makes
``createDataFrame`` produce a genuine ``LocalRelation``: broadcast
builds collect it driver-side with NO job and zero tasks, and the
values are bit-exact (Arrow carries int64 / float64 / strings / nested
structs verbatim — verified for doubles by bit comparison).

``local_df`` is a drop-in for the ``createDataFrame(rows, schema)``
call shape used across this package (lists of tuples / Rows / dicts +
a DDL string or StructType).  Anything it cannot convert falls back to
the plain path — correctness never depends on the fast path.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T


def _spark_schema(schema) -> T.StructType | None:
    if isinstance(schema, T.StructType):
        return schema
    if isinstance(schema, str):
        try:
            parsed = T._parse_datatype_string(schema)
        except Exception:  # noqa: BLE001 — parser needs an active session
            return None
        return parsed if isinstance(parsed, T.StructType) else None
    return None


def _cell(value: Any, dt: T.DataType) -> Any:
    """Normalize one value for pyarrow: Rows/tuples inside struct
    columns become dicts (pa.array accepts dicts, not tuples, for
    struct types); arrays recurse."""
    if value is None:
        return None
    if isinstance(dt, T.StructType):
        if isinstance(value, dict):
            items = value
        else:  # Row or plain tuple, positional
            items = {f.name: v for f, v in zip(dt.fields, value)}
        return {
            f.name: _cell(items.get(f.name), f.dataType) for f in dt.fields
        }
    if isinstance(dt, T.ArrayType):
        return [_cell(v, dt.elementType) for v in value]
    if isinstance(dt, T.MapType):
        return {
            k: _cell(v, dt.valueType) for k, v in dict(value).items()
        }
    return value


def local_df(
    spark: SparkSession, rows: Sequence, schema
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` that yields a
    LocalRelation (no RDD, no job per referencing stage) whenever the
    rows round-trip through Arrow; falls back to the plain path
    otherwise.  ``rows``: tuples / Rows / dicts; ``schema``: DDL string
    or StructType."""
    st = _spark_schema(schema)
    if st is None:
        return spark.createDataFrame(rows, schema)
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(st)
        names = [f.name for f in st.fields]

        def _get(r, i: int, name: str):
            if isinstance(r, Row) or isinstance(r, dict):
                return r[name]
            return r[i]

        cols: list = []
        for i, field in enumerate(st.fields):
            vals = [_cell(_get(r, i, field.name), field.dataType) for r in rows]
            cols.append(pa.array(vals, type=arrow_schema.field(i).type))
        tbl = pa.Table.from_arrays(cols, names=names)
        return spark.createDataFrame(tbl, st)
    except Exception:  # noqa: BLE001 — exotic types take the slow path
        return spark.createDataFrame(rows, schema)
