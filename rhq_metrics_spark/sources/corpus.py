"""Document-corpus ingestion: JSONL / CSV landing files → the canonical
``documents`` schema ``(doc_id, text, lang, source, n_chars)`` that
every pipeline operator (dedup, text filters, sampling, packing)
consumes.

This is the pipeline-side sibling of ``sources/wire.py`` (the
reference's REST wire adapter, MetricsServiceImpl.java addDataPoints
conventions): raw corpora land as JSON-lines or CSV dumps, and the
parse must be PERMISSIVE with a dead-letter side — a 100 TB crawl
always contains malformed lines, and silently dropping them is a
provenance bug.  Parsing is entirely ``from_json`` / native CSV reader
expressions — no Python in the parse path, so decode runs inside
codegen and scales with the scan.

- :func:`parse_corpus_jsonl` — JSON-line frame → ``(docs, rejects)``;
  rejects carry the raw line + a machine-readable reason
  (``malformed_json`` / ``missing_id`` / ``missing_text``).
- :func:`read_corpus_jsonl` / :func:`read_corpus_csv` — batch readers.
- :func:`read_corpus_stream` — the S9-style continuous-landing twin
  (``readStream`` on a directory; pair with any foreachBatch sink).

Field names are remappable (``field_map``) so heterogeneous dumps
("content", "body", "url"…) land without a pre-pass; ``n_chars`` is
computed when absent, ``lang``/``source`` default when absent —
missing OPTIONAL fields are data, missing REQUIRED fields (id, text)
are rejects.
"""

from __future__ import annotations

from collections.abc import Mapping

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

#: canonical output schema — matches /root/testdata documents.parquet
DOC_FIELDS = ("doc_id", "text", "lang", "source", "n_chars")

_DEFAULT_MAP = {f: f for f in DOC_FIELDS}


def corpus_schema(field_map: Mapping[str, str] | None = None) -> T.StructType:
    """Schema of ONE corpus JSON line, in SOURCE field names (values of
    ``field_map``), plus the corrupt-record column."""
    m = {**_DEFAULT_MAP, **(field_map or {})}
    return T.StructType(
        [
            T.StructField("_corrupt_record", T.StringType()),
            T.StructField(m["doc_id"], T.StringType()),
            T.StructField(m["text"], T.StringType()),
            T.StructField(m["lang"], T.StringType()),
            T.StructField(m["source"], T.StringType()),
            T.StructField(m["n_chars"], T.LongType()),
        ]
    )


def _finalize(
    parsed: DataFrame,
    m: Mapping[str, str],
    default_lang: str,
    default_source: str,
    raw_col,
) -> tuple[DataFrame, DataFrame]:
    """Shared validation/shaping: split (docs, rejects) and fill
    optional fields."""
    ok = (
        F.col("m._corrupt_record").isNull()
        & F.col(f"m.{m['doc_id']}").isNotNull()
        & F.col(f"m.{m['text']}").isNotNull()
    )
    rejects = parsed.filter(~ok).select(
        raw_col.alias("raw"),
        F.when(F.col("m._corrupt_record").isNotNull(), "malformed_json")
        .when(F.col(f"m.{m['doc_id']}").isNull(), "missing_id")
        .otherwise("missing_text")
        .alias("reason"),
    )
    docs = parsed.filter(ok).select(
        F.col(f"m.{m['doc_id']}").alias("doc_id"),
        F.col(f"m.{m['text']}").alias("text"),
        F.coalesce(F.col(f"m.{m['lang']}"), F.lit(default_lang)).alias("lang"),
        F.coalesce(F.col(f"m.{m['source']}"), F.lit(default_source)).alias(
            "source"
        ),
        F.coalesce(
            F.col(f"m.{m['n_chars']}"), F.length(F.col(f"m.{m['text']}"))
        ).alias("n_chars"),
    )
    return docs, rejects


def parse_corpus_jsonl(
    lines: DataFrame,
    field_map: Mapping[str, str] | None = None,
    default_lang: str = "und",
    default_source: str = "unknown",
    json_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """JSON-line frame → ``(docs, rejects)``.  ``docs`` has the
    canonical 5-column documents schema; ``rejects`` carries every raw
    line that failed to parse or lacked doc_id/text, with a reason."""
    m = {**_DEFAULT_MAP, **(field_map or {})}
    parsed = lines.select(
        F.col(json_col).alias("_raw"),
        F.from_json(
            F.col(json_col),
            corpus_schema(field_map),
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": "_corrupt_record",
            },
        ).alias("m"),
    )
    return _finalize(parsed, m, default_lang, default_source, F.col("_raw"))


def read_corpus_jsonl(
    spark: SparkSession,
    path: str,
    field_map: Mapping[str, str] | None = None,
    default_lang: str = "und",
    default_source: str = "unknown",
) -> tuple[DataFrame, DataFrame]:
    """Batch-read a JSONL corpus file/directory."""
    return parse_corpus_jsonl(
        spark.read.text(path), field_map, default_lang, default_source
    )


def read_corpus_csv(
    spark: SparkSession,
    path: str,
    field_map: Mapping[str, str] | None = None,
    default_lang: str = "und",
    default_source: str = "unknown",
    **reader_options: str,
) -> tuple[DataFrame, DataFrame]:
    """Batch-read a CSV corpus (header row required).  Malformed rows
    ride Spark's native PERMISSIVE corrupt-record column; the same
    required-field validation as JSONL applies on top.

    ``enforceSchema`` defaults to ``false`` here (ADVICE r12): with a
    user schema Spark otherwise binds columns POSITIONALLY and ignores
    the header names, so a dump whose columns are ordered differently
    from the schema would silently misparse (text landing in doc_id) —
    the opposite of this module's no-silent-corruption contract.  With
    ``enforceSchema=false`` Spark validates the header against the
    schema field names (the corrupt-record column is excluded from the
    check) and FAILS LOUDLY on a mismatched dump.  Pass
    ``enforceSchema="true"`` explicitly to restore positional binding
    for headerless-style dumps whose names genuinely differ."""
    m = {**_DEFAULT_MAP, **(field_map or {})}
    schema = corpus_schema(field_map)
    reader_options.setdefault("enforceSchema", "false")
    raw = spark.read.csv(
        path,
        schema=schema,
        header=True,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
        **reader_options,
    )
    parsed = raw.select(
        F.coalesce(
            F.col("_corrupt_record"), F.to_csv(F.struct(*[m[f] for f in DOC_FIELDS]))
        ).alias("_raw"),
        F.struct(
            "_corrupt_record", *[F.col(m[f]) for f in DOC_FIELDS]
        ).alias("m"),
    )
    return _finalize(parsed, m, default_lang, default_source, F.col("_raw"))


def read_corpus_stream(
    spark: SparkSession,
    path: str,
    field_map: Mapping[str, str] | None = None,
    default_lang: str = "und",
    default_source: str = "unknown",
) -> tuple[DataFrame, DataFrame]:
    """Continuous-landing twin: ``readStream`` over a JSONL directory.
    Returns streaming (docs, rejects) frames — route docs into any
    pipeline sink and rejects into a dead-letter directory."""
    lines = spark.readStream.format("text").load(path)
    return parse_corpus_jsonl(lines, field_map, default_lang, default_source)
