"""Corpus ingestion (sources/corpus.py): JSONL/CSV → canonical
documents schema, with dead-letter rejects — nothing silently dropped."""

from __future__ import annotations

import json

from rhq_metrics_spark.sources.corpus import (
    parse_corpus_jsonl,
    read_corpus_csv,
    read_corpus_jsonl,
    read_corpus_stream,
)


def _lines(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


def test_parse_corpus_jsonl_splits_docs_and_rejects(spark):
    lines = [
        json.dumps({"doc_id": "a", "text": "hello world", "lang": "en",
                    "source": "web", "n_chars": 11}),
        json.dumps({"doc_id": "b", "text": "ohne sprache"}),   # optionals absent
        json.dumps({"doc_id": "c"}),                            # missing text
        json.dumps({"text": "orphan"}),                         # missing id
        "{not json at all",                                     # malformed
    ]
    docs, rejects = parse_corpus_jsonl(_lines(spark, lines))
    got = {r["doc_id"]: r for r in docs.collect()}
    assert set(got) == {"a", "b"}
    assert got["a"]["lang"] == "en" and got["a"]["n_chars"] == 11
    # optional fields default; n_chars computed from the text
    assert got["b"]["lang"] == "und" and got["b"]["source"] == "unknown"
    assert got["b"]["n_chars"] == len("ohne sprache")
    reasons = sorted(r["reason"] for r in rejects.collect())
    assert reasons == ["malformed_json", "missing_id", "missing_text"]
    # every input line is accounted for — docs + rejects == lines
    assert docs.count() + rejects.count() == len(lines)


def test_parse_corpus_jsonl_field_map(spark):
    lines = [json.dumps({"id": "x", "content": "remapped body"})]
    docs, rejects = parse_corpus_jsonl(
        _lines(spark, lines), field_map={"doc_id": "id", "text": "content"}
    )
    row = docs.collect()[0]
    assert row["doc_id"] == "x" and row["text"] == "remapped body"
    assert rejects.count() == 0


def test_read_corpus_jsonl_and_feed_pipeline(spark, tmp_path):
    """Round trip through a landing file, then feed the parsed docs to
    a pipeline operator — the integration a user actually runs."""
    p = tmp_path / "dump.jsonl"
    p.write_text(
        "\n".join(
            json.dumps({"doc_id": str(i), "text": f"w{i} common tail"})
            for i in range(20)
        )
    )
    docs, rejects = read_corpus_jsonl(spark, str(p))
    assert docs.count() == 20 and rejects.count() == 0
    from rhq_metrics_spark.pipelines.sampling import priority_sample

    sampled = priority_sample(docs, k=5, weight_col="n_chars")
    assert sampled.count() == 5


def test_read_corpus_csv_with_rejects(spark, tmp_path):
    p = tmp_path / "dump.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "a,hello,en,web,5\n"
        "b,,de,web,\n"          # empty text -> missing_text
        "c,fine,,,\n"
    )
    docs, rejects = read_corpus_csv(spark, str(p))
    got = {r["doc_id"]: r for r in docs.collect()}
    assert set(got) == {"a", "c"}
    assert got["c"]["lang"] == "und" and got["c"]["n_chars"] == 4
    assert [r["reason"] for r in rejects.collect()] == ["missing_text"]


def test_read_corpus_stream_twin(spark, tmp_path):
    """The streaming twin parses the same landing files continuously;
    one availableNow pass over the directory == the batch read."""
    land = tmp_path / "land"
    land.mkdir()
    (land / "part1.jsonl").write_text(
        "\n".join(json.dumps({"doc_id": str(i), "text": f"t{i}"}) for i in range(5))
        + "\nbroken{line"
    )
    docs, rejects = read_corpus_stream(spark, str(land))
    assert docs.isStreaming and rejects.isStreaming
    out_docs = tmp_path / "out_docs"
    q = (
        docs.writeStream.format("parquet")
        .option("path", str(out_docs))
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.read.parquet(str(out_docs))
    assert got.count() == 5
    assert sorted(got.columns) == ["doc_id", "lang", "n_chars", "source", "text"]


def test_read_corpus_csv_misordered_header_fails_loudly(spark, tmp_path):
    """ADVICE r12: with a user schema Spark binds CSV columns
    positionally unless enforceSchema=false — a dump whose columns are
    ordered differently must ERROR, not silently land text in doc_id."""
    import pytest

    p = tmp_path / "swapped.csv"
    p.write_text("text,doc_id,lang,source,n_chars\nhello,a,en,web,5\n")
    docs, _ = read_corpus_csv(spark, str(p))
    with pytest.raises(Exception, match="CSV header does not conform"):
        docs.collect()
    # explicit opt-out restores positional binding for name-mismatched
    # dumps whose ORDER genuinely matches the canonical schema
    p2 = tmp_path / "renamed.csv"
    p2.write_text("id,body,lang,source,n_chars\na,hello,en,web,5\n")
    docs2, _ = read_corpus_csv(spark, str(p2), enforceSchema="true")
    assert docs2.collect()[0]["text"] == "hello"
