"""Multimodal plumbing: binary payload columns through Arrow-batched
mapInPandas with the deterministic stub decoder."""

import hashlib

import pytest

from rhq_metrics_spark.pipelines.multimodal import (
    MEDIA_SCHEMA,
    fake_decode,
    frame_sample_plan,
    media_features,
    resize_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes 1", 640, 480, None, None, "png"),
        (2, "image", b"\x89PNG fake bytes 2", 1024, 768, None, None, "png"),
        (3, "audio", b"RIFF fake wav", None, None, 44100, 2_000, "pcm"),
        (4, "video", b"\x00\x00ftyp fake mp4", 1920, 1080, None, 3_500, "h264"),
        (5, "image", None, None, None, None, None, None),  # missing payload
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_media_features_deterministic(spark, media):
    out = {r["media_id"]: r for r in media_features(media).collect()}
    # checksums live in the canonical hex domain (mm_meta convention) so
    # VARCHAR-only SQL engines can reproduce them for oracle checks
    hx = b"\x89PNG fake bytes 1".hex().encode()
    assert out[1]["sha256"] == hashlib.sha256(hx).hexdigest()
    assert out[1]["feat_dim"] == 64
    assert out[1]["feat_mean"] is not None
    # feat_sum is the exact integer sum of the decoded uint32 words: the
    # 32-byte digest tiles 8x into 64 elements -> 8 * sum(LE words)
    dig = hashlib.sha256(hx).digest()
    words = [int.from_bytes(dig[i : i + 4], "little") for i in range(0, 32, 4)]
    assert out[1]["feat_sum"] == 8 * sum(words)
    assert out[5]["sha256"] is None  # null payload propagates, no crash
    # determinism across runs
    again = {r["media_id"]: r for r in media_features(media).collect()}
    assert out[2]["feat_mean"] == again[2]["feat_mean"]


def test_fake_decode_is_stub_for_none():
    with pytest.raises(NotImplementedError):
        fake_decode(None)


def test_frame_sample_plan(media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    # video id=4, duration 3500ms → frames at 0, 1000, 2000, 3000
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_resize_plan(media):
    out = resize_plan(media, 32, 32).collect()
    assert {r["media_id"] for r in out} == {1, 2, 5}
    byid = {r["media_id"]: r for r in out}
    assert byid[1]["width"] == 32 and byid[1]["height"] == 32
    assert byid[1]["resized_sha"] != byid[2]["resized_sha"]
    assert byid[5]["resized_sha"] is None


def test_metadata_filter_prunes_payload_read(media, spark, tmp_path):
    # metadata-only queries must never read the blob column: the parquet
    # ReadSchema has to exclude `payload` (column pruning)
    path = str(tmp_path / "media")
    media.write.parquet(path)
    scan = spark.read.parquet(path).filter("kind = 'image'").select("media_id", "width")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
    assert "ReadSchema" in plan


def test_media_from_documents_binary_roundtrip(spark):
    import hashlib

    from rhq_metrics_spark.pipelines.multimodal import media_from_documents

    docs = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "gamma")], "doc_id long, text string"
    )
    rows = {r["media_id"]: r for r in media_from_documents(docs).collect()}
    assert [rows[i]["kind"] for i in range(3)] == ["image", "audio", "video"]
    # payload is the real md5 digest bytes of the text
    assert bytes(rows[0]["payload"]) == hashlib.md5(b"alpha").digest()
    assert len(bytes(rows[1]["payload"])) == 16
    # typed metadata only where the kind warrants it
    assert rows[0]["width"] == 64 and rows[0]["duration_ms"] is None
    assert rows[1]["sample_rate"] == 16_000 and rows[1]["width"] is None
    assert rows[2]["duration_ms"] == 3000
