"""Multimodal column plumbing: binary payload + metadata schema, decode
stub behavior, Arrow-batched feature extraction, frame sampling fan-out."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql.types import BinaryType, StructType

from kafka_stream_unify_order_messages_spark.operators import multimodal as M

TEXTS = [
    (0, "hello world, this is a fake image payload"),
    (1, "a" * 300),
    (2, "short"),
    (3, ""),
]


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(TEXTS, "doc_id long, text string")
    return M.synthetic_media(docs)


def test_synthetic_media_schema(media):
    schema: StructType = media.schema
    assert isinstance(schema["payload"].dataType, BinaryType)
    meta = schema["meta"].dataType
    assert [f.name for f in meta.fields] == [
        "media_type",
        "n_bytes",
        "digest",
        "frame_size",
    ]
    rows = {r.doc_id: r for r in media.collect()}
    assert bytes(rows[0].payload) == TEXTS[0][1].encode()
    assert rows[1].meta.n_bytes == 300
    assert rows[0].meta.media_type == "image"
    assert rows[1].meta.media_type == "audio"
    assert rows[2].meta.media_type == "video"
    assert rows[0].meta.digest == hashlib.md5(TEXTS[0][1].encode()).hexdigest()


def test_media_metadata_prunes_payload(media):
    meta = M.media_metadata(media)
    assert "payload" not in meta.columns
    # the payload column must be pruned from the scan, not carried along
    plan = meta._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan.lower().replace("n_bytes", "")


def test_decode_stub_raises_without_codec(media):
    from py4j.protocol import Py4JJavaError

    decoded = M.decode_media(media, fake_decode=False)
    with pytest.raises(Exception) as exc_info:
        decoded.collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, Py4JJavaError
    )


def test_fake_decode_deterministic(media):
    a = {r.doc_id: (r.width, r.height, r.mode) for r in
         M.decode_media(media, fake_decode=True).collect()}
    b = {r.doc_id: (r.width, r.height, r.mode) for r in
         M.decode_media(media, fake_decode=True).collect()}
    assert a == b
    w, h, mode = a[1]  # 300 x 'a' (0x61 = 97)
    assert w == 97 % 64 + 1
    assert h == 300 % 64 + 1
    assert mode == "RGB"


def test_byte_histogram_shares_sum_to_one(media):
    rows = M.byte_histogram_features(media, bins=16).collect()
    by_id = {r.doc_id: r.features for r in rows}
    assert len(by_id[0]) == 16
    assert abs(sum(by_id[0]) - 1.0) < 1e-9
    # 'a' = 0x61 -> bin 6 exclusively
    assert by_id[1][6] == 1.0
    # empty payload: all-zero histogram, no crash
    assert sum(by_id[3]) == 0.0


def test_frame_sample_fanout_and_digests(media):
    frames = M.frame_sample(media, frame_size=100, every_nth=2).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.doc_id, []).append(r)
    # 300 bytes / 100 per frame = 3 frames; every 2nd -> idx 0, 2
    idxs = sorted(r.frame_idx for r in by_id[1])
    assert idxs == [0, 2]
    f0 = next(r for r in by_id[1] if r.frame_idx == 0)
    assert bytes(f0.frame) == b"a" * 100
    assert f0.frame_digest == hashlib.md5(b"a" * 100).hexdigest()
    # empty payload still yields exactly one (empty) frame
    assert [r.frame_idx for r in by_id[3]] == [0]
