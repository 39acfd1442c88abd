"""Multimodal plumbing: the Arrow/mapInPandas boundary is real (schemas,
batch shapes, row expansion) even though the codec itself is a deterministic
stub."""

from __future__ import annotations

import pytest

from kinesis_demo_spark.operators import multimodal as M
from kinesis_demo_spark.queries.multimodal import media_table

SF = "/root/testdata/sf0.001"


def test_real_decode_is_stubbed_loudly():
    with pytest.raises(NotImplementedError):
        M.decode_image_real(b"\x89PNG\r\n")


def test_decode_features_schema_and_values(spark):
    media = media_table(spark, SF)
    out = M.decode_features(media)
    assert out.schema == M.FEATURES_SCHEMA
    row = out.filter("doc_id = 0").collect()[0]
    payload = media.filter("doc_id = 0").collect()[0].payload
    assert row.n_bytes == len(payload)
    assert row.first_byte == payload[0] and row.last_byte == payload[-1]
    assert row.byte_sum == sum(payload)
    assert row.checksum == sum(payload) % 997


def test_frame_sample_expands_rows(spark):
    media = media_table(spark, SF).limit(20).cache()
    frames = M.frame_sample(media).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    for m in media.collect():
        n_bytes = len(m.payload)
        expected_frames = (n_bytes % 4) + 1
        got = sorted(by_doc[m.doc_id], key=lambda r: r.frame_idx)
        assert len(got) == expected_frames
        stride = n_bytes // expected_frames
        for idx, fr in enumerate(got):
            assert fr.frame_idx == idx and fr.frame_offset == idx * stride
            assert fr.sample_byte == m.payload[idx * stride]


def test_payload_is_opaque_binary(spark):
    media = media_table(spark, SF)
    assert dict(media.dtypes)["payload"] == "binary"
