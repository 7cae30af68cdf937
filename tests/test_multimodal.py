"""Multimodal plumbing: binary columns, Arrow batch shapes, frame
sampling plans. Decode kernels are stubbed by design (no media libs
here); the Spark-side contract is what's under test."""

import pytest
from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.operators import multimodal


def _media(spark):
    rows = [
        (1, b"\x89PNG fake image bytes", "image", 64, 64, None),
        (2, b"RIFF fake wav bytes" * 10, "audio", None, None, 2000),
        (3, b"\x00\x00ftyp fake mp4" * 50, "video", 320, 240, 5500),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_payload_meta_jvm_side(spark):
    out = {r["media_id"]: r for r in multimodal.attach_payload_meta(_media(spark)).collect()}
    assert out[1]["n_bytes"] == len(b"\x89PNG fake image bytes")
    import hashlib

    assert out[2]["payload_md5"] == hashlib.md5(b"RIFF fake wav bytes" * 10).hexdigest()


def test_extract_features_schema_and_determinism(spark):
    out1 = sorted(multimodal.extract_features(_media(spark), dim=8).collect())
    out2 = sorted(multimodal.extract_features(_media(spark), dim=8).collect())
    assert [r["feat"] for r in out1] == [r["feat"] for r in out2]
    for r in out1:
        assert len(r["feat"]) == 8
        assert r["payload_md5"] is not None and r["n_bytes"] > 0


def test_fake_decode_raises_on_null_payload():
    with pytest.raises(NotImplementedError):
        multimodal._fake_decode_features(None)


def test_frame_sample_plan(spark):
    plan = multimodal.frame_sample_plan(_media(spark), every_ms=1000, max_frames=4)
    rows = sorted(
        (r["media_id"], r["frame_ts_ms"]) for r in plan.where(F.col("media_id") == 3).collect()
    )
    # 5500ms @ 1000ms → 6 frames, capped at 4
    assert rows == [(3, 0), (3, 1000), (3, 2000), (3, 3000)]
