"""Multimodal plumbing: schemas, mapInPandas batch shape, stubbed
decode (no media libs in this container — SURVEY-mandated stub)."""

from __future__ import annotations

import pytest

from metacache_mpi_spark.operators import multimodal as mm


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", "image/png", 4, 4, None, b"\x89PNG fake bytes"),
        (2, "audio", "audio/wav", None, None, 2500, b"RIFF fake"),
        (3, "video", "video/mp4", 16, 16, 3200, b"\x00\x00ftyp fake"),
        (4, "image", "image/jpeg", 2, 2, None, None),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_extract_features_fake_decode(media):
    out = mm.extract_features(media, decode_fn=mm.fake_decode).collect()
    assert len(out) == 4
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == 15
    assert len(by_id[1]["feature"]) == 8
    assert abs(sum(by_id[1]["feature"]) - 1.0) < 1e-6
    assert by_id[4]["n_bytes"] == 0  # null payload handled


def test_extract_features_deterministic(media):
    a = {r["media_id"]: r["feature"] for r in mm.extract_features(media, mm.fake_decode).collect()}
    b = {r["media_id"]: r["feature"] for r in mm.extract_features(media.repartition(3), mm.fake_decode).collect()}
    assert a == b


def test_real_decode_is_stubbed(media):
    with pytest.raises(Exception) as e:
        mm.extract_features(media).collect()
    assert "NotImplementedError" in str(e.value) or "decode" in str(e.value)


def test_frame_sample_fanout(media):
    out = mm.frame_sample(media, every_ms=1000, decode_fn=mm.fake_decode).collect()
    # only media_id 3 is video, 3200ms -> frames at 0,1000,2000,3000
    assert sorted(r["frame_ms"] for r in out) == [0, 1000, 2000, 3000]
    assert {r["media_id"] for r in out} == {3}
