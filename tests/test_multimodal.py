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


def _bmp_bytes(pixels):
    """Minimal 24-bit BI_RGB BMP from an (H, W, 3) RGB uint8 array —
    bottom-up rows, BGR order, 4-byte row padding."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    stride = (w * 3 + 3) // 4 * 4
    raster = bytearray()
    for row in px[::-1]:  # bottom-up
        line = bytes(int(v) for p in row for v in p[::-1])  # RGB→BGR
        raster += line + b"\x00" * (stride - len(line))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(raster)


def _ppm_bytes(pixels):
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return (
        f"P6\n# comment\n{w} {h}\n255\n".encode() + px.tobytes()
    )


_PIXELS = [
    [[255, 0, 0], [0, 255, 0]],
    [[0, 0, 255], [10, 20, 30]],
]


def test_decode_bmp_roundtrip():
    import numpy as np

    img = mm.decode_image(_bmp_bytes(_PIXELS))
    assert img.shape == (2, 2, 3)
    assert np.array_equal(img, np.array(_PIXELS, dtype=np.uint8))


def test_decode_ppm_roundtrip():
    import numpy as np

    img = mm.decode_image(_ppm_bytes(_PIXELS))
    assert np.array_equal(img, np.array(_PIXELS, dtype=np.uint8))


def test_decode_unknown_codec_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n\x1a\n....")


def test_resize_nearest():
    import numpy as np

    img = np.array(_PIXELS, dtype=np.uint8)
    big = mm.resize_image(img, 4, 4)
    assert big.shape == (4, 4, 3)
    # each source pixel becomes a 2x2 block
    assert np.array_equal(big[0, 0], img[0, 0])
    assert np.array_equal(big[3, 3], img[1, 1])
    assert np.array_equal(mm.resize_image(big, 2, 2), img)


def test_real_decode_bmp_through_spark(spark):
    """The full Arrow path with a REAL decoder: BMP payloads → pixel
    stats; dims land in the feature head."""
    rows = [
        (10, "image", "image/bmp", 2, 2, None, _bmp_bytes(_PIXELS)),
        (11, "image", "image/x-portable-pixmap", 2, 2, None,
         _ppm_bytes(_PIXELS)),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {
        r["media_id"]: r["feature"]
        for r in mm.extract_features(media, decode_fn=mm.real_decode).collect()
    }
    import numpy as np

    want = mm.image_feature(np.array(_PIXELS, dtype=np.uint8))
    for mid in (10, 11):
        assert out[mid][:2] == [2.0, 2.0]  # (w, h)
        assert np.allclose(out[mid], want)


def test_decode_ppm_degenerate_dims_raise():
    with pytest.raises(ValueError, match="degenerate"):
        mm.decode_image(b"P6\n0 5\n255\n")
