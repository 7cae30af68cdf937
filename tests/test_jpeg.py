"""Baseline JPEG codec (operators/jpeg.py): roundtrip exactness on
the closed-form seam, lossy-tolerance on gradients, marker/Huffman/
restart machinery, and the Arrow dispatch routing."""

import numpy as np
import pytest

from cr_data_pipeline_project_spark.operators import jpeg, multimodal


def test_constant_even_fill_is_bit_exact():
    """Even fills survive the whole lossy pipeline exactly (only DC,
    and Q[0,0]=16 divides 8*(v-128)) — the q237 oracle's seam."""
    for v in (0, 2, 64, 128, 200, 254):
        for h, w in [(8, 8), (5, 7), (16, 24), (1, 1), (10, 3)]:
            W, H, C, g = jpeg._parse_jpeg(jpeg.synth_jpeg(w, h, v))
            assert (W, H, C) == (w, h, 3)
            assert (g == v).all(), (v, h, w)


def test_constant_odd_fill_within_one_level():
    """Odd fills quantize the DC to the nearest even level — off by
    at most one code value, uniformly across the image."""
    for v in (1, 63, 129, 255):
        _, _, _, g = jpeg._parse_jpeg(jpeg.synth_jpeg(6, 6, v))
        assert np.unique(g).size == 1
        assert abs(int(g[0, 0, 0]) - v) <= 1


def _gradient(h, w):
    img = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        img[y, :, :] = np.clip(np.arange(w)[:, None] * 8 + y * 3, 0, 255)
    return img


def test_gradient_roundtrip_tolerance_444_420_gray():
    img = _gradient(24, 16)
    for sub in ("444", "420"):
        _, _, _, g = jpeg._parse_jpeg(jpeg.encode_baseline(img, subsample=sub))
        mae = np.abs(g.astype(int) - img.astype(int)).mean()
        assert mae < 6, (sub, mae)
    gray = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 255
    W, H, C, g = jpeg._parse_jpeg(jpeg.encode_baseline(gray))
    assert C == 1
    assert np.abs(g[:, :, 0].astype(int) - gray.astype(int)).mean() < 6


def test_restart_intervals_decode_identically():
    img = _gradient(32, 40)
    base = jpeg._parse_jpeg(jpeg.encode_baseline(img))[3]
    for ri in (1, 2, 3, 7):
        p = jpeg.encode_baseline(img, restart_interval=ri)
        assert np.array_equal(jpeg._parse_jpeg(p)[3], base), ri
    p420 = jpeg.encode_baseline(img, subsample="420", restart_interval=2)
    assert np.abs(
        jpeg._parse_jpeg(p420)[3].astype(int) - img.astype(int)
    ).mean() < 10


def test_rejects_corrupt_and_unsupported():
    good = jpeg.synth_jpeg(8, 8, 100)
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg._parse_jpeg(b"hello world")
    with pytest.raises(ValueError, match="truncated|no SOS"):
        jpeg._parse_jpeg(good[:40])
    # flip SOF0 -> SOF2 (progressive): refuse, never mis-decode
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline only"):
        jpeg._parse_jpeg(bytes(prog))
    # 16-bit quant table flag
    dqt = bytearray(good)
    j = dqt.find(b"\xff\xdb")
    dqt[j + 4] = 0x10  # pq=1
    with pytest.raises(ValueError, match="16-bit quant"):
        jpeg._parse_jpeg(bytes(dqt))


def test_huffman_canonical_tables_self_consistent():
    """Encode-side codes and decode-side table are inverses for all
    four Annex-K specs."""
    for spec in (
        jpeg.DC_LUMA_SPEC, jpeg.DC_CHROMA_SPEC,
        jpeg.AC_LUMA_SPEC, jpeg.AC_CHROMA_SPEC,
    ):
        enc = jpeg._canonical_codes(*spec)
        dec = jpeg._decode_table(*spec)
        assert len(enc) == len(spec[1])
        for sym, (code, length) in enc.items():
            assert dec[(length, code)] == sym


def test_amplitude_extend_roundtrips_all_categories():
    for v in list(range(-40, 41)) + [-1023, 1023, -512, 511]:
        cat = jpeg._category(v)
        coded = v if v >= 0 else v + (1 << cat) - 1
        assert jpeg._extend(coded, cat) == v


def test_decode_dispatch_routes_jpeg(spark):
    rows = [
        (1, jpeg.synth_jpeg(5, 4, 200), "image/jpeg", None, None, None),
        (2, b"\xff\xd8 broken", "image/jpeg", None, None, None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.decode_media_features(df).collect()}
    assert out[1].decode_error is None
    assert (out[1].width, out[1].height) == (5, 4)
    assert abs(out[1].feat[0] - 200 / 255.0) < 1e-9
    assert out[2].decode_error is not None


def test_resize_media_routes_jpeg(spark):
    rows = [(1, jpeg.synth_jpeg(16, 12, 80), "image/jpeg", None, None, None)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_media(df, 8, 6).collect()[0]
    assert (out.width, out.height) == (8, 6) and out.resize_error is None
    _, _, _, g = jpeg._parse_jpeg(bytes(out.payload))
    assert (g == 80).all()  # even fill stays exact through re-encode
