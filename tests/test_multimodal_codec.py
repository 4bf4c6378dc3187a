"""Real stdlib BMP codec (round 9): golden-fixture decode, roundtrip,
container-detail coverage (padding, bottom-up rows, pixel offset,
top-down variant), and error paths.

The golden fixture is built from the public format spec with raw
struct packing — NOT with encode_bmp — so encoder and decoder cannot
share a bug and both still pass.
"""

from __future__ import annotations

import struct

import pytest

from new_kafka_consumer_to_hadoop_hdfs_spark.operators.multimodal import (
    bmp_pixels_for_text,
    decode_bmp,
    decode_stub,
    encode_bmp,
)

# 2x2 image, top-down RGB: (255,0,0) (0,255,0) / (0,0,255) (255,255,255)
GOLDEN_PIXELS = bytes(
    [255, 0, 0, 0, 255, 0,
     0, 0, 255, 255, 255, 255]
)


def _golden_bmp(height_sign: int = 1, extra_gap: int = 0) -> bytes:
    """Spec-built 2x2 24-bit BMP. height_sign=-1 emits the top-down
    variant; extra_gap inserts bytes between header and pixels (legal —
    the pixel offset field points past them)."""
    stride = 8  # 2 px * 3 B = 6, padded to 8
    offset = 14 + 40 + extra_gap
    # row y=0 is RGB (255,0,0),(0,255,0) -> BGR bytes 00 00 FF, 00 FF 00
    # row y=1 is RGB (0,0,255),(255,255,255) -> BGR bytes FF 00 00, FF FF FF
    row0 = bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"
    row1 = bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00"
    body = row1 + row0 if height_sign > 0 else row0 + row1
    header = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, 2, 2 * height_sign, 1, 24, 0,
        stride * 2, 2835, 2835, 0, 0,
    )
    return header + info + (b"\xab" * extra_gap) + body


def test_decode_golden_bottom_up():
    w, h, px = decode_bmp(_golden_bmp())
    assert (w, h) == (2, 2)
    assert px == GOLDEN_PIXELS


def test_decode_golden_top_down_negative_height():
    w, h, px = decode_bmp(_golden_bmp(height_sign=-1))
    assert (w, h) == (2, 2)
    assert px == GOLDEN_PIXELS


def test_decode_honors_pixel_offset_gap():
    w, h, px = decode_bmp(_golden_bmp(extra_gap=10))
    assert (w, h) == (2, 2)
    assert px == GOLDEN_PIXELS


def test_encoder_matches_spec_built_golden():
    # encode_bmp writes image-size = body bytes; the golden does too
    assert encode_bmp(GOLDEN_PIXELS, 2, 2) == _golden_bmp()


@pytest.mark.parametrize("width,height", [(1, 1), (2, 3), (3, 2), (4, 4), (5, 2), (6, 3), (7, 5)])
def test_roundtrip_all_padding_widths(width, height):
    # deterministic pseudo-pixels; widths 1,2,3,5,6,7 exercise 1-3 pad bytes
    px = bytes((i * 37 + 11) % 256 for i in range(width * height * 3))
    w, h, out = decode_bmp(encode_bmp(px, width, height))
    assert (w, h, out) == (width, height, px)


def test_encode_rejects_wrong_buffer_size():
    with pytest.raises(ValueError, match="pixel buffer"):
        encode_bmp(b"\x00" * 5, 2, 2)


def test_decode_rejects_bad_magic():
    bad = b"XX" + _golden_bmp()[2:]
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(bad)


def test_decode_rejects_truncated_pixels():
    with pytest.raises(ValueError, match="pixel data short"):
        decode_bmp(_golden_bmp()[:-4])


def test_decode_rejects_unsupported_bpp():
    g = bytearray(_golden_bmp())
    struct.pack_into("<H", g, 14 + 14, 8)  # bpp field at info+14
    with pytest.raises(ValueError, match="unsupported BMP variant"):
        decode_bmp(bytes(g))


def test_decode_stub_dispatches_bmp():
    d = decode_stub(_golden_bmp(), "image/bmp")
    assert (d["width"], d["height"]) == (2, 2)
    assert d["pixels"] == GOLDEN_PIXELS


def test_decode_stub_still_raises_for_undecodable_media():
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x00\x01", "video/mp4")


def test_pixel_rule_matches_oracle_contract():
    # the DuckDB oracle restates exactly this rule; pin it here too
    tb = b"hello spark"  # n=11 -> w=(11%5)+2=3, h=(11%3)+2=4
    w, h, px = bmp_pixels_for_text(tb)
    assert (w, h) == (3, 4)
    p = 7  # arbitrary pixel
    c = tb[p % len(tb)]
    assert px[3 * p] == c
    assert px[3 * p + 1] == (c + p) % 256
    assert px[3 * p + 2] == (p * 7) % 256
    with pytest.raises(ValueError):
        bmp_pixels_for_text(b"")
