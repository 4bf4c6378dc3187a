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


# --- WAV (RIFF PCM) codec ------------------------------------------

from new_kafka_consumer_to_hadoop_hdfs_spark.operators.multimodal import (  # noqa: E402
    decode_wav,
    encode_wav,
    wav_samples_for_text,
)

GOLDEN_SAMPLES = [100, -200, 300, -32768, 32767, 0]  # 3 frames x 2 ch


def _golden_wav(junk_first: bool = False, junk_size: int = 5) -> bytes:
    """Spec-built 2-channel 8kHz 16-bit PCM WAV — constructed from the
    RIFF spec with raw struct packing, NOT with encode_wav. Includes a
    junk chunk (odd-size by default → pad byte) either before or after
    fmt, so decode must walk chunks for real."""
    data = struct.pack("<6h", *GOLDEN_SAMPLES)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    junk = b"JUNK" + struct.pack("<I", junk_size) + b"\xaa" * junk_size
    junk += b"\x00" * (junk_size & 1)
    fmt_chunk = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    data_chunk = b"data" + struct.pack("<I", len(data)) + data
    body = (
        b"WAVE" + (junk + fmt_chunk if junk_first else fmt_chunk + junk)
        + data_chunk
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@pytest.mark.parametrize("junk_first", [False, True])
def test_decode_wav_golden_walks_chunks(junk_first):
    ch, sr, frames, samples = decode_wav(_golden_wav(junk_first=junk_first))
    assert (ch, sr, frames) == (2, 8000, 3)
    assert samples == GOLDEN_SAMPLES


def test_decode_wav_even_junk_chunk_no_pad():
    ch, sr, frames, samples = decode_wav(_golden_wav(junk_size=4))
    assert (ch, sr, frames, samples) == (2, 8000, 3, GOLDEN_SAMPLES)


def test_wav_roundtrip_and_own_junk_chunk():
    payload = encode_wav(GOLDEN_SAMPLES, 2, 8000)
    assert b"LIST" in payload  # the encoder's odd-size chunk is present
    assert decode_wav(payload) == (2, 8000, 3, GOLDEN_SAMPLES)
    # mono, extreme values
    mono = [-32768, 32767, -1, 1, 0]
    assert decode_wav(encode_wav(mono, 1, 16000)) == (1, 16000, 5, mono)


def test_decode_wav_rejects_bad_inputs():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"RIFX" + _golden_wav()[4:])
    with pytest.raises(ValueError, match="no data chunk"):
        g = _golden_wav()
        decode_wav(g[: g.index(b"data")])
    with pytest.raises(ValueError, match="data chunk before fmt"):
        g = _golden_wav()
        fmt_at = g.index(b"fmt ")
        data_at = g.index(b"data")
        rearranged = g[:12] + g[data_at:] + g[fmt_at:data_at]
        decode_wav(rearranged)
    with pytest.raises(ValueError, match="unsupported WAV variant"):
        g = bytearray(_golden_wav())
        struct.pack_into("<H", g, g.index(b"fmt ") + 8, 3)  # float PCM
        decode_wav(bytes(g))
    with pytest.raises(ValueError, match="overruns"):
        decode_wav(_golden_wav()[:-4])


def test_encode_wav_rejects_bad_shapes():
    with pytest.raises(ValueError, match="divide"):
        encode_wav([1, 2, 3], 2, 8000)
    with pytest.raises(ValueError, match="channels"):
        encode_wav([1, 2], 0, 8000)


def test_wav_sample_rule_matches_oracle_contract():
    tb = b"hello spark"  # n=11 -> ch=(11%2)+1=2, sr=8000*((11%3)+1)=24000, fr=(11%6)+3=8
    ch, sr, samples = wav_samples_for_text(tb)
    assert (ch, sr, len(samples)) == (2, 24000, 16)
    p = 13
    c = tb[p % len(tb)]
    assert samples[p] == ((c * 31 + p * 17) % 65536) - 32768
    with pytest.raises(ValueError):
        wav_samples_for_text(b"")


def test_decode_stub_dispatches_wav():
    d = decode_stub(_golden_wav(), "audio/wav")
    assert (d["channels"], d["sample_rate"], d["frames"]) == (2, 8000, 3)
    assert d["samples"] == GOLDEN_SAMPLES


# --- Property-based codec checks (pure Python — no Spark session) ---

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=17),
    height=st.integers(min_value=1, max_value=9),
    data=st.data(),
)
def test_bmp_roundtrip_property(width, height, data):
    """encode→decode is the identity for EVERY dimension pair (all four
    padding residues) and arbitrary pixel bytes — the property the
    golden fixture spot-checks, over the whole small-dim space."""
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=width * height * 3,
                max_size=width * height * 3,
            )
        )
    )
    assert decode_bmp(encode_bmp(px, width, height)) == (width, height, px)


@settings(max_examples=200, deadline=None)
@given(
    channels=st.integers(min_value=1, max_value=4),
    frames=st.integers(min_value=1, max_value=32),
    rate=st.sampled_from([8000, 16000, 44100]),
    data=st.data(),
)
def test_wav_roundtrip_property(channels, frames, rate, data):
    """encode→decode identity for any channel count / frame count /
    int16 sample values (incl. both extremes), across the encoder's
    odd-size junk chunk."""
    n = channels * frames
    samples = data.draw(
        st.lists(
            st.integers(-32768, 32767), min_size=n, max_size=n
        )
    )
    assert decode_wav(encode_wav(samples, channels, rate)) == (
        channels, rate, frames, samples,
    )


@settings(max_examples=150, deadline=None)
@given(text=st.text(alphabet=st.characters(codec="ascii"), min_size=1, max_size=64))
def test_pixel_and_sample_rules_total_on_nonempty_ascii(text):
    """The fixture rules must be TOTAL on non-empty ASCII input (any
    doc the oracle's WHERE clause admits must encode): dims/frames in
    their documented ranges, buffers exactly sized, every channel value
    a byte / int16."""
    tb = text.encode("utf-8")
    w, h, px = bmp_pixels_for_text(tb)
    assert 2 <= w <= 6 and 2 <= h <= 4 and len(px) == w * h * 3
    ch, sr, samples = wav_samples_for_text(tb)
    assert ch in (1, 2) and sr in (8000, 16000, 24000)
    assert len(samples) % ch == 0
    assert all(-32768 <= s <= 32767 for s in samples)
    # and the full encode->decode path agrees with the rules
    assert decode_bmp(encode_bmp(px, w, h)) == (w, h, px)
    assert decode_wav(encode_wav(samples, ch, sr))[3] == samples


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


# --- PNG codec (round 12, VERDICT r11 task 5) -----------------------

from new_kafka_consumer_to_hadoop_hdfs_spark.operators.multimodal import (  # noqa: E402
    _png_chunk,
    decode_png,
    encode_png,
    png_pixels_for_text,
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


@pytest.mark.parametrize("filter_offset", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_leading_filter(filter_offset):
    """Each of the five PNG filter types leads some encoding (offset
    picks the first row's filter; rows cycle from there), and
    encode→decode is the identity under all of them — so
    None/Sub/Up/Average/Paeth reconstruction are each load-bearing."""
    w, h = 5, 6  # 6 rows: every filter type appears at least once
    px = bytes((i * 37 + 11) % 256 for i in range(w * h * 3))
    assert decode_png(encode_png(px, w, h, filter_offset=filter_offset)) == (
        w, h, px,
    )


@settings(max_examples=200, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=11),
    height=st.integers(min_value=1, max_value=8),
    filter_offset=st.integers(min_value=0, max_value=4),
    data=st.data(),
)
def test_png_roundtrip_property(width, height, filter_offset, data):
    """encode→decode identity for arbitrary dims, pixels, and filter
    phase — across chunk CRCs, the ancillary tEXt chunk, the split
    IDAT pair, and the zlib stream."""
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=width * height * 3,
                max_size=width * height * 3,
            )
        )
    )
    assert decode_png(
        encode_png(px, width, height, filter_offset=filter_offset)
    ) == (width, height, px)


def test_png_decoder_concatenates_idats_and_skips_ancillary():
    """Structural honesty: the encoder's output genuinely contains two
    IDAT chunks and a tEXt chunk — the decoder features under test are
    present in every fixture file, not hypothetical."""
    px = bytes(range(0, 90))  # 5x6 RGB
    payload = encode_png(px, 5, 6)
    assert payload.count(b"IDAT") == 2
    assert payload.count(b"tEXt") == 1


def test_png_decode_rejects_bad_inputs():
    px = bytes(27)  # 3x3
    good = encode_png(px, 3, 3)

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"BM" + good)
    # flip one byte inside the first IDAT's data: CRC must catch it
    idat_pos = good.index(b"IDAT")
    corrupted = bytearray(good)
    corrupted[idat_pos + 4] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupted))
    # truncation loses IEND
    with pytest.raises(ValueError, match="IHDR or IEND|truncated"):
        decode_png(good[:-13])
    # unsupported variant: grayscale color type in an otherwise valid file
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0)
    bad_variant = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        decode_png(bad_variant)
    with pytest.raises(ValueError):
        encode_png(px, 4, 3)  # wrong buffer size


@settings(max_examples=150, deadline=None)
@given(text=st.text(alphabet=st.characters(codec="ascii"), min_size=1, max_size=64))
def test_png_pixel_rule_total_and_roundtrips(text):
    """The PNG fixture rule is total on non-empty ASCII: dims in range,
    buffer exactly sized, offset in [0,5), and the full encode→decode
    path reproduces the rule's pixels."""
    tb = text.encode("utf-8")
    w, h, off, px = png_pixels_for_text(tb)
    assert 2 <= w <= 8 and 2 <= h <= 6 and 0 <= off <= 4
    assert len(px) == w * h * 3
    assert decode_png(encode_png(px, w, h, filter_offset=off)) == (w, h, px)


def test_png_pixel_rule_matches_oracle_contract():
    # the DuckDB oracle restates exactly this rule; pin it here too
    tb = b"hello spark"  # n=11 -> w=(11%7)+2=6, h=(11%5)+2=3, off=11%5=1
    w, h, off, px = png_pixels_for_text(tb)
    assert (w, h, off) == (6, 3, 1)
    p = 7
    c = tb[p % len(tb)]
    assert px[3 * p] == (c + 2 * p) % 256
    assert px[3 * p + 1] == (c * 5 + 3) % 256
    assert px[3 * p + 2] == (p * p + c) % 256
    with pytest.raises(ValueError):
        png_pixels_for_text(b"")


def test_decode_stub_dispatches_png():
    w, h, off, px = png_pixels_for_text(b"seam check")
    d = decode_stub(encode_png(px, w, h, filter_offset=off), "image/png")
    assert (d["width"], d["height"], d["pixels"]) == (w, h, px)


def test_png_no_idat_raises_value_error():
    """Review-found (r12): a CRC-valid PNG with IHDR+IEND but zero
    IDAT chunks must raise the codec's documented ValueError, not leak
    zlib.error past the decode_stub seam's malformed-media contract."""
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0)
    payload = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IDAT"):
        decode_png(payload)
    # and a present-but-corrupt stream classifies the same way
    import zlib as _zlib

    bad = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(
        b"IDAT", b"\x00not-deflate"
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="zlib|corrupt"):
        decode_png(bad)


# --- GIF87a codec (round 13) ------------------------------------------


def _gif_parts(text: bytes):
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.multimodal import (
        encode_gif,
        gif_pixels_for_text,
    )

    w, h, pal, idx = gif_pixels_for_text(text)
    return w, h, pal, idx, encode_gif(idx, w, h, pal)


def test_gif_roundtrip_and_extension_skip():
    """The container walk end-to-end: header, global color table, a
    COMMENT extension the decoder must skip by sub-block structure,
    sub-blocked LZW data, trailer."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.multimodal import (
        decode_gif,
    )

    w, h, pal, idx, payload = _gif_parts(b"The quick brown fox!")
    assert payload[:6] == b"GIF87a"
    assert b"\x21\xfe" in payload  # the comment extension is present
    W, H, px = decode_gif(payload)
    assert (W, H) == (w, h)
    assert px == b"".join(bytes(pal[i]) for i in idx)


@given(
    st.integers(min_value=2, max_value=8),
    st.binary(min_size=1, max_size=4000),
)
@settings(max_examples=120, deadline=None)
def test_gif_lzw_roundtrip_property(mcs, raw):
    """The matched LZW pair round-trips ANY symbol stream at every
    minimum code size — including low-entropy streams that drive the
    dictionary to 4096 (CLEAR + reset) and repeated prefixes that
    force the KwKwK reconstruction case."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.multimodal import (
        _lzw_compress,
        _lzw_decompress,
    )

    syms = bytes(b % (1 << mcs) for b in raw)
    assert _lzw_decompress(_lzw_compress(syms, mcs), mcs) == syms


def test_gif_lzw_table_full_and_kwkwk():
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.multimodal import (
        _lzw_compress,
        _lzw_decompress,
    )

    # KwKwK: the canonical aaa... stream emits codes equal to the
    # decoder's next unassigned entry on every other step
    for pat in (b"\x00" * 50000, bytes([0, 1]) * 25000,
                bytes(range(4)) * 12000):
        assert _lzw_decompress(_lzw_compress(pat, 2), 2) == pat


def test_gif_decode_rejects_bad_inputs():
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.multimodal import (
        decode_gif,
    )

    _, _, _, _, payload = _gif_parts(b"hello")
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + payload[6:])
    # truncate the LZW stream mid-sub-block: EOI never arrives
    cut = payload[: len(payload) - 6]
    with pytest.raises((ValueError, IndexError)):
        decode_gif(cut)
    # interlaced flag set -> unsupported, loud. The descriptor offset
    # is computed structurally (header + palette + the 18-byte comment
    # extension), not byte-searched — 0x2C can occur in palette data.
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.multimodal import (
        gif_pixels_for_text,
    )

    _, _, pal, _ = gif_pixels_for_text(b"hello")
    desc = 13 + 3 * len(pal) + 18
    mutated = bytearray(payload)
    assert mutated[desc] == 0x2C
    mutated[desc + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(mutated))


def test_decode_stub_dispatches_gif():
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.multimodal import (
        decode_stub,
    )

    w, h, pal, idx, payload = _gif_parts(b"dispatch me")
    d = decode_stub(payload, "image/gif")
    assert (d["width"], d["height"]) == (w, h)
    assert d["pixels"] == b"".join(bytes(pal[i]) for i in idx)


def test_gif_pixel_rule_matches_oracle_contract():
    """The fixture rule the DuckDB oracle restates: dims, palette
    size, index arithmetic, channel formulas — changing any of these
    requires changing the oracle SQL in lockstep."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.multimodal import (
        gif_pixels_for_text,
    )

    text = b"oracle-contract"
    n = len(text)
    w, h, pal, idx = gif_pixels_for_text(text)
    assert (w, h) == ((n % 6) + 2, (n % 4) + 2)
    assert len(pal) == 1 << ((n % 3) + 4)
    for p in range(w * h):
        assert idx[p] == (text[p % n] + 5 * p) % len(pal)
    j = idx[3]
    assert pal[j] == ((j * 7 + 1) % 256, (j * 11 + 3) % 256,
                      (j * 13 + 5) % 256)


def test_gif_decode_rejects_index_outside_palette():
    """ADVICE r13: a corrupt stream whose minimum code size exceeds the
    palette's bit width can decode symbols past the color table; the
    seam's fail-loud contract is ValueError, never a bare IndexError."""
    import struct

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.multimodal import (
        _lzw_compress,
        decode_gif,
    )

    # 4-entry palette (pal_bits=2) but mcs=3 smuggles symbol 5 through
    payload = bytearray(b"GIF87a")
    payload += struct.pack("<HHBBB", 2, 2, 0x80 | 1, 0, 0)
    for j in range(4):
        payload += bytes((j, j, j))
    payload += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
    payload.append(3)  # minimum code size
    packed = _lzw_compress(bytes([0, 1, 2, 5]), 3)
    payload.append(len(packed))
    payload += packed
    payload += b"\x00\x3b"
    with pytest.raises(ValueError, match="outside color table"):
        decode_gif(bytes(payload))


def test_gif_lzw_compress_rejects_empty_stream():
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.multimodal import (
        _lzw_compress,
    )

    with pytest.raises(ValueError, match="non-empty"):
        _lzw_compress(b"", 2)
