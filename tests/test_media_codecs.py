"""Pure-Python BMP/WAV codecs (sources/media_py.py) — the real decode
behind decode_image_real / decode_audio_real. Spark-free.

The key independence check: decode_bmp is verified against a
HAND-ASSEMBLED byte string following the public BMP spec (the
canonical 2x2 24-bit example layout), not just against our own
encoder — so encoder and decoder can't share a mirrored bug.
"""

import struct

import pytest

from streams_prototyping_spark.sources import media_py


def _canonical_2x2() -> bytes:
    """The textbook 2x2 BI_RGB 24-bit BMP, assembled field-by-field
    from the spec: top-left blue, top-right green, bottom-left red,
    bottom-right white; bottom-up storage, 2 pad bytes per row."""
    header = struct.pack("<2sIHHI", b"BM", 70, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 2835, 2835, 0, 0)
    # stored first = BOTTOM image row: red (00 00 FF), white (FF FF FF)
    bottom = bytes([0x00, 0x00, 0xFF, 0xFF, 0xFF, 0xFF, 0x00, 0x00])
    # stored second = TOP image row: blue (FF 00 00), green (00 FF 00)
    top = bytes([0xFF, 0x00, 0x00, 0x00, 0xFF, 0x00, 0x00, 0x00])
    return header + info + bottom + top


def test_decode_reference_bytes():
    d = media_py.decode_bmp(_canonical_2x2())
    assert (d["width"], d["height"], d["bits_per_pixel"]) == (2, 2, 24)
    assert d["top_left_b"] == 255  # blue pixel at image (0,0)
    assert d["bottom_right_r"] == 255  # white pixel at image (1,1)
    assert d["pixel_sum"] == 255 * 6  # 6 lit channels, padding excluded
    assert d["file_size"] == 70


def test_encode_matches_reference_bytes():
    px = {(0, 0): (255, 0, 0), (1, 0): (0, 255, 0),
          (0, 1): (0, 0, 255), (1, 1): (255, 255, 255)}
    assert media_py.encode_bmp(2, 2, lambda x, y, c: px[(x, y)][c]) == \
        _canonical_2x2()


def test_top_down_bmp_flips_probes():
    """Negative biHeight = top-down storage: same stored pixel array
    must yield FLIPPED image-coordinate probes vs bottom-up."""
    raw = bytearray(_canonical_2x2())
    struct.pack_into("<i", raw, 14 + 8, -2)  # biHeight = -2
    d = media_py.decode_bmp(bytes(raw))
    assert d["height"] == 2
    # stored-first row is now the TOP: image (0,0) is the red pixel
    assert d["top_left_b"] == 0
    assert d["bottom_right_r"] == 0  # image (1,1) is now green
    assert d["pixel_sum"] == 255 * 6  # order-invariant


def test_row_padding_excluded_from_sum():
    # 3px-wide rows are 9 bytes -> padded to 12; pad bytes set nonzero
    # in a hand-built file must NOT leak into pixel_sum
    header = struct.pack("<2sIHHI", b"BM", 54 + 12, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 3, 1, 1, 24, 0, 12, 0, 0, 0, 0)
    row = bytes([1] * 9) + bytes([0xEE, 0xEE, 0xEE])
    d = media_py.decode_bmp(header + info + row)
    assert d["pixel_sum"] == 9


@pytest.mark.parametrize(
    "mutate, err, match",
    [
        (lambda b: b"XX" + b[2:], ValueError, "not a BMP"),
        (lambda b: b[:40], ValueError, "truncated"),
        (lambda b: b[:-4], ValueError, "truncated"),
    ],
)
def test_bmp_corruption_fails_loudly(mutate, err, match):
    with pytest.raises(err, match=match):
        media_py.decode_bmp(mutate(_canonical_2x2()))


def test_bmp_unsupported_named():
    raw = bytearray(_canonical_2x2())
    struct.pack_into("<H", raw, 14 + 14, 8)  # biBitCount = 8
    with pytest.raises(NotImplementedError, match="8-bit"):
        media_py.decode_bmp(bytes(raw))
    raw = bytearray(_canonical_2x2())
    struct.pack_into("<I", raw, 14 + 16, 1)  # biCompression = BI_RLE8
    with pytest.raises(NotImplementedError, match="compressed"):
        media_py.decode_bmp(bytes(raw))


def test_wav_roundtrip_and_chunk_walk():
    samples = [0, 1, -1, 32767, -32768, 12345]
    enc = media_py.encode_wav(samples, sample_rate=22050)
    d = media_py.decode_wav(enc)
    assert d == {
        "n_channels": 1, "sample_rate": 22050, "bits_per_sample": 16,
        "n_samples": 6, "sample_sum": sum(samples),
        "first_sample": 0, "last_sample": 12345,
    }
    # foreign writers put LIST/fact chunks between fmt and data (odd
    # sizes pad to even offsets) — the chunk walker must skip them
    fmt_off, data_off = 12, 12 + 8 + 16
    with_extra = (
        enc[:data_off]
        + struct.pack("<4sI", b"LIST", 5) + b"INFOX" + b"\x00"  # odd, padded
        + enc[data_off:]
    )
    # fix the RIFF size field
    with_extra = (
        with_extra[:4]
        + struct.pack("<I", len(with_extra) - 8)
        + with_extra[8:]
    )
    assert media_py.decode_wav(with_extra) == d
    assert fmt_off == 12  # layout assumption documented


def test_wav_stereo_interleave():
    # L/R interleaved: n_samples counts FRAMES, not raw int16s
    enc = media_py.encode_wav([1, 2, 3, 4], sample_rate=8000, n_channels=2)
    d = media_py.decode_wav(enc)
    assert d["n_channels"] == 2 and d["n_samples"] == 2
    assert d["sample_sum"] == 10


def test_wav_unsupported_named():
    enc = bytearray(media_py.encode_wav([1, 2]))
    struct.pack_into("<H", enc, 12 + 8, 3)  # audio format = IEEE float
    with pytest.raises(NotImplementedError, match="format 3"):
        media_py.decode_wav(bytes(enc))
    with pytest.raises(ValueError, match="not a WAV"):
        media_py.decode_wav(b"RIFF\x00\x00\x00\x00AVI ")


def test_dispatch_sniffs_and_names_unsupported():
    from streams_prototyping_spark.functions.multimodal import (
        decode_audio_real,
        decode_image_real,
    )

    bmp = _canonical_2x2()
    assert decode_image_real(bmp)["width"] == 2
    wav = media_py.encode_wav([7])
    assert decode_audio_real(wav)["n_samples"] == 1
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    with pytest.raises(NotImplementedError, match="png"):
        decode_image_real(png)
    with pytest.raises(NotImplementedError):
        decode_audio_real(bmp)
    assert media_py.sniff_media(b"\xff\xd8\xff\xe0") == "jpeg"
    assert media_py.sniff_media(b"plain text") == "unknown"
