"""Pure-Python media codecs: BMP (BI_RGB 24-bit) and WAV (PCM 16-bit).

Zero-dependency (struct only), the same pattern as sources/avro_py.py:
a real, spec-conformant binary codec implemented against the public
file-format spec, so the multimodal decode seam (functions/
multimodal.py decode_image_real) is REAL for uncompressed containers
instead of a NotImplementedError stub — no PIL/opencv needed.

Reference parity: the reference repo (apurvam/streams-prototyping) has
no media handling at all; this belongs to the north-star multimodal
surface (BASELINE.json) where payload columns are opaque binary and
decode happens in Arrow-batched Python stages.

Decoders return summary features (dims, channel probes, pixel/sample
sums) rather than materializing full pixel arrays — what a curation
pipeline extracts per payload. Everything unsupported fails loudly
naming the exact fragment (compressed BMPs, non-PCM WAV, unknown
magic), matching avro_py's fail-naming-the-fragment contract.
"""

from __future__ import annotations

import struct

# ------------------------------------------------------------------ BMP

_BMP_FILE_HEADER = "<2sIHHI"  # magic, file size, 2 reserved, pixel offset
_BMP_INFO_HEADER = "<IiiHHIIiiII"  # BITMAPINFOHEADER (40 bytes)


def encode_bmp(width: int, height: int, pixel) -> bytes:
    """Minimal BI_RGB 24-bit BMP writer: bottom-up row order, rows
    padded to 4 bytes — the layout every real-world writer emits.

    ``pixel(x, y, c) -> 0..255`` with c in (0=B, 1=G, 2=R), x left-to-
    right, y top-to-bottom (image coordinates; this function handles
    the bottom-up storage flip)."""
    if width <= 0 or height <= 0:
        raise ValueError("encode_bmp needs positive dimensions")
    row_size = (3 * width + 3) // 4 * 4
    img_size = row_size * height
    out = bytearray()
    out += struct.pack(_BMP_FILE_HEADER, b"BM", 14 + 40 + img_size, 0, 0, 54)
    out += struct.pack(
        _BMP_INFO_HEADER, 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    for y in range(height - 1, -1, -1):  # bottom-up: last image row first
        row = bytearray()
        for x in range(width):
            row.append(pixel(x, y, 0))
            row.append(pixel(x, y, 1))
            row.append(pixel(x, y, 2))
        row += b"\x00" * (row_size - len(row))
        out += row
    return bytes(out)


def decode_bmp(payload: bytes) -> dict:
    """Decode a BI_RGB 24-bit BMP -> summary features.

    Handles both bottom-up (positive biHeight, the normal case) and
    top-down (negative biHeight) row order, and 4-byte row padding.
    Returns image-coordinate probes: ``top_left_b`` = blue channel at
    (0,0), ``bottom_right_r`` = red channel at (w-1,h-1) — these pin
    row order and padding handling exactly (an order bug flips them,
    while ``pixel_sum`` alone is order-invariant)."""
    if payload[:2] != b"BM":
        raise ValueError(f"not a BMP: magic {payload[:2]!r}")
    if len(payload) < 54:
        raise ValueError("truncated BMP: shorter than the two headers")
    _, file_size, _, _, px_off = struct.unpack_from(_BMP_FILE_HEADER, payload, 0)
    (
        hdr_size,
        width,
        raw_height,
        planes,
        bpp,
        compression,
        _img_size,
        _,
        _,
        _,
        _,
    ) = struct.unpack_from(_BMP_INFO_HEADER, payload, 14)
    if hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size} (< BITMAPINFOHEADER)")
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (biCompression={compression})")
    if bpp != 24:
        raise NotImplementedError(f"{bpp}-bit BMP (24-bit BI_RGB only)")
    if planes != 1:
        raise ValueError(f"invalid BMP: biPlanes={planes}")
    top_down = raw_height < 0
    height = -raw_height if top_down else raw_height
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid BMP dims {width}x{raw_height}")
    row_size = (3 * width + 3) // 4 * 4
    need = px_off + row_size * height
    if len(payload) < need:
        raise ValueError(f"truncated BMP: need {need} bytes, have {len(payload)}")

    pixel_sum = 0
    for y_img in range(height):
        y_stored = y_img if top_down else height - 1 - y_img
        base = px_off + y_stored * row_size
        row = payload[base : base + 3 * width]  # padding excluded
        pixel_sum += sum(row)

    def probe(x: int, y_img: int, c: int) -> int:
        y_stored = y_img if top_down else height - 1 - y_img
        return payload[px_off + y_stored * row_size + 3 * x + c]

    return {
        "width": width,
        "height": height,
        "bits_per_pixel": bpp,
        "n_frames": 1,
        "pixel_sum": pixel_sum,
        "top_left_b": probe(0, 0, 0),
        "bottom_right_r": probe(width - 1, height - 1, 2),
        "file_size": file_size,
    }


# ------------------------------------------------------------------ WAV

def encode_wav(samples, sample_rate: int = 16000, n_channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE writer: PCM (format 1), 16-bit little-endian.
    ``samples`` is a flat sequence of ints in [-32768, 32767]
    (interleaved if n_channels > 1; length must divide evenly)."""
    samples = list(samples)
    if n_channels < 1 or len(samples) % n_channels:
        raise ValueError("sample count must be a multiple of n_channels")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    out = bytearray()
    out += struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
    out += struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate, byte_rate,
        block_align, 16,
    )
    out += struct.pack("<4sI", b"data", len(data))
    out += data
    return bytes(out)


def decode_wav(payload: bytes) -> dict:
    """Decode a PCM 16-bit RIFF/WAVE file -> summary features.

    Walks RIFF chunks properly (fmt may be followed by LIST/fact
    chunks before data in foreign-written files; chunk sizes pad to
    even offsets per the RIFF spec)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(
            f"not a WAV: magic {payload[:4]!r}/{payload[8:12]!r}"
        )
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated WAV: chunk {cid!r} short")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("invalid WAV: missing fmt/data chunk")
    audio_fmt, n_channels, sample_rate, _, _, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if audio_fmt != 1:
        raise NotImplementedError(f"WAV format {audio_fmt} (PCM=1 only)")
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit WAV (16-bit only)")
    n = len(data) // 2
    samples = struct.unpack(f"<{n}h", data[: 2 * n])
    return {
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "n_samples": n // n_channels,
        "sample_sum": sum(samples),
        "first_sample": samples[0] if samples else None,
        "last_sample": samples[-1] if samples else None,
    }


# ------------------------------------------------------------- dispatch

def sniff_media(payload: bytes) -> str:
    """Identify a payload's container by magic bytes."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return "unknown"
