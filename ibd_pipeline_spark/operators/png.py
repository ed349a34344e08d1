"""Minimal pure-stdlib PNG codec (zlib + struct) — real image decode
with zero third-party dependencies.

The multimodal operators stub decode behind optional pillow because
this environment ships no imaging library; PNG, however, needs only
zlib (stdlib) — the same precedent as the RIFF/WAV and ISO-BMFF
parsers in operators/multimodal.py. Scope kept to what the pipeline
needs:

  decode: 8-bit-depth, non-interlaced, color types 0 (gray),
          2 (RGB), 4 (gray+alpha), 6 (RGBA); all five scanline
          filters (None/Sub/Up/Average/Paeth) per the PNG spec
          §9 filtering algorithms. Output is one grayscale byte per
          pixel (integer ITU-R BT.601 luma for color inputs).
  encode: grayscale (color type 0), filter 0, one IDAT.
  resize: nearest-neighbor on the grayscale plane — the cheap
          deterministic resampler, origin-anchored floor mapping
          (property-tested: constant images stay constant, the
          top-left corner is preserved).

Interlaced (Adam7), 16-bit, and palette images raise ValueError —
loudly unsupported rather than silently wrong.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def is_png(content: bytes) -> bool:
    return content[:8] == _SIG


def _chunks(content: bytes):
    pos = 8
    n = len(content)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        kind = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        yield kind, data
        pos += 12 + length  # length + type + data + crc
        if kind == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png_gray(content: bytes) -> "tuple[int, int, bytes]":
    """(width, height, grayscale bytes row-major). See module scope."""
    if not is_png(content):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    for kind, data in _chunks(content):
        if kind == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif kind == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"PNG: unsupported bit depth {bit_depth} (only 8)")
    if interlace != 0:
        raise ValueError("PNG: Adam7 interlace unsupported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"PNG: unsupported color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG: IDAT size mismatch")
    # Undo per-scanline filters (spec §9): each row is 1 filter byte
    # + `stride` filtered bytes; reconstruction references the row
    # above and the byte `channels` to the left.
    recon = bytearray(height * stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        off = y * stride
        prev_off = off - stride
        if f == 0:
            recon[off : off + stride] = line
        elif f == 1:  # Sub
            for x in range(stride):
                left = recon[off + x - channels] if x >= channels else 0
                recon[off + x] = (line[x] + left) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                up = recon[prev_off + x] if y else 0
                recon[off + x] = (line[x] + up) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = recon[off + x - channels] if x >= channels else 0
                up = recon[prev_off + x] if y else 0
                recon[off + x] = (line[x] + ((left + up) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                left = recon[off + x - channels] if x >= channels else 0
                up = recon[prev_off + x] if y else 0
                ul = recon[prev_off + x - channels] if (y and x >= channels) else 0
                recon[off + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter {f}")
    if channels == 1:
        return width, height, bytes(recon)
    gray = bytearray(width * height)
    for i in range(width * height):
        base = i * channels
        if channels == 2:  # gray + alpha
            gray[i] = recon[base]
        else:  # RGB / RGBA: integer BT.601 luma
            r, g, b = recon[base], recon[base + 1], recon[base + 2]
            gray[i] = (299 * r + 587 * g + 114 * b) // 1000
    return width, height, bytes(gray)


def encode_png(
    width: int, height: int, pixels: bytes, color_type: int = 0
) -> bytes:
    """8-bit PNG writer (filter 0 rows, one IDAT). color_type 0
    (gray, 1 byte/px), 2 (RGB, 3), 4 (gray+alpha, 2) or 6 (RGBA, 4);
    `pixels` is the raw row-major plane at that channel count."""
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"encode_png: unsupported color type {color_type}")
    if len(pixels) != width * height * channels:
        raise ValueError("encode_png: pixel buffer size mismatch")

    def chunk(kind: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + kind
            + data
            + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def encode_png_gray(width: int, height: int, gray: bytes) -> bytes:
    """Grayscale 8-bit PNG (color type 0) — see encode_png."""
    return encode_png(width, height, gray, color_type=0)


def resize_nearest(
    gray: bytes, width: int, height: int, target_w: int, target_h: int
) -> bytes:
    """Nearest-neighbor resample of a grayscale plane: source index =
    floor(tx · src/dst) per axis — origin-anchored floor mapping
    (the top-left corner maps to the top-left corner; the LAST
    destination pixel maps to floor((dst−1)·src/dst), which is not
    src−1 when downscaling — this is the standard OpenCV
    INTER_NEAREST convention, not a corners-align resample).
    Constant images stay constant."""
    out = bytearray(target_w * target_h)
    for ty in range(target_h):
        sy = ty * height // target_h
        row = sy * width
        orow = ty * target_w
        for tx in range(target_w):
            out[orow + tx] = gray[row + tx * width // target_w]
    return bytes(out)
