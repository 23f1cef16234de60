"""Baseline TIFF codec tests: little-endian round-trips through the
fixture writer (raw + PackBits), a HAND-BUILT big-endian (MM) gray
file, min-is-white inversion, palette color maps, PackBits edge cases,
and envelope refusals."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from parquet_on_fhir_spark.operators.multimodal import (
    _tiff_packbits,
    _tiff_unpackbits,
    decode_pixels,
    decode_tiff,
    encode_tiff,
)


def test_roundtrip_raw_and_packbits():
    rng = np.random.default_rng(9)
    for shape, pb in [((8, 8), False), ((8, 8), True), ((13, 7), True),
                      ((1, 1), False), ((5, 31), True)]:
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        if pb:
            img[::3] = img[0, 0]
        blob = encode_tiff(img, packbits=pb)
        w, h, out = decode_pixels(blob, "image/tiff")
        assert (w, h) == (shape[1], shape[0])
        assert np.array_equal(out, img), (shape, pb)


def test_packbits_edge_cases():
    for data in (b"", b"\x00", b"a" * 400, b"abc" + b"d" * 5 + b"efg",
                 bytes(range(256)) * 3, b"ab" * 100):
        enc = _tiff_packbits(data)
        assert _tiff_unpackbits(enc, len(data)) == data
    # -128 no-op byte must be skipped
    assert _tiff_unpackbits(b"\x80\x00a", 1) == b"a"
    with pytest.raises(ValueError, match="truncated"):
        _tiff_unpackbits(b"\x05ab", 6)


def _mm_gray_tiff(gray_rows, photometric):
    """Hand-built BIG-ENDIAN single-strip 8-bit gray TIFF."""
    h = len(gray_rows)
    w = len(gray_rows[0])
    data = bytes(v for row in gray_rows for v in row)
    entries = [
        (256, 3, 1, w << 16),   # SHORT values live in the HIGH half (MM)
        (257, 3, 1, h << 16),
        (258, 3, 1, 8 << 16),
        (259, 3, 1, 1 << 16),
        (262, 3, 1, photometric << 16),
        (277, 3, 1, 1 << 16),
        (278, 3, 1, h << 16),
        (279, 4, 1, len(data)),
    ]
    n = len(entries) + 1
    data_off = 8 + 2 + n * 12 + 4
    entries.append((273, 4, 1, data_off))
    entries.sort()
    out = struct.pack(">2sHI", b"MM", 42, 8) + struct.pack(">H", n)
    for tag, typ, cnt, val in entries:
        out += struct.pack(">HHII", tag, typ, cnt, val)
    out += struct.pack(">I", 0)
    return out + data


def test_big_endian_gray_and_min_is_white():
    rows = [[0, 100], [200, 255]]
    w, h, img = decode_tiff(_mm_gray_tiff(rows, photometric=1))
    assert (w, h) == (2, 2)
    assert img[0, 1].tolist() == [100, 100, 100]
    # photometric 0: min is WHITE -> inverted
    _, _, inv = decode_tiff(_mm_gray_tiff(rows, photometric=0))
    assert inv[0, 0].tolist() == [255, 255, 255]
    assert inv[1, 1].tolist() == [0, 0, 0]


def test_palette_tiff():
    """little-endian palette (photometric 3) with a 16-bit ColorMap."""
    idx = bytes([0, 1, 2, 1])
    n = 3
    cmap = [0, 65535, 32896] + [0, 32896, 65535] + [65535, 0, 0]  # R,G,B planes
    entries = [
        (256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 3), (277, 3, 1, 1), (278, 3, 1, 2), (279, 4, 1, 4),
    ]
    nent = len(entries) + 2
    cmap_off = 8 + 2 + nent * 12 + 4
    data_off = cmap_off + len(cmap) * 2
    entries.append((320, 3, len(cmap), cmap_off))
    entries.append((273, 4, 1, data_off))
    entries.sort()
    out = struct.pack("<2sHI", b"II", 42, 8) + struct.pack("<H", nent)
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += b"".join(struct.pack("<H", v) for v in cmap) + idx
    w, h, img = decode_tiff(out)
    assert (w, h) == (2, 2)
    assert img[0, 0].tolist() == [0, 0, 255]      # entry 0: B=65535
    assert img[0, 1].tolist() == [255, 128, 0]    # entry 1
    assert img[1, 0].tolist() == [128, 255, 0]    # entry 2


def test_refusals():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    blob = bytearray(encode_tiff(img))
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(b"XX\x00\x2a" + bytes(blob[4:]))
    # unsupported compression: patch tag 259's value to 5 (LZW)
    # find tag 259 in the IFD
    n = struct.unpack_from("<H", blob, 8)[0]
    for i in range(n):
        off = 10 + i * 12
        if struct.unpack_from("<H", blob, off)[0] == 259:
            struct.pack_into("<I", blob, off + 8, 5)
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(blob))
