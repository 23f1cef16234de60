"""AVIF system-codec seam tests (operators/avif.py — ctypes bindings
to the container's libavif 0.11 / dav1d / aom). Skipped entirely when
the shared object is absent. The lossless encode→decode roundtrip of
RANDOM planes is the live proof the verified 0.11 struct offsets are
right: a wrong offset cannot reproduce the planes bit-exactly."""

from __future__ import annotations

import numpy as np
import pytest

from parquet_on_fhir_spark.operators.avif import (
    avif_available,
    decode_avif,
    decode_avif_rgb,
    encode_avif_yuv420,
)

pytestmark = pytest.mark.skipif(
    not avif_available(), reason="system libavif 0.11 not present"
)


def test_lossless_roundtrip_random_planes():
    rng = np.random.default_rng(5)
    for w, h in [(32, 16), (17, 9), (64, 48), (2, 2)]:
        Y = rng.integers(0, 256, (h, w), np.uint8)
        U = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), np.uint8)
        V = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), np.uint8)
        blob = encode_avif_yuv420(Y, U, V)
        assert blob[4:12] == b"ftypavif"
        dw, dh, Y2, U2, V2, fmt = decode_avif(blob)
        assert (dw, dh, fmt) == (w, h, "yuv420")
        assert np.array_equal(Y, Y2), (w, h)
        assert np.array_equal(U, U2)
        assert np.array_equal(V, V2)


def test_solid_gray_closed_form_rgb():
    """U = V = 128 → R = G = B = Y exactly under the documented
    full-range conversion — the q302 oracle lever."""
    for g in (0, 64, 128, 200, 255):
        h, w = 16, 24
        Y = np.full((h, w), g, np.uint8)
        U = np.full((h // 2, w // 2), 128, np.uint8)
        V = np.full((h // 2, w // 2), 128, np.uint8)
        blob = encode_avif_yuv420(Y, U, V)
        dw, dh, img = decode_avif_rgb(blob)
        assert (dw, dh) == (w, h)
        assert np.array_equal(np.unique(img), [g]), g


def test_decode_pixels_dispatch():
    from parquet_on_fhir_spark.operators.multimodal import decode_pixels

    Y = np.full((8, 8), 90, np.uint8)
    U = np.full((4, 4), 128, np.uint8)
    V = np.full((4, 4), 128, np.uint8)
    blob = encode_avif_yuv420(Y, U, V)
    w, h, img = decode_pixels(blob, "image/avif")
    assert (w, h) == (8, 8)
    assert np.array_equal(np.unique(img), [90])


def test_guards():
    with pytest.raises(ValueError, match="decode failed"):
        decode_avif(b"\x00\x00\x00\x1cftypavif" + b"\x00" * 40)
    Y = np.zeros((8, 8), np.uint8)
    with pytest.raises(ValueError, match="chroma"):
        encode_avif_yuv420(Y, np.zeros((3, 3), np.uint8),
                           np.zeros((4, 4), np.uint8))
