"""VP8 (lossy WebP) codec tests — RFC 6386 key-frame decoder +
fixture encoder (operators/vp8.py, operators/vp8_enc.py).

Three layers of proof:
1. self-consistency: bool coder roundtrip, encoder→our-decoder.
2. differential vs the system libwebp (skipped when absent): our
   encoder's streams decode identically in libwebp (proves the
   bitstream writer), and libwebp's OWN encoder output — real-world
   streams with segmentation, prob updates and the in-loop filter —
   decodes bit-exactly at the YUV level in our decoder (proves the
   decoder; one wrong probability/filter tap/prediction pixel breaks
   it).  Fuzz levels stay inside the IDCT's designed dynamic range
   (|dequantized| ≲ 2000): beyond it libwebp's own C and SSE2 paths
   disagree (int16 SIMD lanes wrap), so there is no ground truth.
3. exactness: solid-color fixtures decode to closed-form YUV values.
"""

from __future__ import annotations

import numpy as np
import pytest

from parquet_on_fhir_spark.operators.vp8 import (
    BoolDecoder,
    decode_vp8,
    decode_webp_vp8,
    parse_header,
)
from parquet_on_fhir_spark.operators.vp8_enc import (
    MB,
    BoolEncoder,
    encode_vp8_frame,
    encode_webp_solid,
    wrap_webp,
)
from parquet_on_fhir_spark.operators.vp8_tables import AC_QLOOKUP

from libwebp_ref import (
    HAVE_LIBWEBP,
    decode_yuv,
    encode_rgb_lossy,
)

needs_libwebp = pytest.mark.skipif(
    not HAVE_LIBWEBP, reason="system libwebp not present"
)


def rand_mb(rng, density, maxlevel, qmax):
    ymode = int(rng.integers(0, 5))
    uvmode = int(rng.integers(0, 4))
    submodes = [int(rng.integers(0, 10)) for _ in range(16)]
    cap = max(1, 2000 // qmax)

    def blk(first=0):
        c = [0] * 16
        for i in range(first, 16):
            if rng.random() < density:
                mag = int(rng.integers(1, min(maxlevel, cap) + 1))
                c[i] = mag if rng.random() < 0.5 else -mag
        return c

    y2 = blk() if ymode != 4 else [0] * 16
    y = [blk(1 if ymode != 4 else 0) for _ in range(16)]
    u = [blk() for _ in range(4)]
    v = [blk() for _ in range(4)]
    if rng.random() < 0.2:
        y2, y = [0] * 16, [[0] * 16 for _ in range(16)]
        u, v = [[0] * 16 for _ in range(4)], [[0] * 16 for _ in range(4)]
    return MB(ymode=ymode, uvmode=uvmode, submodes=submodes,
              y2=y2, y=y, u=u, v=v)


def random_frame(rng):
    mw = int(rng.integers(1, 4))
    mh = int(rng.integers(1, 4))
    w = mw * 16 - int(rng.integers(0, 16))
    h = mh * 16 - int(rng.integers(0, 16))
    qi = int(rng.integers(0, 128))
    deltas = [int(rng.integers(-15, 16)) for _ in range(5)]
    qmax = max(AC_QLOOKUP[min(127, qi + 15)] * 155 // 100, AC_QLOOKUP[qi])
    density = float(rng.uniform(0.05, 0.5))
    mbs = [[rand_mb(rng, density, 300, qmax) for _ in range(mw)]
           for _ in range(mh)]
    payload = encode_vp8_frame(
        w, h, mbs, y_ac_qi=qi,
        y_dc_delta=deltas[0], y2_dc_delta=deltas[1], y2_ac_delta=deltas[2],
        uv_dc_delta=deltas[3], uv_ac_delta=deltas[4],
        filter_type=int(rng.integers(0, 2)),
        filter_level=int(rng.integers(0, 64)),
        sharpness=int(rng.integers(0, 8)),
    )
    return wrap_webp(payload), (w, h)


def test_bool_coder_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(300):
        n = int(rng.integers(1, 150))
        probs = rng.integers(1, 255, n)
        bits = rng.integers(0, 2, n)
        be = BoolEncoder()
        for p, b in zip(probs, bits):
            be.put(int(p), int(b))
        bd = BoolDecoder(be.stop())
        assert [bd.get(int(p)) for p in probs] == list(bits)


def test_solid_fixture_exact_yuv():
    """The q299 exactness lever: solid-color frames reconstruct the
    closed-form YUV exactly (DC-only residual in MB(0,0), DC
    prediction propagates it)."""
    for rgb in [(0, 0, 0), (255, 255, 255), (128, 128, 128),
                (200, 60, 130), (17, 250, 3)]:
        blob, (y, u, v) = encode_webp_solid(40, 24, rgb)
        w, h, Y, U, V = decode_webp_vp8(blob)
        assert (w, h) == (40, 24)
        assert np.array_equal(np.unique(Y), [y]), rgb
        assert np.array_equal(np.unique(U), [u]), rgb
        assert np.array_equal(np.unique(V), [v]), rgb


def test_own_encoder_roundtrip_no_libwebp():
    """Self-consistency: random frames decode without error and honor
    the frame dimensions (full differential proof is the libwebp
    tests below)."""
    rng = np.random.default_rng(11)
    for _ in range(5):
        blob, (w, h) = random_frame(rng)
        dw, dh, Y, U, V = decode_webp_vp8(blob)
        assert (dw, dh) == (w, h)
        assert Y.shape == (h, w)
        assert U.shape == ((h + 1) // 2, (w + 1) // 2)


def test_header_parse_fields():
    blob, _ = encode_webp_solid(16, 16, (10, 20, 30))
    i = blob.find(b"VP8 ")
    size = int.from_bytes(blob[i + 4 : i + 8], "little")
    h, _, parts = parse_header(blob[i + 8 : i + 8 + size])
    assert h.key_frame and h.width == 16 and h.height == 16
    assert h.y_ac_qi == 0 and h.n_parts == 1 and len(parts) == 1


def test_non_keyframe_rejected():
    blob, _ = encode_webp_solid(16, 16, (1, 2, 3))
    i = blob.find(b"VP8 ")
    payload = bytearray(blob[i + 8 :])
    payload[0] |= 1  # interframe bit
    with pytest.raises(ValueError, match="key frame"):
        decode_vp8(bytes(payload))


@needs_libwebp
def test_libwebp_accepts_our_solid_fixture():
    """The encoder side of the differential proof: the reference
    implementation decodes our hand-rolled stream to the exact
    closed-form YUV."""
    for rgb in [(128, 128, 128), (200, 60, 130), (0, 255, 0)]:
        blob, (y, u, v) = encode_webp_solid(48, 32, rgb)
        ref = decode_yuv(blob)
        assert ref is not None, "libwebp rejected our stream"
        _, _, Y, U, V = ref
        assert np.array_equal(np.unique(Y), [y])
        assert np.array_equal(np.unique(U), [u])
        assert np.array_equal(np.unique(V), [v])


@needs_libwebp
def test_differential_own_encoder_streams():
    """Random mode/coefficient assignments (all token categories,
    B_PRED submodes, skip, both filter types) must decode identically
    here and in libwebp."""
    rng = np.random.default_rng(123)
    for t in range(15):
        blob, _ = random_frame(rng)
        ref = decode_yuv(blob)
        assert ref is not None, f"libwebp rejected frame {t}"
        mine = decode_webp_vp8(blob)
        for nm, a, b in zip("YUV", mine[2:], ref[2:]):
            assert np.array_equal(a, b), f"frame {t} plane {nm}"


@needs_libwebp
def test_differential_libwebp_encoder_streams():
    """Real-world streams: libwebp's encoder (4 segments, prob
    updates, lf deltas, in-loop filter) → our decoder must match its
    decoder bit-exactly at the YUV level."""
    rng = np.random.default_rng(7)
    for t in range(12):
        w = int(rng.integers(1, 70))
        h = int(rng.integers(1, 60))
        kind = t % 4
        if kind == 0:
            img = rng.integers(0, 256, (h, w, 3), np.uint8)
        elif kind == 1:
            img = np.full((h, w, 3), rng.integers(0, 256, 3, np.uint8))
        elif kind == 2:
            ramp = np.linspace(0, 255, w, dtype=np.uint8)
            img = np.stack([np.tile(ramp, (h, 1))] * 3, -1)
        else:
            img = rng.integers(0, 256, (h, w, 3), np.uint8)
            img[::2] //= 8
        q = float([5, 30, 50, 75, 90, 99][t % 6])
        blob = encode_rgb_lossy(img, q)
        ref = decode_yuv(blob)
        mine = decode_webp_vp8(blob)
        for nm, a, b in zip("YUV", mine[2:], ref[2:]):
            assert np.array_equal(a, b), f"frame {t} q={q} plane {nm}"


def test_tables_match_system_libwebp():
    """tools/extract_vp8_tables.py --check: the committed constants
    still match the system library's rodata."""
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    if not HAVE_LIBWEBP:
        pytest.skip("system libwebp not present")
    r = subprocess.run(
        [sys.executable, str(root / "tools/extract_vp8_tables.py"), "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_multimodal_dispatch_lossy_webp():
    """decode_webp / decode_pixels route VP8 chunks through the RFC
    6386 decoder and the documented BT.601 RGB conversion."""
    from parquet_on_fhir_spark.operators.multimodal import decode_pixels

    blob, (y, u, v) = encode_webp_solid(16, 16, (90, 90, 90))
    w, h, img = decode_pixels(bytes(blob), "image/webp")
    assert (w, h) == (16, 16)
    # gray input: u == v == 128 exactly, so rgb is the y-only transform
    out = min(255, max(0, ((y - 16) * 19077 + 8192) >> 14))
    assert np.array_equal(np.unique(img), [out])


def test_webp_animation_roundtrip():
    """VP8X/ANIM/ANMF container: mixed VP8L + lossy-VP8 frames
    composit to the exact expected canvases with durations; still
    images decode as one zero-duration frame; max_frames guard.
    (libwebpdemux is absent from this image, so container-level
    validation is spec+fixture based; the per-frame VP8L/VP8 payloads
    are the differentially-verified codecs above.)"""
    from parquet_on_fhir_spark.operators.multimodal import (
        decode_webp_frames,
        encode_webp_animation,
        encode_webp_lossless,
    )

    g = 77
    f1 = np.empty((8, 8, 3), np.uint8)
    f1[:4] = g
    f1[4:] = 255 - g
    f2 = np.full((8, 8, 3), 255 - g, np.uint8)
    f3 = np.full((8, 8, 3), g, np.uint8)
    blob = encode_webp_animation(
        [f1, f2, f3], [40, 80, 120], lossy_mask=[False, False, True]
    )
    frames = decode_webp_frames(blob)
    assert [d for d, _ in frames] == [40, 80, 120]
    assert np.array_equal(frames[0][1], f1)
    assert np.array_equal(frames[1][1], f2)
    # lossy frame: the documented YUV round trip of gray g
    yv = (56318 * g + 1081344) >> 16
    out = min(255, max(0, ((yv - 16) * 19077 + 8192) >> 14))
    assert np.array_equal(np.unique(frames[2][1]), [out])
    # max_frames guard + still-image path
    assert len(decode_webp_frames(blob, max_frames=2)) == 2
    still = decode_webp_frames(encode_webp_lossless(f1))
    assert len(still) == 1 and still[0][0] == 0
    assert np.array_equal(still[0][1], f1)


def test_webp_animation_partial_frame_compositing():
    """A smaller ANMF frame pastes at its (even) offset over the kept
    canvas — the region outside the frame must persist from the
    previous composite."""
    from parquet_on_fhir_spark.operators.multimodal import (
        decode_webp_frames,
        encode_webp_animation,
        encode_webp_lossless,
    )
    import struct

    base = np.full((8, 8, 3), 200, np.uint8)
    patch = np.full((4, 4, 3), 10, np.uint8)
    # hand-assemble: full frame then a 4x4 patch at (2, 4) — the
    # fixture writer only emits full-canvas frames, so build the
    # second ANMF manually
    blob = encode_webp_animation([base], [40])
    patch_webp = encode_webp_lossless(patch)
    i = patch_webp.find(b"VP8L")
    (ssz,) = struct.unpack_from("<I", patch_webp, i + 4)
    sub = patch_webp[i : i + 8 + ssz + (ssz & 1)]
    anmf = (
        (2).to_bytes(3, "little")   # x/2 = 2 -> x = 4
        + (1).to_bytes(3, "little")  # y/2 = 1 -> y = 2
        + (3).to_bytes(3, "little")  # w-1
        + (3).to_bytes(3, "little")  # h-1
        + (90).to_bytes(3, "little")
        + bytes([0x02])
        + sub
    )
    chunk = b"ANMF" + len(anmf).to_bytes(4, "little") + anmf + (
        b"\x00" if len(anmf) & 1 else b""
    )
    grown = blob[:4] + (
        int.from_bytes(blob[4:8], "little") + len(chunk)
    ).to_bytes(4, "little") + blob[8:] + chunk
    frames = decode_webp_frames(grown)
    assert len(frames) == 2 and frames[1][0] == 90
    want = base.copy()
    want[2:6, 4:8] = 10
    assert np.array_equal(frames[1][1], want)


@needs_libwebp
def test_differential_multi_partition_streams():
    """n_parts in {2,4,8}: MB row r's tokens land in partition
    r mod n_parts with 3-byte size trailers (§9.5) — real-world
    encoders split for decode parallelism, so both decoders must
    agree on split streams too."""
    rng = np.random.default_rng(55)
    for t in range(8):
        nparts = [2, 4, 8, 2, 4, 8, 2, 4][t]
        mh = int(rng.integers(2, 6)) + (3 if nparts == 8 else 0)
        mw = int(rng.integers(1, 4))
        w = mw * 16 - int(rng.integers(0, 16))
        h = mh * 16 - int(rng.integers(0, 16))
        qi = int(rng.integers(0, 128))
        qmax = max(AC_QLOOKUP[min(127, qi + 15)] * 155 // 100,
                   AC_QLOOKUP[qi])
        mbs = [[rand_mb(rng, 0.3, 300, qmax) for _ in range(mw)]
               for _ in range(mh)]
        blob = wrap_webp(encode_vp8_frame(
            w, h, mbs, y_ac_qi=qi,
            filter_level=int(rng.integers(0, 64)), n_parts=nparts))
        ref = decode_yuv(blob)
        assert ref is not None, f"libwebp rejected nparts={nparts}"
        mine = decode_webp_vp8(blob)
        for nm, a, b in zip("YUV", mine[2:], ref[2:]):
            assert np.array_equal(a, b), f"frame {t} nparts={nparts} {nm}"


def test_corrupt_and_truncated_payloads_raise_valueerror():
    """Crawled payloads are hostile: random VP8-tagged garbage and
    every truncation point of a valid stream must raise ValueError
    (the decode_pixels fallback contract) — never IndexError/etc,
    which would kill the executor UDF instead of routing to the
    stand-in codec."""
    from parquet_on_fhir_spark.operators.multimodal import decode_webp

    rng = np.random.default_rng(0)
    for _ in range(60):
        n = int(rng.integers(16, 200))
        payload = rng.integers(0, 256, n, np.uint8).tobytes()
        blob = (b"RIFF" + (12 + n).to_bytes(4, "little") + b"WEBP"
                + b"VP8 " + n.to_bytes(4, "little") + payload)
        try:
            decode_webp(blob)
        except ValueError:
            pass
    good, _ = encode_webp_solid(32, 32, (10, 20, 30))
    for cut in range(12, len(good)):
        try:
            decode_webp(bytes(good[:cut]))
        except ValueError:
            pass


def test_animation_truncations_raise_valueerror():
    """Every truncation point of a valid animated container raises
    ValueError (same hostile-payload contract as the still path)."""
    from parquet_on_fhir_spark.operators.multimodal import (
        decode_webp_frames,
        encode_webp_animation,
    )

    f = np.full((8, 8, 3), 80, np.uint8)
    anim = encode_webp_animation([f, f], [40, 80],
                                 lossy_mask=[False, True])
    for cut in range(12, len(anim)):
        try:
            decode_webp_frames(bytes(anim[:cut]))
        except ValueError:
            pass


def test_truncated_first_partition_raises_not_garbage():
    """r13 advice: parse_header must VALIDATE part1_size against the
    payload length — a short first partition would otherwise zero-pad
    the BoolDecoder and 'decode' plausible garbage pixels, silently
    bypassing the quarantine contract (the generic truncation sweep
    passes whenever no exception escapes, so it never caught this)."""
    import pytest

    good, _ = encode_webp_solid(32, 32, (10, 20, 30))
    blob = bytes(good)
    i = blob.find(b"VP8 ")
    size = int.from_bytes(blob[i + 4 : i + 8], "little")
    payload = blob[i + 8 : i + 8 + size]
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    part1 = tag >> 5
    assert part1 > 0 and 10 + part1 <= len(payload)
    # EVERY cut inside the first partition must raise, explicitly
    for cut in range(10, 10 + part1):
        with pytest.raises(ValueError):
            parse_header(payload[:cut])


def test_anmf_interframe_quarantines_never_silent_pixels():
    """r13 verdict task 5 (animated-WebP inter-frame honesty): ANMF
    chains may legally carry VP8 INTER-frames referencing a prior
    frame — a capability the key-frame-only decoder must refuse, not
    approximate. Pin: flipping the key-frame tag bit on any frame of
    a valid animation raises ValueError from the vp8 header parse
    (the quarantine contract) and never returns composited frames;
    the tag flip provably reaches the decoder (the unflipped twin
    decodes)."""
    import pytest

    from parquet_on_fhir_spark.operators.multimodal import (
        decode_webp_frames,
        encode_webp_animation,
    )

    f0 = np.full((16, 16, 3), 60, np.uint8)
    f1 = np.full((16, 16, 3), 200, np.uint8)
    # both frames lossy -> both carry a VP8 (not VP8L) tag byte
    anim = bytearray(encode_webp_animation(
        [f0, f1], [30, 40], lossy_mask=[True, True]))
    assert len(decode_webp_frames(bytes(anim))) == 2  # healthy twin

    # locate each VP8 payload's first tag byte and flip bit0
    # (key_frame = !(tag & 1) per RFC 6386 §9.1)
    offs = []
    i = 0
    while True:
        i = bytes(anim).find(b"VP8 ", i)
        if i < 0:
            break
        offs.append(i + 8)  # chunk header is fourcc + 4-byte size
        i += 4
    assert len(offs) == 2
    for off in offs:
        bad = bytearray(anim)
        bad[off] |= 1  # key frame -> inter frame
        with pytest.raises(ValueError, match="key frames"):
            decode_webp_frames(bytes(bad))
