"""Text-analysis and multimodal operator tests."""

from pyspark.sql import functions as F

from parquet_on_fhir_spark.api import load_table
from parquet_on_fhir_spark.operators import text as tx
from parquet_on_fhir_spark.operators.multimodal import (
    attach_binary,
    extract_features,
    frame_sample_plan,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("hello world foo",), ("one",), ("a b c d e",)], "text string"
    )
    got = [r[0] for r in df.select(tx.token_count("text")).collect()]
    assert got == [3, 1, 5]


def test_bpe_ish_token_count_monotone_in_length(spark):
    df = spark.createDataFrame(
        [("short text",), ("a considerably longer sentence with many more words here",)],
        "text string",
    )
    a, b = [r[0] for r in df.select(tx.bpe_ish_token_count("text")).collect()]
    assert b > a > 0


def test_language_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is in that house", "en"),
            ("el perro y la casa de los gatos en un pueblo", "es"),
            ("der Hund und die Katze ist nicht ein Tier zu Hause", "de"),
            ("xyzzy qwerty plugh", "und"),
        ],
        "text string, expect string",
    )
    rows = df.select("expect", tx.detect_language("text").alias("got")).collect()
    for r in rows:
        assert r.got == r.expect, r


def test_quality_score_ranges(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    scores = d.select(tx.quality_score("text").alias("q"))
    assert scores.filter((F.col("q") < 0) | (F.col("q") > 1)).count() == 0


def test_rolling_fingerprint_stable_under_tail_edit(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    df = spark.createDataFrame(
        [(1, base), (2, base + " tail"), (3, "completely different words here entirely")],
        "id int, text string",
    )
    rows = {r.id: r.fp for r in df.select("id", tx.rolling_fingerprint("text").alias("fp")).collect()}
    assert rows[1] == rows[2]  # min-window hash survives a tail append
    assert rows[1] != rows[3]


def test_multimodal_feature_extraction_shape(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    media = attach_binary(d, "text", kind="blob")
    assert dict(media.dtypes)["content"] == "binary"
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r.feat) == 5 for r in rows)
    assert all(r.n_bytes > 0 for r in rows)


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, 3500), (2, 500)], "media_id int, duration bigint"
    ).select(
        "media_id",
        F.struct(
            F.lit("video/mp4").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.col("duration").alias("duration_ms"),
        ).alias("meta"),
    )
    plan = frame_sample_plan(df, every_ms=1000)
    got = sorted((r.media_id, r.frame_ts_ms) for r in plan.collect())
    assert got == [(1, 0), (1, 1000), (1, 2000), (2, 0)]


def test_decode_real_import_guarded():
    """decode_real is a real PIL codec when PIL is importable and an
    honest NotImplementedError otherwise; best_codec() picks whichever
    is available. Both arms are exercised on whichever environment runs
    the suite."""
    import pytest

    from parquet_on_fhir_spark.operators.multimodal import (
        best_codec,
        codec_available,
        decode_real,
        stand_in_features,
    )

    if not codec_available("image"):
        with pytest.raises(NotImplementedError):
            decode_real(b"bytes", "image/png")
        from parquet_on_fhir_spark.operators.multimodal import numpy_features

        assert best_codec() is numpy_features  # built-in real decoder tier
    else:  # pragma: no cover - container has no PIL; real-cluster arm
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (20, 10), (128, 64, 32)).save(buf, format="PNG")
        feat = decode_real(buf.getvalue(), "image/png")
        assert feat[:2] == [20.0, 10.0] and len(feat) == 66
        assert all(0.0 <= v <= 1.0 for v in feat[2:])
        assert best_codec() is decode_real


def test_resize_images_plumbing(spark, sf_dir):
    """Resize keeps MEDIA_SCHEMA, rewrites dimensions, preserves payload
    (stub codec) — batch-at-a-time through mapInPandas."""
    from parquet_on_fhir_spark.api import load_table
    from parquet_on_fhir_spark.operators.multimodal import (
        attach_binary,
        resize_images,
    )

    d = load_table(spark, sf_dir, "documents").limit(20)
    media = attach_binary(d.select("doc_id", "text"), "text", kind="image")
    out = resize_images(media, 224, 224)
    # same names+types (mapInPandas output is all-nullable by contract;
    # simpleString ignores nullability at every nesting level)
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in media.schema.fields
    ]
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.meta.width == 224 and r.meta.height == 224 for r in rows)
    orig = {r.media_id: bytes(r.content) for r in media.collect()}
    assert all(bytes(r.content) == orig[r.media_id] for r in rows)


def test_audio_chunk_plan(spark, sf_dir):
    from pyspark.sql import functions as F
    from parquet_on_fhir_spark.api import load_table
    from parquet_on_fhir_spark.operators.multimodal import (
        attach_binary,
        audio_chunk_plan,
    )

    d = load_table(spark, sf_dir, "documents").limit(50)
    media = attach_binary(d.select("doc_id", "text"), "text", kind="audio")
    media = media.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            (F.length(F.decode("content", "UTF-8")) * 100).cast("bigint").alias(
                "duration_ms"
            ),
        ),
    )
    chunks = audio_chunk_plan(media, chunk_ms=5000)
    rows = chunks.collect()
    durs = {r.media_id: r.meta.duration_ms for r in media.collect()}
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    import math
    for mid, rs in by_media.items():
        rs.sort(key=lambda r: r.chunk_start_ms)
        assert len(rs) == max(math.ceil(durs[mid] / 5000), 1)
        assert rs[0].chunk_start_ms == 0
        assert rs[-1].chunk_end_ms == min(durs[mid], rs[-1].chunk_start_ms + 5000)
        for a, b in zip(rs, rs[1:]):
            assert a.chunk_end_ms == min(durs[mid], b.chunk_start_ms)


def test_fake_codec_through_feature_seam(spark, sf_dir):
    """A user-supplied codec flows through the real mapInPandas path:
    feature values are exactly what the codec computed per (bytes, mime)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(20)
    media = attach_binary(d, "text", kind="image")

    def fake_codec(b, mime):
        # deterministic "decode": pretend 3-dim embedding from the payload
        return [float(len(b)), float(b[0] if b else 0), 1.0 if mime else 0.0]

    feats = extract_features(media, codec=fake_codec)
    rows = {r.media_id: r for r in feats.collect()}
    orig = {r.media_id: bytes(r.content) for r in media.collect()}
    assert len(rows) == 20
    for mid, b in orig.items():
        assert rows[mid].feat == [float(len(b)), float(b[0]), 1.0]
        assert rows[mid].n_bytes == len(b)


def test_fake_codec_through_resize_seam(spark, sf_dir):
    from parquet_on_fhir_spark.operators.multimodal import resize_images

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(10)
    media = attach_binary(d, "text", kind="image")

    def fake_resize(b, mime, w, h):
        return b[: w // 32]  # deterministic truncation stands in for resampling

    out = resize_images(media, 64, 64, codec=fake_resize)
    rows = {r.media_id: bytes(r.content) for r in out.collect()}
    orig = {r.media_id: bytes(r.content) for r in media.collect()}
    assert all(rows[m] == orig[m][:2] for m in orig)


def test_dedup_lines_removes_shared_lines(spark):
    from parquet_on_fhir_spark.operators.text import dedup_lines

    docs = [
        (1, "unique alpha\nSHARED FOOTER\nmore alpha"),
        (2, "unique beta\nSHARED FOOTER"),
        (3, "unique gamma\nSHARED FOOTER"),
        (4, "SHARED FOOTER"),  # all-boilerplate doc survives empty
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_lines(df, min_docs=2).collect()}
    assert out[1].text == "unique alpha\nmore alpha"
    assert out[1].n_lines_kept == 2 and out[1].n_lines_removed == 1
    assert out[2].text == "unique beta"
    assert out[4].text == "" and out[4].n_lines_kept == 0
    # threshold respected: min_docs=5 removes nothing
    untouched = {r.doc_id: r for r in dedup_lines(df, min_docs=5).collect()}
    assert untouched[2].text == "unique beta\nSHARED FOOTER"
    assert untouched[2].n_lines_removed == 0


def test_frequent_ngrams_topk_and_ties(spark):
    from parquet_on_fhir_spark.operators.text import frequent_ngrams

    docs = [
        ("a", "x y z x y z x y z"),   # "x y z" 3x (and rotations)
        ("a", "p q r"),
        ("b", "one two three"),
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    out = frequent_ngrams(df, n=3, k=2, group_col="source").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.group, []).append(r)
    a = sorted(by_group["a"], key=lambda r: r.rank)
    assert a[0].gram == "x y z" and a[0].n_occurrences == 3
    # ties broken lexicographically: "y z x" before "z x y" (both 2x)
    assert a[1].gram == "y z x" and a[1].n_occurrences == 2
    assert len(a) == 2  # k respected
    assert by_group["b"][0].gram == "one two three"


def _make_bmp(pixels):
    """HxWx3 RGB -> uncompressed 24-bit bottom-up BMP bytes (pure struct)."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y, :, ::-1].tobytes()  # RGB -> BGR
        rows += row + b"\x00" * (stride - len(row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + info + rows


def test_ppm_roundtrip_and_decode():
    import numpy as np

    from parquet_on_fhir_spark.operators.multimodal import decode_ppm, encode_ppm

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    w, h, got = decode_ppm(encode_ppm(img))
    assert (w, h) == (3, 2)
    assert np.array_equal(got, img)
    # comment + multi-whitespace headers parse
    hand = b"P6\n# a comment\n3  2\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(hand)[2], img)


def test_bmp_decode_matches_source_pixels():
    import numpy as np

    from parquet_on_fhir_spark.operators.multimodal import decode_bmp

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(5, 3, 3), dtype=np.uint8)  # stride padding hit
    w, h, got = decode_bmp(_make_bmp(img))
    assert (w, h) == (3, 5)
    assert np.array_equal(got, img)


def test_numpy_features_real_decode_and_fallback():
    import numpy as np

    from parquet_on_fhir_spark.operators.multimodal import (
        encode_ppm,
        numpy_features,
        stand_in_features,
    )

    # 8x8 white image: features = [8, 8] + 64 ones
    white = np.full((8, 8, 3), 255, dtype=np.uint8)
    feat = numpy_features(encode_ppm(white))
    assert feat[:2] == [8.0, 8.0]
    assert len(feat) == 66 and all(abs(x - 1.0) < 1e-12 for x in feat[2:])
    # 16x16 half-black/half-white: box averages = 0 on top, 1 on bottom
    split = np.zeros((16, 16, 3), dtype=np.uint8)
    split[8:] = 255
    f2 = numpy_features(encode_ppm(split))
    assert f2[2:34] == [0.0] * 32 and f2[34:] == [1.0] * 32
    # undecodable bytes -> deterministic stand-in
    junk = b"\x00\x01not an image"
    assert numpy_features(junk) == stand_in_features(junk)


def test_numpy_resize_and_bmp_to_ppm():
    import numpy as np

    from parquet_on_fhir_spark.operators.multimodal import (
        decode_ppm,
        numpy_resize,
    )

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, :2] = 200  # top-left quadrant bright
    out = numpy_resize(_make_bmp(img), "image/bmp", 2, 2)
    w, h, small = decode_ppm(out)  # canonical PPM output
    assert (w, h) == (2, 2)
    assert small[0, 0, 0] == 200 and small[1, 1, 0] == 0
    # unknown payloads pass through unchanged
    assert numpy_resize(b"???", None, 2, 2) == b"???"


def test_extract_features_with_real_numpy_codec(spark):
    import numpy as np

    from parquet_on_fhir_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_ppm,
        extract_features,
        numpy_features,
    )

    rows = []
    for i in range(6):
        img = np.full((8, 8, 3), i * 40, dtype=np.uint8)
        rows.append(
            (i, "image", bytearray(encode_ppm(img)), ("image/x-portable-pixmap", 8, 8, None))
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_features(media, codec=numpy_features).collect()}
    assert len(out) == 6
    for i in range(6):
        f = out[i].feat
        assert f[:2] == [8.0, 8.0] and abs(f[2] - (i * 40) / 255.0) < 1e-12


def test_png_roundtrip_all_filters():
    """encode→decode is the identity for every scanline filter type,
    including the default filter-cycling writer (exercises all five
    unfilter paths in one image)."""
    import numpy as np

    from parquet_on_fhir_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(11, 9, 3), dtype=np.uint8)
    for ft in [None, 0, 1, 2, 3, 4]:
        w, h, got = decode_png(encode_png(img, filter_type=ft))
        assert (w, h) == (9, 11)
        assert np.array_equal(got, img), f"filter {ft} round-trip broke"


def test_png_gray_palette_alpha_color_types():
    """Hand-built PNGs for color types 0/3/4/6 decode to the same HxWx3
    RGB the other codecs produce (alpha dropped, gray replicated,
    palette resolved)."""
    import struct
    import zlib

    import numpy as np

    from parquet_on_fhir_spark.operators.multimodal import _PNG_SIG, decode_png

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def png(w, h, color, scanlines, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (
            _PNG_SIG
            + chunk(b"IHDR", ihdr)
            + extra
            + chunk(b"IDAT", zlib.compress(scanlines))
            + chunk(b"IEND", b"")
        )

    # gray 2x2 (type 0): values 10,20/30,40 -> replicated channels
    g = png(2, 2, 0, b"\x00\x0a\x14\x00\x1e\x28")
    w, h, img = decode_png(g)
    assert (w, h) == (2, 2)
    assert np.array_equal(img[:, :, 0], [[10, 20], [30, 40]])
    assert np.array_equal(img[:, :, 0], img[:, :, 2])
    # RGBA 1x2 (type 6): alpha dropped
    ra = png(2, 1, 6, b"\x00" + bytes([1, 2, 3, 9, 4, 5, 6, 9]))
    assert np.array_equal(decode_png(ra)[2], [[[1, 2, 3], [4, 5, 6]]])
    # gray+alpha 1x1 (type 4)
    ga = png(1, 1, 4, b"\x00" + bytes([77, 200]))
    assert np.array_equal(decode_png(ga)[2], [[[77, 77, 77]]])
    # palette 1x2 (type 3): indices 1,0 against a 2-entry PLTE
    plte = chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
    pa = png(2, 1, 3, b"\x00\x01\x00", extra=plte)
    assert np.array_equal(decode_png(pa)[2], [[[0, 255, 0], [255, 0, 0]]])


def test_png_rejects_out_of_envelope():
    import struct
    import zlib

    import numpy as np
    import pytest

    from parquet_on_fhir_spark.operators.multimodal import (
        _PNG_SIG,
        decode_png,
        encode_png,
    )

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM notapng")
    # 16-bit depth must be refused, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    deep = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(b"\x00" * 7)
    ) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(deep)
    # truncated IDAT stream
    ok = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_png(ok[: len(ok) - 20])


def test_png_flows_through_numpy_features_and_resize():
    """decode_pixels magic-dispatch picks the PNG codec, so the SAME
    mapInPandas plumbing (extract_features / resize_images) handles
    compressed payloads with zero code change — and features match the
    PPM encoding of identical pixels exactly."""
    import numpy as np

    from parquet_on_fhir_spark.operators.multimodal import (
        encode_png,
        encode_ppm,
        numpy_features,
        numpy_resize,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    f_png = numpy_features(encode_png(img))
    f_ppm = numpy_features(encode_ppm(img))
    assert f_png == f_ppm and len(f_png) == 66
    # resize canonicalizes to PPM regardless of input container
    out = numpy_resize(encode_png(img), None, 8, 8)
    assert out.startswith(b"P6")


def test_jpeg_handbuilt_block_decodes_known_idct():
    """decode_jpeg r11, pinned INDEPENDENTLY of encode_jpeg: a JPEG
    hand-assembled byte-by-byte in this test (single 8×8 grayscale
    block, all-ones quant table, custom 1-symbol DC / 2-symbol AC
    Huffman tables, DC=8 + one AC coefficient 3 at zigzag index 1)
    must decode to the IDCT evaluated here via the raw T.81 cosine
    double sum — pinning marker parse, canonical Huffman, EXTEND,
    dezigzag position, dequantization and the IDCT in one shot, with
    no shared code between producer and expectation."""
    import numpy as np

    from parquet_on_fhir_spark.operators.multimodal import decode_jpeg

    jpg = bytes.fromhex(
        "ffd8"
        # DQT: pq/tq=0, 64 × 1
        + "ffdb0043" + "00" + "01" * 64
        # SOF0: 8-bit, 8×8, 1 component (id 1, 1×1 sampling, qt 0)
        + "ffc0000b" + "08" + "0008" + "0008" + "01" + "011100"
        # DHT DC0: one symbol (category 4) at code length 1 → code '0'
        + "ffc40014" + "00" + "01" + "00" * 15 + "04"
        # DHT AC0: symbols EOB(0x00), 0x02 at length 2 → codes 00, 01
        + "ffc40015" + "10" + "0002" + "00" * 14 + "0002"
        # SOS: 1 component, DC/AC table 0, spectral 0..63
        + "ffda0008" + "01" + "0100" + "003f00"
        # entropy: DC cat4 '0'+'1000'(=+8); AC sym 0x02 '01' + '11'(=+3);
        # EOB '00'; pad 1s → 01000011 10011111
        + "439f"
        + "ffd9"
    )
    w, h, img = decode_jpeg(jpg)
    assert (w, h) == (8, 8)

    # independent IDCT: F[0,0]=8, F[0,1]=3 (vertical index first)
    def c(k):
        return 1 / np.sqrt(2) if k == 0 else 1.0

    expect = np.empty((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v, u, f in ((0, 0, 8.0), (0, 1, 3.0)):
                s += (
                    c(u) * c(v) / 4.0 * f
                    * np.cos((2 * x + 1) * u * np.pi / 16)
                    * np.cos((2 * y + 1) * v * np.pi / 16)
                )
            expect[y, x] = s + 128.0
    expect = np.clip(np.round(expect), 0, 255).astype(np.uint8)
    assert np.array_equal(img[:, :, 0], expect)
    # grayscale replicates across RGB
    assert np.array_equal(img[:, :, 0], img[:, :, 2])


def test_jpeg_roundtrip_gray_exact_and_color_tolerance():
    """encode_jpeg→decode_jpeg: a solid EVEN gray level survives
    exactly (DC 8·(v−128) divisible by the luminance quantizer 16,
    all AC zero); smooth color content round-trips within quantization
    error at 4:4:4 and 4:2:0; restart intervals decode identically;
    non-multiple-of-8 dimensions pad and crop correctly."""
    import numpy as np

    from parquet_on_fhir_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    solid = np.full((16, 8, 3), 108, dtype=np.uint8)
    w, h, out = decode_jpeg(encode_jpeg(solid, grayscale=True))
    assert (w, h) == (8, 16) and np.array_equal(out, solid)

    yy, xx = np.mgrid[0:16, 0:24]
    img = np.stack(
        [
            40 + yy * 5 + xx * 2,
            60 + xx * 4,
            90 + yy * 3 + xx,
        ],
        axis=2,
    ).astype(np.uint8)
    for kwargs, tol in (
        (dict(), 12),
        (dict(subsampling=(2, 2)), 20),
        (dict(subsampling=(2, 1)), 16),   # 4:2:2
        (dict(subsampling=(1, 2)), 16),   # 4:4:0
        (dict(subsampling=(4, 2)), 24),   # asymmetric high factor
        (dict(restart_interval=2), 12),
        (dict(subsampling=(2, 2), restart_interval=1), 20),
    ):
        w, h, out = decode_jpeg(encode_jpeg(img, **kwargs))
        assert (w, h) == (24, 16)
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= tol, (kwargs, err.max())
    # odd dimensions with subsampling: crop back to source size
    odd = img[:13, :19]
    w, h, out = decode_jpeg(encode_jpeg(odd, subsampling=(2, 2)))
    assert (w, h) == (19, 13) and out.shape == (13, 19, 3)
    # restart path really resets predictors: identical output with and
    # without restarts
    _, _, a = decode_jpeg(encode_jpeg(img))
    _, _, b = decode_jpeg(encode_jpeg(img, restart_interval=3))
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 2


def test_jpeg_rejects_out_of_envelope():
    import numpy as np
    import pytest

    from parquet_on_fhir_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.full((8, 8, 3), 99, dtype=np.uint8)
    good = encode_jpeg(img, grayscale=True)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"P6 not a jpeg")
    # a BASELINE stream relabeled SOF2 is invalid progressive (its one
    # scan has Ss=0/Se=63): refuses rather than mis-decoding (r12 —
    # genuine progressive streams decode, see the progressive tests)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="Ss=0"):
        decode_jpeg(prog)
    # arithmetic coding (SOF9) still refuses
    arith = good.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(arith)
    # 12-bit precision refuses
    i = good.index(b"\xff\xc0") + 4
    deep = good[:i] + b"\x0c" + good[i + 1 :]
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg(deep)
    # truncated entropy stream raises (bit reader runs off the end)
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(good[:-4])


def test_jpeg_progressive_roundtrip_equals_baseline():
    """_decode_jpeg_progressive (r12): the progressive entropy layer
    (interleaved DC first scan at Al=1, one-bit DC refinement,
    per-component spectral-selection AC bands at Al=1 with EOB runs,
    and the G.1.2.3 correction-bit AC refinement) is LOSSLESS over the
    quantized coefficients — so decoding the progressive encoding of
    ANY image must equal decoding the baseline encoding of the same
    image EXACTLY, across grayscale/color/subsampled/odd-dimension
    cases (non-interleaved per-component block grids, newly-nonzero
    vs history coefficients, EOBRUN > 1, buffered correction bits)."""
    import numpy as np

    from parquet_on_fhir_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(42)
    cases = [
        (np.full((8, 8, 3), 120, np.uint8), (1, 1), True),
        (np.full((16, 16, 3), [200, 30, 90], np.uint8), (1, 1), False),
        (rng.integers(0, 256, (24, 17, 3)).astype(np.uint8), (1, 1), False),
        # odd dims + 4:2:0: chroma block grid ≠ luma block grid
        (rng.integers(0, 256, (17, 17, 3)).astype(np.uint8), (2, 2), False),
        (rng.integers(0, 256, (33, 20, 3)).astype(np.uint8), (2, 1), False),
        # smooth gradient: long zero runs → EOBRUN > 1 across blocks
        (
            np.tile(np.arange(40, dtype=np.uint8) * 6, (40, 3, 1))
            .transpose(0, 2, 1),
            (1, 1),
            True,
        ),
    ]
    for img, sub, gray in cases:
        wb, hb, db = decode_jpeg(
            encode_jpeg(img, subsampling=sub, grayscale=gray)
        )
        wp, hp, dp = decode_jpeg(
            encode_jpeg_progressive(img, subsampling=sub, grayscale=gray)
        )
        assert (wb, hb) == (wp, hp)
        assert (db == dp).all()

    # the q255 exactness lever holds for progressive too: solid EVEN
    # gray survives the whole pipeline EXACTLY (DC divisible by the
    # quantizer, every AC zero)
    solid = np.full((8, 8, 3), 120, np.uint8)
    _, _, out = decode_jpeg(encode_jpeg_progressive(solid, grayscale=True))
    assert (out == solid).all()


def test_jpeg_progressive_flows_through_numpy_features():
    """decode_pixels magic-dispatch (FFD8) reaches the SOF2 branch with
    zero plumbing change: numpy_features over a progressive payload of
    a solid even gray equals the PPM encoding's features exactly."""
    import numpy as np

    from parquet_on_fhir_spark.operators.multimodal import (
        encode_jpeg_progressive,
        encode_ppm,
        numpy_features,
    )

    solid = np.full((8, 8, 3), 84, np.uint8)
    fj = numpy_features(bytes(encode_jpeg_progressive(solid)))
    fp = numpy_features(encode_ppm(solid))
    assert fj == fp


def test_jpeg_flows_through_numpy_features():
    """decode_pixels magic-dispatch picks the JPEG codec, so
    best_codec()/numpy_features handle JPEG payloads with zero plumbing
    change — closing the last compressed-format seam: features are
    66-dim reals, and for a solid even-gray payload EQUAL the PPM
    encoding of the same pixels (the decode is exact there)."""
    import numpy as np

    from parquet_on_fhir_spark.operators.multimodal import (
        best_codec,
        encode_jpeg,
        encode_ppm,
        numpy_features,
        numpy_resize,
    )

    img = np.full((16, 16, 3), 88, dtype=np.uint8)
    f_jpg = numpy_features(encode_jpeg(img, grayscale=True))
    f_ppm = numpy_features(encode_ppm(img))
    assert f_jpg == f_ppm and len(f_jpg) == 66
    # best_codec without PIL routes through the same numpy tier
    assert best_codec()(encode_jpeg(img, grayscale=True), None) == f_jpg
    # resize canonicalizes to PPM regardless of input container
    out = numpy_resize(encode_jpeg(img), None, 8, 8)
    assert out.startswith(b"P6")


def test_wav_roundtrip_and_features():
    """encode→decode identity for mono and stereo 16-bit PCM; features
    match closed forms; non-WAV payloads fall back to the stand-in."""
    import numpy as np

    from parquet_on_fhir_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        stand_in_features,
        wav_features,
    )

    rng = np.random.default_rng(3)
    mono = rng.integers(-20000, 20000, size=500, dtype="<i2")
    sr, ch, x = decode_wav(encode_wav(mono, 16000))
    assert (sr, ch, x.shape) == (16000, 1, (500, 1))
    assert np.allclose(x[:, 0], mono / 32768.0)
    stereo = rng.integers(-20000, 20000, size=(300, 2), dtype="<i2")
    sr2, ch2, y = decode_wav(encode_wav(stereo, 44100))
    assert (sr2, ch2, y.shape) == (44100, 2, (300, 2))
    assert np.allclose(y, stereo / 32768.0)
    # DC signal: rms == peak == a/32768, zero crossings 0
    dc = np.full(8000, 16384, dtype="<i2")
    f = wav_features(encode_wav(dc, 8000))
    assert f == [8000.0, 1.0, 0.5, 0.0, 0.5]
    # graceful stand-in for non-WAV payloads (fixed 5-dim width)
    assert wav_features(b"not audio") == stand_in_features(b"not audio")


def test_wav_rejects_out_of_envelope():
    import struct

    import numpy as np
    import pytest

    from parquet_on_fhir_spark.operators.multimodal import decode_wav, encode_wav

    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"P6 notwav")
    # float WAV (format tag 3) must be refused, not mis-decoded
    ok = bytearray(encode_wav(np.zeros(10, dtype="<i2"), 8000))
    fmt_pos = ok.index(b"fmt ") + 8
    struct.pack_into("<H", ok, fmt_pos, 3)
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(bytes(ok))
    # truncated data chunk
    with pytest.raises(ValueError, match="truncated WAV"):
        decode_wav(bytes(encode_wav(np.zeros(10, dtype="<i2"), 8000))[:-5])
    # sample_rate 0 must raise (ValueError -> stand-in fallback), not
    # ZeroDivisionError out of the feature math (fails the whole task)
    from parquet_on_fhir_spark.operators.multimodal import (
        stand_in_features,
        wav_features,
    )

    zr = bytearray(encode_wav(np.zeros(10, dtype="<i2"), 8000))
    struct.pack_into("<I", zr, zr.index(b"fmt ") + 8 + 4, 0)
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(bytes(zr))
    assert wav_features(bytes(zr)) == stand_in_features(bytes(zr))


def test_schema_diff(spark):
    from parquet_on_fhir_spark.operators.text import schema_diff

    a = spark.createDataFrame([(1, "x", 1.0)], "id long, s string, v double")
    b = spark.createDataFrame([(1, "x", 2)], "id long, s string, v int")
    c = spark.createDataFrame([(1, True)], "id long, flag boolean")
    got = {r.column: r.status for r in schema_diff(a, b).collect()}
    assert got == {"id": "unchanged", "s": "unchanged", "v": "type_changed"}
    got2 = {r.column: r.status for r in schema_diff(a, c).collect()}
    assert got2 == {
        "id": "unchanged", "s": "removed", "v": "removed", "flag": "added",
    }


def test_repeated_ngram_fraction_known_values(spark):
    """operators/text.py::repeated_ngram_fraction vs hand-counted
    trigram multisets: the Gopher repetition rule's count-based
    duplicate fraction, short docs unscored (absent), no-repeat docs
    at exactly 0."""
    from parquet_on_fhir_spark.operators.text import repeated_ngram_fraction

    docs = spark.createDataFrame(
        [
            # trigrams: 'a b a','b a b','a b a','b a b','a b a'
            # -> 5 total, 2 distinct -> dup 3/5
            (1, "a b a b a b a"),
            (2, "a b c d"),        # 2 distinct trigrams, 0 repeats
            (3, "x y"),            # < 3 tokens -> no trigrams -> absent
            (4, "T T t t"),        # lowercased: 't t t' x2 -> dup 1/2
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           repeated_ngram_fraction(docs, "doc_id", "text", 3).collect()}
    assert set(out) == {1, 2, 4}
    assert (out[1].n_ngrams, out[1].n_distinct) == (5, 2)
    assert abs(out[1].dup_fraction - 0.6) < 1e-12
    assert out[2].dup_fraction == 0.0
    assert (out[4].n_ngrams, out[4].n_distinct) == (2, 1)
    assert abs(out[4].dup_fraction - 0.5) < 1e-12


def test_source_ngram_overlap_known_values(spark):
    """operators/text.py::source_ngram_overlap vs hand-built vocab
    sets: shared/union counts, zero-overlap pairs omitted, distinct
    semantics (repeated grams within a source count once)."""
    from parquet_on_fhir_spark.operators.text import source_ngram_overlap

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "s1"),        # vocab {a b c, b c d}
            (2, "a b c x", "s2"),        # vocab {a b c, b c x}
            (3, "a b c a b c a", "s2"),  # adds {c a b, b c a} + repeats
            (4, "z z z z", "s3"),        # vocab {z z z}
        ],
        "doc_id long, text string, source string",
    )
    out = {(r.group_a, r.group_b): r
           for r in source_ngram_overlap(docs, "source", "text", 3).collect()}
    # s2 vocab: {a b c, b c x, c a b, b c a} (distinct across both docs)
    assert set(out) == {("s1", "s2")}
    r = out[("s1", "s2")]
    assert (r.grams_a, r.grams_b, r.shared) == (2, 4, 1)
    assert abs(r.jaccard - 1.0 / 5.0) < 1e-12


def test_vocab_richness_known_values(spark):
    """operators/text.py::vocab_richness vs a hand-built frequency
    spectrum: Chao1 bias-corrected form (defined at F2 = 0) and
    Good-Turing coverage, grouped and ungrouped."""
    from parquet_on_fhir_spark.operators.text import vocab_richness

    docs = spark.createDataFrame(
        [
            (1, "a a a b b c", "s1"),   # spectrum: a:3 b:2 c:1
            (2, "x y", "s2"),           # x:1 y:1
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in
           vocab_richness(docs, "text", "source").collect()}
    s1 = out["s1"]
    assert (s1.n_tokens, s1.vocab, s1.f1, s1.f2) == (6, 3, 1, 1)
    # chao1 = 3 + 1*0/(2*2) = 3; coverage = 1 - 1/6
    assert abs(s1.chao1 - 3.0) < 1e-12
    assert abs(s1.coverage - 5.0 / 6.0) < 1e-12
    s2 = out["s2"]
    assert (s2.n_tokens, s2.vocab, s2.f1, s2.f2) == (2, 2, 2, 0)
    # bias-corrected chao1 = 2 + 2*1/(2*1) = 3; coverage = 0
    assert abs(s2.chao1 - 3.0) < 1e-12
    assert abs(s2.coverage - 0.0) < 1e-12
    # ungrouped: one row over the pooled spectrum
    (tot,) = vocab_richness(docs, "text").collect()
    assert (tot.n_tokens, tot.vocab) == (8, 5)


def test_wav_spectral_features_pure_tone_and_noise():
    """Spectral codec vs closed forms: a bin-exact tone pins dominant/
    centroid/rolloff to the tone frequency with ~0 bandwidth/flatness;
    uniform noise drives flatness toward 1; a two-tone clip lands the
    centroid at the power-weighted mean and rolloff on the upper tone."""
    import numpy as np

    from parquet_on_fhir_spark.operators.multimodal import (
        encode_wav,
        wav_spectral_features,
    )

    sr, n = 8192, 2048
    t = np.arange(n)
    tone = (12000 * np.sin(2 * np.pi * 37 * t / n)).astype(np.int16)
    f = wav_spectral_features(encode_wav(tone, sr))
    assert f[0] == sr and f[1] == n
    assert f[2] == 37 * 4  # dominant
    assert abs(f[3] - 37 * 4) < 1e-3  # centroid
    assert f[4] == 37 * 4  # rolloff
    assert f[5] < 0.2  # bandwidth ~ quantization noise only
    assert f[6] < 1e-4  # flatness ~ 0 for a pure tone

    rng = np.random.default_rng(11)
    noise = rng.integers(-12000, 12000, size=n).astype(np.int16)
    fn = wav_spectral_features(encode_wav(noise, sr))
    assert fn[6] > 0.5  # white noise is spectrally flat

    two = (
        6000 * np.sin(2 * np.pi * 20 * t / n)
        + 6000 * np.sin(2 * np.pi * 60 * t / n)
    ).astype(np.int16)
    f2 = wav_spectral_features(encode_wav(two, sr))
    assert abs(f2[3] - (20 * 4 + 60 * 4) / 2) < 1.0  # equal-power mean
    assert f2[4] == 60 * 4  # 85% rolloff needs the upper tone
    assert f2[2] in (20 * 4, 60 * 4)

    # stand-in fallback keeps the 7-dim width
    assert len(wav_spectral_features(b"not audio at all")) == 7


def test_exif_parse_and_fixtures(spark):
    """EXIF audit (r13): TIFF-structured blob builder + parse across
    JPEG APP1 / PNG eXIf / WebP EXIF / raw TIFF containers; big-endian
    acceptance; orientation default; GPS-presence flag; and the
    exif_audit mapInPandas operator end-to-end."""
    import numpy as np
    import struct

    from parquet_on_fhir_spark.operators.multimodal import (
        build_exif,
        encode_jpeg,
        encode_webp_lossless,
        exif_audit,
        parse_exif,
        wrap_exif_jpeg,
        wrap_exif_webp,
    )
    full = build_exif(orientation=6, make="ACME Cameras Inc", model="X1",
                      pixel_w=4032, pixel_h=3024,
                      datetime_original="2024:05:01 10:00:00", gps=True)
    info = parse_exif(full)
    assert info == {
        "orientation": 6, "make": "ACME Cameras Inc", "model": "X1",
        "pixel_w": 4032, "pixel_h": 3024,
        "datetime_original": "2024:05:01 10:00:00", "has_gps": True,
    }
    # defaults: no orientation tag -> 1; no gps pointer -> False
    bare = build_exif()
    assert parse_exif(bare)["orientation"] == 1
    assert parse_exif(bare)["has_gps"] is False

    img = np.full((8, 8, 3), 90, np.uint8)
    j = wrap_exif_jpeg(encode_jpeg(img), build_exif(orientation=3, gps=True))
    assert parse_exif(j)["orientation"] == 3 and parse_exif(j)["has_gps"]
    w = wrap_exif_webp(encode_webp_lossless(img), build_exif(make="Cam"))
    assert parse_exif(w)["make"] == "Cam"
    assert parse_exif(encode_jpeg(img)) is None  # no EXIF at all

    # PNG eXIf chunk (inserted before IEND, correct CRC)
    import zlib

    from parquet_on_fhir_spark.operators.multimodal import encode_png

    png = encode_png(img)
    ex2 = build_exif(orientation=5)
    chunk = struct.pack(">I", len(ex2)) + b"eXIf" + ex2
    chunk += struct.pack(">I", zlib.crc32(b"eXIf" + ex2) & 0xFFFFFFFF)
    iend = png.rindex(b"IEND") - 4
    png_ex = png[:iend] + chunk + png[iend:]
    assert parse_exif(png_ex)["orientation"] == 5
    assert parse_exif(png) is None

    # big-endian TIFF header accepted (hand-flip the tiny bare blob)
    be = (b"MM\x00*" + struct.pack(">I", 8)
          + struct.pack(">H", 1)
          + struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">HH", 8, 0)
          + struct.pack(">I", 0))
    assert parse_exif(be)["orientation"] == 8

    media = spark.createDataFrame(
        [(1, bytearray(j)), (2, bytearray(w)),
         (3, bytearray(encode_jpeg(img)))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in exif_audit(media).collect()}
    assert rows[1]["orientation"] == 3 and rows[1]["has_gps"] is True
    assert rows[2]["make"] == "Cam" and rows[2]["has_exif"] is True
    assert rows[3]["has_exif"] is False and rows[3]["orientation"] is None


def test_apply_exif_orientation_group_properties():
    """The 8 EXIF orientations: identity/involution/rotation-group
    sanity plus a hand-pinned asymmetric example for each value (the
    spec directions are easy to mirror-swap)."""
    import numpy as np
    import pytest

    from parquet_on_fhir_spark.operators.multimodal import (
        apply_exif_orientation as fix,
    )

    a = np.arange(6).reshape(2, 3)
    # hand-pinned: a = [[0,1,2],[3,4,5]]
    assert np.array_equal(fix(a, 1), a)
    assert np.array_equal(fix(a, 2), [[2, 1, 0], [5, 4, 3]])
    assert np.array_equal(fix(a, 3), [[5, 4, 3], [2, 1, 0]])
    assert np.array_equal(fix(a, 4), [[3, 4, 5], [0, 1, 2]])
    # 6 = stored image is the upright rotated 90 CCW -> undo with CW:
    # column 0 of the result is the LAST row of the stored image
    assert np.array_equal(fix(a, 6), [[3, 0], [4, 1], [5, 2]])
    assert np.array_equal(fix(a, 8), [[2, 5], [1, 4], [0, 3]])
    assert np.array_equal(fix(a, 5), [[2, 5], [1, 4], [0, 3]][::-1])
    assert np.array_equal(fix(a, 7), np.array([[3, 0], [4, 1], [5, 2]])[::-1])
    # involutions: 2,3,4 applied twice = identity
    for o in (2, 3, 4):
        assert np.array_equal(fix(fix(a, o), o), a)
    # 6 then 8 (= rot CW then rot CCW) = identity
    assert np.array_equal(fix(fix(a, 6), 8), a)
    with pytest.raises(ValueError, match="1-8"):
        fix(a, 9)


def test_audio_frame_features_framing(spark):
    """STFT framing (r14): frame-aligned tone segments land their
    exact bin frequency per frame, partial tail frames drop, hop <
    frame_len overlaps, junk quarantines as frame_idx=-1."""
    import numpy as np

    from parquet_on_fhir_spark.operators.multimodal import (
        audio_frame_features,
        encode_wav,
        stft_frame_features,
    )

    sr, fl = 8192, 512
    t_ = np.arange(fl)
    segs = [
        (12000 * np.sin(2 * np.pi * (20 + m) * t_ / fl)).astype(np.int16)
        for m in range(3)
    ]
    clip = encode_wav(np.concatenate(segs + [segs[0][:100]]), sr)  # tail
    got_sr, frames = stft_frame_features(clip, fl, fl)
    assert got_sr == sr and len(frames) == 3  # tail frame dropped
    for m, (i, rms, dom, cen) in enumerate(frames):
        assert i == m and dom == 16.0 * (20 + m)
        assert abs(cen - 16.0 * (20 + m)) < 1e-3
        assert abs(rms - 12000 / 32768 / np.sqrt(2)) < 1e-4
    # overlap: hop = fl // 2 over 3 full frames -> 5 frames
    _, over = stft_frame_features(clip, fl, fl // 2)
    assert len(over) == 5
    media = spark.createDataFrame(
        [(1, bytearray(clip)), (2, bytearray(b"junk"))],
        "media_id long, content binary",
    )
    rows = audio_frame_features(media, frame_len=fl, hop=fl).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert sorted(by_id[1]) == [0, 1, 2] and by_id[2] == [-1]
    # max_frames guard
    capped = audio_frame_features(
        media, frame_len=fl, hop=fl, max_frames=2
    ).filter(F.col("media_id") == 1).count()
    assert capped == 2


def test_split_sentences_rules(spark):
    """split_sentences (r14): maximal terminal-run segmentation,
    trim, min_chars drop, multi-terminal runs stay attached, tail
    fragment measured but not emitted."""
    from parquet_on_fhir_spark.operators.text import split_sentences

    docs = spark.createDataFrame(
        [(1, "One two. Three!! Four?No gap... tail here"),
         (2, "no terminals at all"),
         (3, "x. Big second sentence.")],
        "doc_id long, text string",
    )
    rows = {}
    for r in split_sentences(docs, min_chars=2).collect():
        rows.setdefault(r["doc_id"], []).append(
            (r["sent_idx"], r["sentence"], r["tail_len"]))
    assert [s for _, s, _ in sorted(rows[1])] == [
        "One two.", "Three!!", "Four?", "No gap..."]
    assert rows[1][0][2] == len(" tail here")
    assert 2 not in rows  # zero sentences -> zero rows (explode)
    # 'x.' is 2 chars -> kept at min_chars=2, dropped at 3
    assert len(rows[3]) == 2
    got3 = {r["sentence"] for r in split_sentences(docs, min_chars=3)
            .filter(F.col("doc_id") == 3).collect()}
    assert got3 == {"Big second sentence."}
