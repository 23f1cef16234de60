"""Hostile-input discipline for the crawl-stack parsers (r14): crawled
bytes are adversarial by default, and an uncaught exception inside a
mapInPandas batch kills the executor UDF for every row in the batch.
Contract: ``parse_warc`` may raise ONLY ValueError (the quarantine
signal ``warc_records`` converts to a rec_idx=-1 row); every other
parser in the chain must never raise at all — it degrades (replace
chars, empty extraction, allow-by-default, NULL fields) instead.
Seeded random fuzz + structured mutations of valid fixtures."""

import random

from parquet_on_fhir_spark.operators.encoding import (
    decode_payload,
    fix_mojibake_text,
    parse_http_response,
    sniff_charset,
)
from parquet_on_fhir_spark.operators.html import extract_main_text
from parquet_on_fhir_spark.operators.robots import (
    parse_robots,
    pattern_regex,
    robots_allowed,
)
from parquet_on_fhir_spark.operators.warc import build_warc, parse_warc


def _random_blobs(seed, n, max_len=400):
    rng = random.Random(seed)
    out = [b"", b"\x00", b"\xff" * 3]
    for _ in range(n):
        out.append(bytes(rng.randrange(256) for _ in range(rng.randrange(max_len))))
    return out


def test_warc_raises_only_valueerror():
    recs = [("response", "https://e.x/", "2026-01-01T00:00:00Z",
             b"HTTP/1.1 200 OK\r\n\r\nbody")]
    for gz in (False, True):
        good = build_warc(recs, gzip_members=gz)
        # every truncation point: ValueError or a successful parse
        for cut in range(len(good)):
            try:
                parse_warc(good[:cut])
            except ValueError:
                pass
        # every single-byte corruption of the header region
        for pos in range(0, min(60, len(good))):
            bad = bytearray(good)
            bad[pos] ^= 0xFF
            try:
                parse_warc(bytes(bad))
            except ValueError:
                pass
    for blob in _random_blobs(140, 120):
        try:
            parse_warc(blob)
        except ValueError:
            pass


def test_http_and_charset_never_raise():
    for blob in _random_blobs(141, 150):
        status, headers, body = parse_http_response(blob)
        assert status is None or isinstance(status, int)
        for ct in (None, "text/html; charset=utf-8",
                   "text/html; charset=\x00bogus", "charset=",
                   "text/html; charset=" + "x" * 500):
            cs, src = sniff_charset(blob, ct)
            text = decode_payload(blob, cs, src)
            assert isinstance(text, str)
    # charset param that names a real but exotic codec still decodes
    cs, src = sniff_charset(b"\x82\xa0", "text/plain; charset=shift-jis")
    assert cs == "shift_jis" and isinstance(
        decode_payload(b"\x82\xa0", cs, src), str
    )


def test_html_extractor_never_raises():
    rng = random.Random(142)
    frags = ["<", ">", "</", "<a", "href=", "'", '"', "&", "&amp",
             "<p>", "</p>", "<script>", "<!--", "]]>", "\x00", "é",
             "<div", "<table><tr><td>", "<!DOCTYPE", "<![CDATA["]
    for _ in range(150):
        s = "".join(rng.choice(frags) for _ in range(rng.randrange(40)))
        info = extract_main_text(s)
        assert isinstance(info["n_blocks"], int)


def test_robots_parser_never_raises_and_regex_is_safe():
    rng = random.Random(143)
    pieces = ["User-agent:", "Disallow:", "Allow:", "*", "$", "/",
              "a", ":", "#c", "\n", "\r\n", " ", "sitemap:", "\x00",
              "((", "[", "\\", ".*", "+?"]
    import re as _re

    for _ in range(200):
        txt = "".join(rng.choice(pieces) for _ in range(rng.randrange(60)))
        rules = parse_robots(txt, "bot")
        assert robots_allowed(rules, "/any/path") in (True, False)
        for _, pat in rules:
            if pat:
                # the Java-portable regex must also be a VALID python
                # regex (same construction) — no metacharacter leaks
                _re.compile(pattern_regex(pat))


def test_mojibake_never_raises_or_grows():
    rng = random.Random(144)
    for _ in range(200):
        n = rng.randrange(60)
        s = "".join(chr(rng.randrange(1, 0x2FFF)) for _ in range(n))
        out, passes = fix_mojibake_text(s)
        assert passes >= 0 and len(out) <= len(s)


def test_sitemap_and_metadata_never_raise(spark):
    """The pure-Catalyst parsers (parse_sitemap, html_metadata) run
    hostile strings through the JVM regex engine — execute a batch of
    junk rows end-to-end and require completion."""
    from parquet_on_fhir_spark.operators.html import html_metadata
    from parquet_on_fhir_spark.operators.robots import sitemap_urls
    from parquet_on_fhir_spark.operators.robots import parse_sitemap

    rng = random.Random(145)
    frags = ["<url>", "</url>", "<loc>", "</loc>", "<sitemapindex",
             "<urlset>", "<", ">", "&", "x", "\n", "\x00", "é",
             "<lastmod>", "]]>", "sitemap:", "Sitemap: http://a/b"]
    rows = [(i, "".join(rng.choice(frags) for _ in range(rng.randrange(30))))
            for i in range(80)]
    sm = spark.createDataFrame(
        [(f"h{i}", s) for i, s in rows],
        "host string, sitemap_xml string",
    )
    assert parse_sitemap(sm).count() >= 0
    robots = sm.withColumnRenamed("sitemap_xml", "robots_txt")
    assert sitemap_urls(robots).count() >= 0
    pages = spark.createDataFrame(
        [(i, s) for i, s in rows], "doc_id long, html string"
    )
    assert html_metadata(pages).count() >= 0


def test_wav_decode_raises_only_valueerror():
    """r14 advice: a RIFF whose fmt chunk's declared size matches its
    body but is <16 bytes drove struct.unpack_from to struct.error,
    escaping the ValueError quarantine contract. decode_wav now maps
    it; fuzz the whole decoder the same way as the WARC parser."""
    import struct as _s

    from parquet_on_fhir_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    short_fmt = (
        b"RIFF" + _s.pack("<I", 28) + b"WAVE"
        + b"fmt " + _s.pack("<I", 8) + b"\x01\x00\x01\x00\x40\x1f\x00\x00"
        + b"data" + _s.pack("<I", 0)
    )
    try:
        decode_wav(short_fmt)
        raise AssertionError("short fmt chunk must not decode")
    except ValueError:
        pass

    good = encode_wav([[100], [-100], [3000]], 8000)
    for cut in range(len(good)):
        try:
            decode_wav(good[:cut])
        except ValueError:
            pass
    for pos in range(len(good)):
        bad = bytearray(good)
        bad[pos] ^= 0xFF
        try:
            decode_wav(bytes(bad))
        except ValueError:
            pass
    for blob in _random_blobs(322, 150):
        try:
            decode_wav(b"RIFF" + blob)
        except ValueError:
            pass
        try:
            decode_wav(blob)
        except ValueError:
            pass


def test_audio_frame_features_quarantines_hostile_wav(spark):
    """The crafted short-fmt RIFF must land as a frame_idx=-1 row,
    never kill the Arrow batch (r14 advice, operator level)."""
    import struct as _s

    from parquet_on_fhir_spark.operators.multimodal import (
        audio_frame_features,
        encode_wav,
    )

    short_fmt = (
        b"RIFF" + _s.pack("<I", 28) + b"WAVE"
        + b"fmt " + _s.pack("<I", 8) + b"\x01\x00\x01\x00\x40\x1f\x00\x00"
        + b"data" + _s.pack("<I", 0)
    )
    good = encode_wav([[v] for v in ([3000, -3000] * 600)], 8000)
    media = spark.createDataFrame(
        [(1, bytearray(short_fmt)), (2, bytearray(good))],
        "media_id long, content binary",
    )
    rows = audio_frame_features(media, frame_len=256, hop=256).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert by_id[1] == [-1]
    assert len(by_id[2]) >= 1 and -1 not in by_id[2]


def test_codec_decoders_raise_only_valueerror():
    """r15 decoder-contract fuzz (generalizing the r14 decode_wav
    advice): every pure-input decoder entry point may raise ONLY
    ValueError (or NotImplementedError for the gated AVIF path) on
    hostile bytes — truncations, bit flips and random soup over every
    in-repo encoder's output. The _codec_quarantine translator maps
    the mechanical exception types; this pins the contract."""
    import random

    import numpy as np

    from parquet_on_fhir_spark.operators import multimodal as M

    img = np.zeros((8, 8, 3), np.uint8)
    img[::2, ::2] = 200
    fixtures = [
        M.encode_ppm(img), M.encode_png(img), M.encode_jpeg(img),
        M.encode_jpeg_progressive(img), M.encode_gif(img),
        M.encode_gif_animation([img, img], [10, 10]),
        M.encode_wav([[100], [200], [-100]], 8000),
        bytes(M.encode_webp_lossless(img)),
        bytes(M.encode_webp_animation([img, img], [10, 20])),
        M.encode_tiff(img), M.encode_tiff(img, packbits=True),
    ]
    decoders = [
        M.decode_ppm, M.decode_bmp, M.decode_png, M.decode_jpeg,
        M.decode_gif, M.decode_gif_frames, M.decode_wav, M.decode_webp,
        M.decode_webp_frames, M.decode_tiff, M.parse_exif,
        M.decode_pixels,
    ]
    rng = random.Random(1531)
    blobs = [b"", b"\x00" * 8]
    for f in fixtures:
        f = bytes(f)
        for _ in range(6):
            blobs.append(f[:rng.randrange(len(f))])
        for _ in range(8):
            b = bytearray(f)
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            blobs.append(bytes(b))
    for _ in range(30):
        blobs.append(bytes(rng.randrange(256)
                           for _ in range(rng.randrange(120))))
    for fn in decoders:
        for blob in blobs:
            try:
                fn(blob)
            except (ValueError, NotImplementedError):
                pass
