"""Multimodal column plumbing (SURVEY.md §2B Q73).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct, per the format spec's base64Binary mapping
(/root/reference/README.md:63 — base64Binary → parquet binary).

The Spark-side plumbing (schema, partitioning, Arrow batch shape,
mapInPandas signatures) is real and tested. Codecs come in three tiers:

- ``numpy_features`` / ``numpy_resize`` — REAL decoders for P6 PPM,
  24-bit BMP, and 8-bit PNG (stdlib ``zlib`` inflate + numpy scanline
  unfiltering — no codec library), so the bytes→pixels→features path
  genuinely runs in this container, compressed formats included;
- ``decode_real`` — the PIL seam for the remaining compressed formats
  (JPEG/WebP/...), import-guarded: raises ``NotImplementedError`` with
  wiring guidance when PIL is absent;
- ``stand_in_features`` — the deterministic byte-statistics fallback
  for payloads no available codec understands.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Feature codec signature: (payload bytes, mime) -> fixed-width feature list.
FeatureCodec = Callable[[bytes, str | None], list[float]]
#: Resize codec signature: (payload bytes, mime, width, height) -> new bytes.
ResizeCodec = Callable[[bytes, str | None, int, int], bytes]

MEDIA_SCHEMA = (
    "media_id BIGINT, kind STRING, content BINARY, "
    "meta STRUCT<mime: STRING, width: INT, height: INT, duration_ms: BIGINT>"
)

FEATURE_SCHEMA = "media_id BIGINT, kind STRING, n_bytes BIGINT, feat ARRAY<DOUBLE>"


def attach_binary(df: DataFrame, payload_col: str, kind: str = "image") -> DataFrame:
    """Wrap an existing column as a multimodal record: binary payload +
    typed metadata struct. (In production the payload comes from
    ``spark.read.format("binaryFile")`` or an upstream table.)"""
    content = F.encode(F.col(payload_col).cast("string"), "UTF-8")
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        content.alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )


def codec_available(kind: str = "image") -> bool:
    """True when a real codec library for ``kind`` is importable."""
    import importlib.util

    if kind == "image":
        return importlib.util.find_spec("PIL") is not None
    if kind == "audio":
        return importlib.util.find_spec("soundfile") is not None
    return False


def decode_real(content: bytes, mime: str | None = None) -> list[float]:
    """Real image codec, import-guarded: PIL decode → (width, height,
    8×8 luminance grid) = a 66-dim feature, the classic average-hash
    shape. Raises NotImplementedError with wiring guidance when PIL is
    absent (this container ships no codec libraries) — the mapInPandas
    plumbing in ``extract_features`` is identical either way, so a
    cluster with PIL installed gets the real path with zero code change
    (pass ``codec=decode_real``)."""
    if mime is None or mime.startswith("image/") or mime == "application/octet-stream":
        try:
            import io

            from PIL import Image
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "image decode requires PIL (pip install pillow); this "
                "environment ships no codec library — use the default "
                "stand_in_features codec, or install pillow and pass "
                "codec=decode_real to extract_features"
            ) from e
        img = Image.open(io.BytesIO(content)).convert("L")
        w, h = img.size
        px = list(img.resize((8, 8)).getdata())
        return [float(w), float(h)] + [p / 255.0 for p in px]
    raise NotImplementedError(
        f"no real codec wired for mime {mime!r} (audio/video: wire "
        "soundfile/av here; the extract_features plumbing is unchanged)"
    )


def best_codec() -> FeatureCodec:
    """``decode_real`` when a codec library is importable, else
    ``numpy_features`` — the built-in numpy decoder handles uncompressed
    BMP/PPM for real (and itself falls back to the deterministic
    stand-in for payloads it cannot parse), so pipelines opt into the
    best available decode without caring about the environment.

    MIXED-FORMAT CAVEAT: the numpy tier emits 66-dim vectors for
    decodable payloads and 5-dim stand-ins for the rest, so a corpus
    mixing formats yields a ragged feature column. Fixed-width
    consumers (cosine/PCA/covariance) must partition by kind/mime
    first, or pin a single codec explicitly."""
    return decode_real if codec_available("image") else numpy_features


def stand_in_features(b: bytes, mime: str | None = None) -> list[float]:
    """Deterministic stand-in feature codec: byte length + 4
    byte-histogram moments — shaped exactly like a real embedding
    extractor (binary in, fixed-width float vector out)."""
    n = len(b)
    if not n:
        return [0.0, 0.0, 0.0, 0.0, 0.0]
    mean = sum(b) / n
    var = sum((x - mean) ** 2 for x in b[:256]) / max(min(n, 256), 1)
    return [float(n), mean, var, float(b[0]), float(b[-1])]


def _feature_batches(codec: FeatureCodec):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # MEDIA_SCHEMA allows a NULL meta struct: dict rows use .get,
            # non-dict non-None rows (Row-like) index, None rows yield None.
            mimes = [
                m.get("mime")
                if isinstance(m, dict)
                else (m["mime"] if m is not None else None)
                for m in pdf["meta"]
            ] if "meta" in pdf.columns else [None] * len(pdf)
            raw = [bytes(c) if c is not None else b"" for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b) for b in raw],
                    "feat": [
                        [float(x) for x in codec(b, m)]
                        for b, m in zip(raw, mimes)
                    ],
                }
            )

    return fn


def extract_features(media: DataFrame, codec: FeatureCodec | None = None) -> DataFrame:
    """binary → feature vectors via ``mapInPandas`` (Arrow batches).

    This is the scale-relevant shape: partition-parallel, batch-at-a-time
    (never row-at-a-time Python), output schema fixed so downstream
    similarity/dedup operators can consume ``feat`` like any embedding.

    ``codec`` is the pluggable decode seam: any ``(bytes, mime) ->
    list[float]`` callable (e.g. one that wires ``decode_real`` to
    PIL/libav on a cluster that has them). Defaults to the deterministic
    ``stand_in_features`` so the plumbing is testable in codec-less
    environments.
    """
    return media.mapInPandas(
        _feature_batches(codec or stand_in_features), schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each media row into the frame
    timestamps a decoder would extract (sequence + explode — JVM-side).
    The per-frame decode would run through ``extract_features``."""
    n_frames = F.coalesce(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                lambda i: i * every_ms,
            )
        ).alias("frame_ts_ms"),
    )


def _resize_batches(target_w: int, target_h: int, codec: ResizeCodec | None):
    """Arrow-batched image resize plumbing: batch iteration, binary
    rewrite via the pluggable ``codec``, metadata rewrite, fixed output
    schema. With no codec the bytes pass through unchanged (the honest
    no-library default); a real deployment passes a PIL resample."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL-meta-safe, same contract as _feature_batches.
            mimes = [
                m.get("mime")
                if isinstance(m, dict)
                else (m["mime"] if m is not None else None)
                for m in pdf["meta"]
            ]
            meta = [
                {
                    "mime": mime,
                    "width": target_w,
                    "height": target_h,
                    "duration_ms": m.get("duration_ms")
                    if isinstance(m, dict)
                    else (m["duration_ms"] if m is not None else None),
                }
                for m, mime in zip(pdf["meta"], mimes)
            ]
            if codec is None:
                content = pdf["content"]
            else:
                content = [
                    codec(
                        bytes(c) if c is not None else b"", mime, target_w, target_h
                    )
                    for c, mime in zip(pdf["content"], mimes)
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": content,
                    "meta": meta,
                }
            )

    return fn


def resize_images(
    media: DataFrame, width: int, height: int, codec: ResizeCodec | None = None
) -> DataFrame:
    """binary → binary resize via ``mapInPandas``: same MEDIA_SCHEMA out,
    metadata dimensions rewritten. Partition-parallel and batch-at-a-time
    like extract_features. ``codec`` is the pluggable pixel seam
    (``(bytes, mime, w, h) -> bytes``; wire PIL here); None passes bytes
    through unchanged."""
    return media.mapInPandas(_resize_batches(width, height, codec), schema=MEDIA_SCHEMA)


def audio_chunk_plan(media: DataFrame, chunk_ms: int = 5000) -> DataFrame:
    """Audio chunking *plan*: each media row expands to the [start, end)
    windows a decoder would cut — ``sequence`` + ``explode``, all
    JVM-side; per-chunk decode runs through ``extract_features``."""
    n_chunks = F.coalesce(
        F.ceil(F.col("meta.duration_ms") / F.lit(chunk_ms)).cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
                lambda i: F.struct(
                    (i * chunk_ms).alias("chunk_start_ms"),
                    F.least(
                        (i + 1) * chunk_ms,
                        F.coalesce(F.col("meta.duration_ms").cast("int"), F.lit(chunk_ms)),
                    ).alias("chunk_end_ms"),
                ),
            )
        ).alias("c"),
    ).select("media_id", "c.chunk_start_ms", "c.chunk_end_ms")


# --- real codecs for uncompressed formats (no external library) --------------------
# PPM (P6) and 24-bit uncompressed BMP decode with numpy alone, so this
# container has a REAL bytes→pixels→features path; compressed formats
# (JPEG/PNG/...) still route through the PIL seam in decode_real.

def decode_ppm(content: bytes):
    """P6 binary PPM → (width, height, HxWx3 uint8 array). Raises
    ValueError on malformed headers — quarantine upstream, don't guess."""
    import numpy as np

    if not content.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: P6, whitespace/comments, width, height, maxval, single ws
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    raw = content[pos : pos + need]
    if len(raw) != need:
        raise ValueError("truncated PPM payload")
    return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(pixels) -> bytes:
    """HxWx3 uint8 array → P6 bytes (the test/resize writer)."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_bmp(content: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) → (width, height,
    HxWx3 uint8 RGB array). Bottom-up row order and 4-byte row padding
    handled; BGR swapped to RGB."""
    import struct

    import numpy as np

    if content[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", content, 10)[0]
    header_size = struct.unpack_from("<I", content, 14)[0]
    if header_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h_signed = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    need = stride * h
    raw = content[data_offset : data_offset + need]
    if len(raw) != need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if h_signed > 0:  # bottom-up storage (the common case)
        img = img[::-1]
    return w, h, np.ascontiguousarray(img)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(content: bytes):
    """8-bit non-interlaced PNG → (width, height, HxWx3 uint8 RGB
    array) with NO codec library: chunk walk + stdlib ``zlib``
    inflate + numpy scanline unfiltering. Supports color types 0
    (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); alpha is
    dropped and gray replicated so every decoder in this module yields
    the same HxWx3 shape. Filters 0–4 (None/Sub/Up/Average/Paeth) are
    all handled — Sub as a per-lane modular cumsum, Up vectorized,
    Average/Paeth per-byte (their recurrences are inherently
    sequential). Raises ValueError on anything outside that envelope
    (16-bit, interlaced, truncated) — quarantine upstream, don't
    guess."""
    import struct
    import zlib

    import numpy as np

    if not content.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, idat, plte, hdr = 8, [], None, None
    while pos + 8 <= len(content):
        length, ctype = struct.unpack_from(">I4s", content, pos)
        data = content[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # length + type + payload + CRC
        if ctype == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if hdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = hdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, interlace={interlace})"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None or (color == 3 and plte is None):
        raise ValueError(f"unsupported PNG color type {color}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline size mismatch")
    bpp = channels
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = raw[y * (1 + stride)]
        cur = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).astype(np.int32)
        if ft == 0:
            rec = cur
        elif ft == 1:  # Sub: per-lane modular prefix sum
            rec = np.cumsum(cur.reshape(-1, bpp), axis=0).reshape(-1)
        elif ft == 2:  # Up
            rec = cur + prev
        elif ft == 3:  # Average
            rec = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = cur[i] + ((left % 256) + prev[i]) // 2
        elif ft == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = rec[i - bpp] % 256 if i >= bpp else 0
                b = prev[i]
                c_ = prev[i - bpp] if i >= bpp else 0
                p = a + b - c_
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c_)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c_)
                rec[i] = cur[i] + pr
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        rec = rec % 256
        out[y] = rec.astype(np.uint8)
        prev = rec
    px = out.reshape(h, w, channels)
    if color == 2:
        img = px
    elif color == 6:
        img = px[:, :, :3]
    elif color == 3:
        img = plte[px[:, :, 0]]
    else:  # gray / gray+alpha → replicate luminance
        img = np.repeat(px[:, :, :1], 3, axis=2)
    return w, h, np.ascontiguousarray(img)


def encode_png(pixels, filter_type: int | None = None) -> bytes:
    """HxWx3 uint8 RGB array → PNG bytes (color type 2, depth 8). The
    test/fixture writer for :func:`decode_png`; ``filter_type`` pins
    one scanline filter (0–4), default cycles y % 5 so round-trip
    tests exercise every unfilter path."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    bpp = 3
    lines = []
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        cur = arr[y].reshape(-1).astype(np.int32)
        ft = (y % 5) if filter_type is None else filter_type
        if ft == 0:
            f = cur
        elif ft == 1:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            f = cur - left
        elif ft == 2:
            f = cur - prev
        elif ft == 3:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            f = cur - (left + prev) // 2
        elif ft == 4:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
            p = left + prev - upleft
            pa, pb, pc = (
                np.abs(p - left),
                np.abs(p - prev),
                np.abs(p - upleft),
            )
            pr = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            f = cur - pr
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        lines.append(bytes([ft]) + (f % 256).astype(np.uint8).tobytes())
        prev = cur
    body = zlib.compress(b"".join(lines))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", body)
        + chunk(b"IEND", b"")
    )


def decode_pixels(content: bytes, mime: str | None = None):
    """Magic-byte dispatch to the built-in decoders. ValueError when no
    built-in codec matches (caller decides: stand-in, PIL, quarantine)."""
    if content.startswith(b"P6"):
        return decode_ppm(content)
    if content.startswith(b"BM"):
        return decode_bmp(content)
    if content.startswith(_PNG_SIG):
        return decode_png(content)
    raise ValueError(f"no built-in codec for payload (mime={mime!r})")


def _grid_8x8(img):
    """HxWx3 uint8 → 64 luminance samples on an 8×8 grid (box average
    when divisible, nearest-neighbor index sampling otherwise — the
    average-hash layout decode_real produces via PIL resize)."""
    import numpy as np

    h, w, _ = img.shape
    lum = img.astype(np.float64).mean(axis=2) / 255.0
    if h % 8 == 0 and w % 8 == 0:
        return (
            lum.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3)).ravel().tolist()
        )
    ys = np.minimum((np.arange(8) * h) // 8, h - 1)
    xs = np.minimum((np.arange(8) * w) // 8, w - 1)
    return lum[np.ix_(ys, xs)].ravel().tolist()


def numpy_features(content: bytes, mime: str | None = None) -> list[float]:
    """REAL feature codec for uncompressed formats: decode to pixels,
    then (width, height, 8×8 luminance grid) — byte-compatible with
    ``decode_real``'s PIL output shape (66-dim). Payloads no built-in
    codec understands fall back to the deterministic stand-in (same
    vector WIDTH is not guaranteed across codecs; pipelines that mix
    formats should partition by kind/mime first, as the docstring of
    extract_features notes)."""
    try:
        w, h, img = decode_pixels(content, mime)
    except ValueError:
        return stand_in_features(content, mime)
    return [float(w), float(h)] + _grid_8x8(img)


def numpy_resize(
    content: bytes, mime: str | None, width: int, height: int
) -> bytes:
    """REAL resize codec for uncompressed formats: nearest-neighbor
    resample, re-encoded as P6 PPM (one canonical uncompressed output
    container regardless of input format). Unknown payloads pass
    through unchanged."""
    import numpy as np

    try:
        _, _, img = decode_pixels(content, mime)
    except ValueError:
        return content
    h, w, _ = img.shape
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return encode_ppm(img[np.ix_(ys, xs)])


# --- real audio codec for PCM WAV (no external library) ----------------------------
def decode_wav(content: bytes):
    """RIFF/WAVE PCM → (sample_rate, channels, float64 array of shape
    (n_samples, channels) normalized to [-1, 1]) with NO codec library
    — chunk walk + numpy frombuffer. 16-bit and 8-bit PCM supported
    (format tag 1); compressed codecs (MP3/AAC/float WAV) raise
    ValueError — route those through the soundfile seam in
    ``decode_real``/quarantine upstream."""
    import struct

    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid, size = struct.unpack_from("<4sI", content, pos)
        body = content[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WAV chunk")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _brate, _align, bits = fmt
    # sample_rate == 0 would ZeroDivisionError in downstream duration /
    # feature math, escaping the ValueError → stand-in fallback
    if (
        audio_format != 1
        or bits not in (8, 16)
        or channels < 1
        or sample_rate < 1
    ):
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits},"
            f" rate={sample_rate})"
        )
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2")
        norm = raw.astype(np.float64) / 32768.0
    else:  # 8-bit WAV is unsigned, midpoint 128
        raw = np.frombuffer(data, dtype=np.uint8)
        norm = (raw.astype(np.float64) - 128.0) / 128.0
    n = len(norm) // channels
    return sample_rate, channels, norm[: n * channels].reshape(n, channels)


def encode_wav(samples, sample_rate: int) -> bytes:
    """(n, channels) int16 array → 16-bit PCM WAV bytes (the
    test/fixture writer for :func:`decode_wav`)."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    n, ch = arr.shape
    data = arr.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def wav_features(content: bytes, mime: str | None = None) -> list[float]:
    """REAL audio feature codec: decode PCM WAV, then [sample_rate,
    duration_s, rms, zero_crossings_per_s, peak] over the mono mixdown
    — the shape an audio-quality filter consumes (silence ≈ rms 0,
    clipping ≈ peak 1). Payloads that are not PCM WAV fall back to the
    deterministic byte-statistics stand-in (5-dim too, so the feature
    column stays fixed-width across a mixed corpus)."""
    import numpy as np

    try:
        sr, _ch, x = decode_wav(content)
    except ValueError:
        return stand_in_features(content, mime)
    mono = x.mean(axis=1)
    n = len(mono)
    if n == 0:
        return [float(sr), 0.0, 0.0, 0.0, 0.0]
    rms = float(np.sqrt(np.mean(mono * mono)))
    crossings = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    dur = n / sr
    return [float(sr), dur, rms, crossings / dur, float(np.abs(mono).max())]


def best_audio_codec() -> FeatureCodec:
    """Audio counterpart to :func:`best_codec`: a soundfile-backed real
    decoder when the library is importable, else the built-in numpy
    PCM-WAV codec (:func:`wav_features`) — which itself falls back to
    the deterministic stand-in for payloads it cannot parse, so the
    feature column stays populated across a mixed corpus."""
    if not codec_available("audio"):
        return wav_features

    def soundfile_features(content: bytes, mime: str | None = None) -> list[float]:
        import io

        import numpy as np
        import soundfile  # noqa: F401 - guarded by codec_available

        data, sr = soundfile.read(io.BytesIO(content), always_2d=True)
        mono = data.mean(axis=1)
        n = len(mono)
        if n == 0:
            return [float(sr), 0.0, 0.0, 0.0, 0.0]
        rms = float(np.sqrt(np.mean(mono * mono)))
        crossings = int(
            np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))
        )
        dur = n / sr
        return [float(sr), dur, rms, crossings / dur, float(np.abs(mono).max())]

    return soundfile_features
