"""Multimodal column plumbing (SURVEY.md §2B Q73).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct, per the format spec's base64Binary mapping
(/root/reference/README.md:63 — base64Binary → parquet binary).

The Spark-side plumbing (schema, partitioning, Arrow batch shape,
mapInPandas signatures) is real and tested; the actual codec work is
STUBBED — image/audio libraries are not in this container — behind
``decode_stub``, a deterministic fake that derives "features" from the
bytes, and ``decode_real`` which raises ``NotImplementedError``
documenting where a real codec plugs in.
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
    """``decode_real`` when a codec library is importable, else the
    deterministic stand-in — lets pipelines opt into the best available
    decode without caring about the environment."""
    return decode_real if codec_available("image") else stand_in_features


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
