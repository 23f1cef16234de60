"""Charset sniffing + decoding — the bytes→text seam of a crawl
pipeline (r13 verdict task 4).

Real WARC payloads are BYTES in whatever encoding each server chose;
every text stage downstream (HTML extraction, quality, dedup) wants
unicode. This implements the deterministic core of WHATWG-style
encoding sniffing with the standard precedence ladder:

1. **BOM** — UTF-8 / UTF-16 LE/BE / UTF-32 LE/BE byte-order marks win
   over everything (a BOM is the content declaring itself),
2. **transport** — the ``charset=`` parameter of the HTTP
   ``Content-Type`` header, when the label names a known codec,
3. **meta prescan** — an ASCII scan of the first ``prescan_bytes``
   (default 1024, the WHATWG prescan window) for
   ``<meta charset=…>`` / ``<meta http-equiv … content="…charset=…">``,
4. **UTF-8 validation** — strict-decode a bounded probe window; valid
   UTF-8 is self-synchronizing, so a clean probe is near-certain
   UTF-8 (ASCII is its subset),
5. **windows-1252 fallback** — the WHATWG default for unlabeled
   legacy bytes (a superset of ISO-8859-1 in the printable range).

``decode_text`` (raw payloads) and ``http_text`` (HTTP response
payloads: status line + headers + body, as stored by WARC response
records) run sniff + decode in ONE Arrow-batched ``mapInPandas`` pass
per corpus scan — per-payload python cost like the codec family, no
shuffle beyond the source read, deterministic so driver oracles are
closed form. Decode uses ``errors="replace"`` — hostile bytes yield
U+FFFD, never an executor-killing exception.
"""

from __future__ import annotations

import codecs
import re

from pyspark.sql import DataFrame

#: common label aliases → python codec names (public IANA/WHATWG labels)
_ALIASES = {
    "utf8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    "latin1": "iso-8859-1",
    "latin-1": "iso-8859-1",
    "iso8859-1": "iso-8859-1",
    "iso_8859-1": "iso-8859-1",
    "l1": "iso-8859-1",
    "cp1252": "windows-1252",
    "windows1252": "windows-1252",
    "x-cp1252": "windows-1252",
    "us-ascii": "ascii",
    "utf16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "gb2312": "gbk",
}

_CHARSET_PARAM_RX = re.compile(r"charset\s*=\s*\"?'?([A-Za-z0-9._:\-]+)", re.I)
_META_RX = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([A-Za-z0-9._:\-]+)", re.I
)


def normalize_charset(label) -> str | None:
    """IANA/WHATWG-ish label → python codec name, or None when the
    label doesn't resolve to a known codec (callers fall through to
    the next precedence tier)."""
    if not label or not isinstance(label, str):
        return None
    lab = label.strip().strip("\"'").lower()
    lab = _ALIASES.get(lab, lab)
    try:
        codecs.lookup(lab)
    except LookupError:
        return None
    return lab


def sniff_charset(
    payload: bytes,
    content_type: str | None = None,
    *,
    prescan_bytes: int = 1024,
    probe_bytes: int = 65536,
):
    """(charset, source) per the module-docstring precedence ladder;
    source ∈ {bom, http, meta, heuristic, fallback}."""
    b = bytes(payload)
    if b[:3] == b"\xef\xbb\xbf":
        return "utf-8", "bom"
    if b[:4] == b"\xff\xfe\x00\x00":
        return "utf-32-le", "bom"
    if b[:4] == b"\x00\x00\xfe\xff":
        return "utf-32-be", "bom"
    if b[:2] == b"\xff\xfe":
        return "utf-16-le", "bom"
    if b[:2] == b"\xfe\xff":
        return "utf-16-be", "bom"
    if content_type:
        m = _CHARSET_PARAM_RX.search(content_type)
        if m:
            cs = normalize_charset(m.group(1))
            if cs:
                return cs, "http"
    m = _META_RX.search(b[:prescan_bytes])
    if m:
        cs = normalize_charset(m.group(1).decode("ascii", "replace"))
        # a BOM-less page whose ASCII-readable meta claims UTF-16 is
        # lying (we just read its meta as ASCII) — WHATWG maps those
        # labels to UTF-8.
        if cs in ("utf-16", "utf-16-le", "utf-16-be"):
            cs = "utf-8"
        if cs:
            return cs, "meta"
    probe = b[:probe_bytes]
    try:
        probe.decode("utf-8", "strict")
        return "utf-8", "heuristic"
    except UnicodeDecodeError as e:
        # tolerate only a multibyte sequence cut by the probe window
        if len(b) > probe_bytes and e.start >= probe_bytes - 4:
            return "utf-8", "heuristic"
    return "windows-1252", "fallback"


def decode_payload(payload: bytes, charset: str, source: str) -> str:
    """Decode with the sniffed charset, stripping the BOM the sniff
    consumed (utf-8-sig handles its own; UTF-16/32 LE/BE codecs do
    not). ``errors="replace"`` — hostile bytes become U+FFFD."""
    b = bytes(payload)
    if source == "bom":
        if charset == "utf-8":
            return b.decode("utf-8-sig", "replace")
        if charset in ("utf-16-le", "utf-16-be"):
            b = b[2:]
        elif charset in ("utf-32-le", "utf-32-be"):
            b = b[4:]
    return b.decode(charset, "replace")


def decode_text(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    content_type_col: str | None = None,
    *,
    prescan_bytes: int = 1024,
    probe_bytes: int = 65536,
) -> DataFrame:
    """Corpus-wide bytes→text: sniff + decode in one ``mapInPandas``
    pass. Output: (id, charset, charset_source, text). Pass
    ``content_type_col`` when a transport Content-Type rides the frame
    (tier-2 precedence); NULL payload ⇒ NULL row values."""
    import pandas as pd

    cols = [id_col, content_col] + (
        [content_type_col] if content_type_col else []
    )

    def batches(it):
        for pdf in it:
            ids, css, srcs, texts = [], [], [], []
            cts = (
                pdf[content_type_col]
                if content_type_col
                else [None] * len(pdf)
            )
            for mid, content, ct in zip(pdf[id_col], pdf[content_col], cts):
                ids.append(mid)
                if content is None:
                    css.append(None)
                    srcs.append(None)
                    texts.append(None)
                    continue
                ct = ct if isinstance(ct, str) else None
                cs, src = sniff_charset(
                    content,
                    ct,
                    prescan_bytes=prescan_bytes,
                    probe_bytes=probe_bytes,
                )
                css.append(cs)
                srcs.append(src)
                texts.append(decode_payload(content, cs, src))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "charset": pd.Series(css, dtype="object"),
                    "charset_source": pd.Series(srcs, dtype="object"),
                    "text": pd.Series(texts, dtype="object"),
                }
            )

    return df.select(*cols).mapInPandas(
        batches,
        schema=(
            "media_id long, charset string, charset_source string, "
            "text string"
        ),
    )


_CRLF2 = b"\r\n\r\n"


def parse_http_response(payload: bytes):
    """HTTP response bytes (status line + headers + body, the WARC
    response record payload) → (status, headers_dict_lowercased,
    body_bytes). Non-HTTP payloads return (None, {}, payload)."""
    b = bytes(payload)
    if b[:5] != b"HTTP/":
        return None, {}, b
    end = b.find(_CRLF2)
    if end < 0:
        head, body = b, b""
    else:
        head, body = b[:end], b[end + 4 :]
    lines = head.decode("latin-1").split("\r\n")
    status = None
    parts = lines[0].split(" ")
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    headers = {}
    for line in lines[1:]:
        k, sep, v = line.partition(":")
        if sep:
            headers[k.strip().lower()] = v.strip()
    return status, headers, body


def http_text(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload_prefix",
    *,
    prescan_bytes: int = 1024,
    probe_bytes: int = 65536,
    passthrough: tuple = (),
) -> DataFrame:
    """WARC-response payload → decoded page text in ONE pass: split the
    HTTP preamble, read the transport Content-Type, sniff the body's
    charset (BOM > header > meta > UTF-8 probe > 1252), decode. Output:
    (id, http_status, content_type, charset, charset_source, text)
    plus any ``passthrough`` input columns copied row-wise — the
    join-free composition seam (a STREAMING pipeline can't self-join
    its stages without watermark state; carrying columns through the
    pandas batch costs nothing and keeps the chain linear)."""
    import pandas as pd
    import pyspark.sql.types as T

    def batches(it):
        for pdf in it:
            ids, stats, cts, css, srcs, texts = [], [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(mid)
                if payload is None:
                    stats.append(None)
                    cts.append(None)
                    css.append(None)
                    srcs.append(None)
                    texts.append(None)
                    continue
                status, headers, body = parse_http_response(payload)
                ct = headers.get("content-type")
                cs, src = sniff_charset(
                    body,
                    ct,
                    prescan_bytes=prescan_bytes,
                    probe_bytes=probe_bytes,
                )
                stats.append(status)
                cts.append(ct)
                css.append(cs)
                srcs.append(src)
                texts.append(decode_payload(body, cs, src))
            out = {
                "media_id": pd.Series(ids, dtype="int64"),
                "http_status": pd.Series(stats, dtype="Int32"),
                "content_type": pd.Series(cts, dtype="object"),
                "charset": pd.Series(css, dtype="object"),
                "charset_source": pd.Series(srcs, dtype="object"),
                "text": pd.Series(texts, dtype="object"),
            }
            for c in passthrough:
                out[c] = pdf[c].reset_index(drop=True)
            yield pd.DataFrame(out)

    base = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("http_status", T.IntegerType()),
            T.StructField("content_type", T.StringType()),
            T.StructField("charset", T.StringType()),
            T.StructField("charset_source", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    for c in passthrough:
        base = base.add(df.schema[c])
    return df.select(id_col, payload_col, *passthrough).mapInPandas(
        batches, schema=base
    )


def fix_mojibake_text(s: str, max_passes: int = 2):
    """Repair the classic mojibake class: UTF-8 bytes that were
    mis-decoded as windows-1252/latin-1 somewhere upstream ("café" →
    "cafÃ©"). The reversal is exact when it applies: re-encode with
    cp1252 (latin-1 for the five cp1252 holes), strict-decode as
    UTF-8 — if the round trip succeeds AND shortens the string (real
    mojibake always does: multibyte sequences collapse), accept it.
    Up to ``max_passes`` rounds unwind double-encoding. Pure function
    of the input — deterministic, oracle-friendly.

    Returns (fixed_text, n_passes_applied)."""
    cur = s
    passes = 0
    for _ in range(max_passes):
        try:
            raw = cur.encode("cp1252")
        except UnicodeEncodeError:
            try:
                raw = cur.encode("latin-1")
            except UnicodeEncodeError:
                break
        try:
            dec = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        if dec == cur or len(dec) >= len(cur):
            break
        cur = dec
        passes += 1
    return cur, passes


def fix_mojibake(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_passes: int = 2,
):
    """Corpus-wide mojibake repair in one Arrow-batched mapInPandas
    pass (the ftfy-core case a crawl hits constantly: a page served
    as UTF-8, transcoded as if it were 1252 by some middlebox).
    Output: (id, text, fixed, n_passes) — ``text`` is the repaired
    string, ``fixed`` flags rows that changed."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            ids, texts, fixed, np_ = [], [], [], []
            for did, s in zip(pdf[id_col], pdf[text_col]):
                ids.append(did)
                if not isinstance(s, str):
                    texts.append(None)
                    fixed.append(None)
                    np_.append(None)
                    continue
                out, passes = fix_mojibake_text(s, max_passes)
                texts.append(out)
                fixed.append(passes > 0)
                np_.append(passes)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "text": pd.Series(texts, dtype="object"),
                    "fixed": pd.Series(fixed, dtype="object"),
                    "n_passes": pd.Series(np_, dtype="Int32"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        batches,
        schema="doc_id long, text string, fixed boolean, n_passes int",
    )
