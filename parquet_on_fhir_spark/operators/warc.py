"""WARC (Web ARChive, ISO 28500) record extraction — the container
every web crawl actually arrives in (Common Crawl publishes WARC/1.0).

A WARC file is a sequence of records: a textual header block
(``WARC/1.0`` version line + RFC 822-style named fields, CRLF line
endings, terminated by an empty line) followed by exactly
``Content-Length`` payload bytes and a blank-line record separator.
Crawl WARCs are usually *member-gzipped*: each record is its own gzip
member and members are concatenated — stdlib ``zlib`` inflates them
one ``decompressobj`` at a time (``unused_data`` hands the next
member's bytes over).

``warc_records`` splits a binary WARC column into one row per record
(type, target URI, date, payload length, an HTTP status for response
records, and a bounded payload prefix) inside Arrow-batched
``mapInPandas`` — the archive scan rides the corpus scan, one pass,
and TWO hard caps bound executor memory: gzip members inflate through
a chunked ``decompressobj`` loop with a running ``max_member_bytes``
cap (over-cap ⇒ quarantine row, the ``compressed_payload_audit`` bomb
guard applied at the member level), and per-record payloads store at
most ``max_payload_bytes``. ``build_warc`` writes
spec-shaped fixtures (plain or member-gzipped) so the driver oracle is
closed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CRLF = b"\r\n"


def _split_members(data: bytes, max_member_bytes: int = 64 * 1024 * 1024):
    """Yield decompressed gzip members from a concatenated-member
    stream, or the raw bytes when not gzipped. Inflation runs through
    a BOUNDED ``decompressobj`` loop (≤1 MiB per step, running total
    capped at ``max_member_bytes``) so a decompression-bomb member
    raises ValueError — routed to the quarantine row by
    ``warc_records`` — instead of allocating its full expansion
    (r13 advice: the old one-shot ``d.decompress(buf)`` materialized
    the bomb before any cap applied)."""
    import zlib

    if not (len(data) >= 2 and data[0] == 0x1F and data[1] == 0x8B):
        yield data
        return
    buf = data
    while buf[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + 15)
        out = bytearray()
        feed = buf
        try:
            while not d.eof:
                chunk = d.decompress(feed, 1 << 20)
                out += chunk
                if len(out) > max_member_bytes:
                    raise ValueError(
                        "warc: gzip member exceeds inflate cap"
                    )
                feed = d.unconsumed_tail
                if not chunk and not feed:
                    break  # input exhausted mid-member
        except zlib.error as e:
            raise ValueError(f"warc: corrupt gzip member ({e})") from e
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        yield bytes(out)
        buf = d.unused_data
    if buf.strip(b"\x00"):
        raise ValueError("warc: trailing non-gzip bytes after members")


def parse_warc(
    content: bytes,
    max_payload_bytes: int = 1 << 20,
    max_member_bytes: int = 64 * 1024 * 1024,
):
    """WARC bytes (plain or member-gzipped) → list of record dicts:
    {rec_type, target_uri, date, content_length, http_status,
    payload_prefix}. ``http_status`` is parsed from the HTTP status
    line of response records; ``payload_prefix`` is capped at
    ``max_payload_bytes`` (the rest of the record is SKIPPED by
    offset arithmetic, never materialized); gzip-member inflation is
    capped at ``max_member_bytes`` (bomb guard — over-cap members
    raise ValueError, the quarantine path)."""
    records = []
    for chunk in _split_members(bytes(content), max_member_bytes):
        pos = 0
        n = len(chunk)
        while pos < n:
            # skip inter-record blank lines
            while chunk[pos : pos + 2] == _CRLF:
                pos += 2
            if pos >= n:
                break
            end = chunk.find(_CRLF + _CRLF, pos)
            if end < 0:
                raise ValueError("warc: unterminated record header")
            header = chunk[pos : end].decode("utf-8", "replace")
            lines = header.split("\r\n")
            if not lines[0].startswith("WARC/"):
                raise ValueError(
                    f"warc: bad version line {lines[0][:30]!r}"
                )
            fields = {}
            for line in lines[1:]:
                k, _, v = line.partition(":")
                if _:
                    fields[k.strip().lower()] = v.strip()
            try:
                clen = int(fields["content-length"])
            except (KeyError, ValueError):
                raise ValueError("warc: missing/bad Content-Length")
            body_start = end + 4
            if body_start + clen > n:
                raise ValueError("warc: truncated record payload")
            prefix = chunk[body_start : body_start + min(
                clen, max_payload_bytes
            )]
            rec_type = fields.get("warc-type")
            status = None
            if rec_type == "response" and prefix[:5] == b"HTTP/":
                first = prefix.split(_CRLF, 1)[0].decode("ascii", "replace")
                parts = first.split(" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
            records.append({
                "rec_type": rec_type,
                "target_uri": fields.get("warc-target-uri"),
                "date": fields.get("warc-date"),
                "content_length": clen,
                "http_status": status,
                # revisit-record chain fields (ISO 28500 §6.7.2 / the
                # WARC 1.1 identical-payload-digest profile): a
                # recrawl writes a `revisit` record whose
                # Payload-Digest points at a prior capture instead of
                # re-storing the body — the crawl-native dedup signal
                "record_id": fields.get("warc-record-id"),
                "payload_digest": fields.get("warc-payload-digest"),
                "refers_to": fields.get("warc-refers-to"),
                "refers_to_uri": fields.get("warc-refers-to-target-uri"),
                "profile": fields.get("warc-profile"),
                "payload_prefix": bytes(prefix),
            })
            pos = body_start + clen
    return records


def build_warc(records, *, gzip_members: bool = False) -> bytes:
    """Spec-shaped WARC fixture writer: ``records`` is a list of
    (rec_type, target_uri, date, payload_bytes) optionally followed
    by a dict of extra WARC headers (WARC-Payload-Digest,
    WARC-Refers-To-Target-URI, ... — the revisit-chain fields).
    Response payloads should already carry their HTTP preamble. With
    ``gzip_members`` each record becomes its own gzip member (the
    Common Crawl layout)."""
    import gzip

    out = bytearray()
    for spec in records:
        rec_type, uri, date, payload = spec[:4]
        extra = spec[4] if len(spec) > 4 else {}
        head = [f"WARC/1.0"]
        head.append(f"WARC-Type: {rec_type}")
        if uri:
            head.append(f"WARC-Target-URI: {uri}")
        if date:
            head.append(f"WARC-Date: {date}")
        for k, v in extra.items():
            head.append(f"{k}: {v}")
        head.append(f"Content-Length: {len(payload)}")
        rec = ("\r\n".join(head) + "\r\n\r\n").encode() + bytes(payload) \
            + _CRLF + _CRLF
        if gzip_members:
            out += gzip.compress(rec, 6)
        else:
            out += rec
    return bytes(out)


def warc_records(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    max_payload_bytes: int = 1 << 20,
    max_member_bytes: int = 64 * 1024 * 1024,
    include_payload: bool = False,
) -> DataFrame:
    """Corpus-wide WARC splitting: one row per record. Output:
    (id, rec_idx, rec_type, target_uri, date, http_status,
    content_length, prefix_len, payload_digest, refers_to_uri,
    profile) plus a ``payload_prefix`` binary column when
    ``include_payload`` (the capped record body — what the charset /
    HTML stages of a crawl pipeline consume). The digest/refers
    columns carry the revisit-record chain (r15 — recrawl dedup;
    NULL on records without the headers). Undecodable archives —
    including gzip members whose inflation exceeds
    ``max_member_bytes`` (decompression bombs) — yield a single
    rec_idx = -1 row (the quarantine marker) instead of failing the
    batch."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = {k: [] for k in (
                "media_id", "rec_idx", "rec_type", "target_uri",
                "date", "http_status", "content_length", "prefix_len",
                "payload_digest", "refers_to_uri", "profile",
                "payload_prefix",
            )}

            def add(mid, idx, rec):
                rows["media_id"].append(mid)
                rows["rec_idx"].append(idx)
                rows["rec_type"].append(rec and rec["rec_type"])
                rows["target_uri"].append(rec and rec["target_uri"])
                rows["date"].append(rec and rec["date"])
                rows["http_status"].append(
                    rec["http_status"] if rec else None
                )
                rows["content_length"].append(
                    rec["content_length"] if rec else None
                )
                rows["prefix_len"].append(
                    len(rec["payload_prefix"]) if rec else None
                )
                rows["payload_digest"].append(
                    rec and rec["payload_digest"]
                )
                rows["refers_to_uri"].append(rec and rec["refers_to_uri"])
                rows["profile"].append(rec and rec["profile"])
                rows["payload_prefix"].append(
                    rec["payload_prefix"] if rec else None
                )

            for mid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    recs = parse_warc(
                        bytes(content), max_payload_bytes, max_member_bytes
                    )
                except ValueError:
                    add(mid, -1, None)
                    continue
                for i, rec in enumerate(recs):
                    add(mid, i, rec)
            out = {
                "media_id": pd.Series(rows["media_id"], dtype="int64"),
                "rec_idx": pd.Series(rows["rec_idx"], dtype="int32"),
                "rec_type": pd.Series(rows["rec_type"], dtype="object"),
                "target_uri": pd.Series(rows["target_uri"], dtype="object"),
                "date": pd.Series(rows["date"], dtype="object"),
                "http_status": pd.Series(rows["http_status"], dtype="Int32"),
                "content_length": pd.Series(rows["content_length"],
                                            dtype="Int64"),
                "prefix_len": pd.Series(rows["prefix_len"], dtype="Int64"),
                "payload_digest": pd.Series(rows["payload_digest"],
                                            dtype="object"),
                "refers_to_uri": pd.Series(rows["refers_to_uri"],
                                           dtype="object"),
                "profile": pd.Series(rows["profile"], dtype="object"),
            }
            if include_payload:
                out["payload_prefix"] = pd.Series(
                    rows["payload_prefix"], dtype="object"
                )
            yield pd.DataFrame(out)

    schema = (
        "media_id long, rec_idx int, rec_type string, "
        "target_uri string, date string, http_status int, "
        "content_length long, prefix_len long, payload_digest string, "
        "refers_to_uri string, profile string"
    )
    if include_payload:
        schema += ", payload_prefix binary"
    return df.select(
        F.col(id_col).alias(id_col), F.col(content_col).alias(content_col)
    ).mapInPandas(batches, schema=schema)


def revisit_resolve(
    records: DataFrame,
    *,
    distribute: str = "auto",
) -> DataFrame:
    """Cross-crawl revisit resolution (r14 verdict task 3 — the
    crawl-native incremental dedup): a recrawl emits ISO 28500
    ``revisit`` records whose ``WARC-Payload-Digest`` points at a
    prior capture instead of re-storing the body (the WARC 1.1
    identical-payload-digest profile; Common Crawl and every
    Heritrix-family crawler write these constantly). This resolves
    each revisit to its canonical original among the ``response``
    records sharing the digest.

    Input: a :func:`warc_records` frame (any number of archives).
    Output: one row per revisit — (media_id, rec_idx, revisit_uri,
    date, payload_digest, refers_to_uri, original_uri, original_date,
    original_length, original_found, bytes_saved). The canonical
    original per digest is the earliest capture — ``min_by`` on
    ``(date, target_uri)`` so ties are deterministic; ``bytes_saved``
    is that original's Content-Length (what the revisit avoided
    re-storing).

    Plan at 100 TB: ONE map-side-combined hash aggregate folds the
    response side to a digest dictionary (one row per distinct
    payload — orders of magnitude smaller than the archives), then an
    equi-join on digest onto the revisit rows. ``distribute="auto"``
    leaves broadcast-vs-shuffle to Catalyst/AQE; force ``broadcast``
    when the digest dictionary is known-small, ``shuffle`` for
    planet-scale dictionaries. The archive payloads never move."""
    if distribute not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"revisit_resolve: bad distribute={distribute!r}")

    originals = (
        records.filter(
            (F.col("rec_type") == "response")
            & F.col("payload_digest").isNotNull()
        )
        .groupBy(F.col("payload_digest").alias("_rv_digest"))
        .agg(
            F.min_by(
                F.struct(
                    F.col("target_uri").alias("original_uri"),
                    F.col("date").alias("original_date"),
                    F.col("content_length").alias("original_length"),
                ),
                F.struct(F.col("date"), F.col("target_uri")),
            ).alias("_rv_orig")
        )
    )
    if distribute == "broadcast":
        originals = F.broadcast(originals)
    elif distribute == "shuffle":
        originals = originals.hint("SHUFFLE_HASH")

    revisits = records.filter(F.col("rec_type") == "revisit")
    out = revisits.join(
        originals,
        F.col("payload_digest") == F.col("_rv_digest"),
        "left",
    )
    return out.select(
        "media_id",
        "rec_idx",
        F.col("target_uri").alias("revisit_uri"),
        "date",
        "payload_digest",
        "refers_to_uri",
        F.col("_rv_orig.original_uri").alias("original_uri"),
        F.col("_rv_orig.original_date").alias("original_date"),
        F.col("_rv_orig.original_length").alias("original_length"),
        F.col("_rv_orig").isNotNull().alias("original_found"),
        F.coalesce(F.col("_rv_orig.original_length"), F.lit(0)).alias(
            "bytes_saved"
        ),
    )
