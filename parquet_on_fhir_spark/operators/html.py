"""HTML main-content extraction — the crawl pipeline's first text op.

Raw crawled pages are mostly boilerplate (navigation, footers, cookie
banners, ad blocks); training corpora want the article. This module
implements the deterministic core of the jusText/trafilatura family:

1. tokenize with the stdlib ``html.parser`` (entity decoding included
   via ``convert_charrefs``, script/style/template/comment content
   dropped),
2. segment text into BLOCKS at block-level tag boundaries (p, div,
   li, headings, table cells, br, ...),
3. classify each block by the two classic signals — length and LINK
   DENSITY (characters inside <a> / total characters): navigation is
   short and link-heavy, content is long and link-light,
4. keep good blocks as the page's main text.

Pure python per payload inside Arrow-batched ``mapInPandas`` (the
codec-family shape: the 100 TB-relevant part is that the page scan
rides the corpus scan — one pass, no shuffle beyond the source read).
Thresholds are explicit arguments with documented defaults, so the
classification is a closed-form function of the page — which is what
lets the driver oracle pin it.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tags whose content never reaches the text stream
_DROP = {"script", "style", "noscript", "template", "svg", "head"}
#: tags that terminate/open a text block
_BLOCK = {
    "p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "td", "th", "tr", "table", "article", "section", "header", "footer",
    "nav", "aside", "blockquote", "pre", "br", "hr", "main", "figure",
    "figcaption", "form",
}


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []  # (text, link_chars, raw_len)
        self._buf: list[str] = []
        self._link_chars = 0
        self._drop_depth = 0
        self._a_depth = 0
        self._in_title = False
        self.title = ""

    def _flush(self):
        raw = "".join(self._buf)
        text = " ".join(raw.split())
        if text:
            # density numerator/denominator both on RAW char counts
            # (pre-normalization) so nested markup inside links can't
            # skew the ratio; the emitted block text is normalized
            self.blocks.append((text, self._link_chars, len(raw.strip())))
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP:
            self._drop_depth += 1
            return
        if tag == "title":
            self._in_title = True
            return
        if tag == "a":
            self._a_depth += 1
        if tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag == "title":
            self._in_title = False
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in _BLOCK:
            self._flush()

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK:
            self._flush()

    def handle_data(self, data):
        # title first: <title> legitimately sits inside <head>, which
        # is otherwise a dropped container
        if self._in_title:
            self.title += data
            return
        if self._drop_depth:
            return
        self._buf.append(data)
        if self._a_depth:
            self._link_chars += len(data)

    def close(self):
        super().close()
        self._flush()


def extract_main_text(
    html: str, *, min_block_chars: int = 25, max_link_density: float = 0.5
):
    """One page → (title, main_text, n_blocks, n_kept, link_density).

    A block is KEPT when its normalized text has at least
    ``min_block_chars`` characters AND its link density (raw linked
    chars / raw stripped chars) is at most ``max_link_density``.
    ``link_density`` in the result is the page-level ratio over ALL
    blocks (the nav-heaviness signal).
    """
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # malformed beyond the parser's recovery: salvage what was
        # already segmented
        p._flush()
    blocks = p.blocks
    kept = []
    total_chars = 0
    total_link = 0
    for text, link_chars, raw_len in blocks:
        n = max(raw_len, 1)
        total_chars += n
        total_link += min(link_chars, n)
        density = min(link_chars, n) / n
        if len(text) >= min_block_chars and density <= max_link_density:
            kept.append(text)
    page_density = (total_link / total_chars) if total_chars else 0.0
    title = " ".join(p.title.split())
    return {
        "title": title if title else None,
        "text": "\n".join(kept),
        "n_blocks": len(blocks),
        "n_kept": len(kept),
        "link_density": page_density,
    }


def html_extract(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    *,
    min_block_chars: int = 25,
    max_link_density: float = 0.5,
    passthrough: tuple = (),
) -> DataFrame:
    """Corpus-wide main-content extraction: one ``mapInPandas`` pass
    over the pages (Arrow batches; the scan is the only data touch).
    Output: (id, title, text, n_blocks, n_kept, link_density) plus
    any ``passthrough`` input columns copied row-wise (the join-free
    composition seam — see ``http_text``). NULL html degrades to
    empty extraction, never raises."""
    import pandas as pd
    import pyspark.sql.types as T

    def batches(it):
        for pdf in it:
            rows = {k: [] for k in (
                "doc_id", "title", "text", "n_blocks", "n_kept",
                "link_density",
            )}
            for did, html in zip(pdf[id_col], pdf[html_col]):
                info = extract_main_text(
                    html if isinstance(html, str) else
                    ("" if html is None else str(html)),
                    min_block_chars=min_block_chars,
                    max_link_density=max_link_density,
                )
                rows["doc_id"].append(did)
                rows["title"].append(info["title"])
                rows["text"].append(info["text"])
                rows["n_blocks"].append(info["n_blocks"])
                rows["n_kept"].append(info["n_kept"])
                rows["link_density"].append(info["link_density"])
            out = {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "title": pd.Series(rows["title"], dtype="object"),
                "text": pd.Series(rows["text"], dtype="object"),
                "n_blocks": pd.Series(rows["n_blocks"], dtype="int32"),
                "n_kept": pd.Series(rows["n_kept"], dtype="int32"),
                "link_density": pd.Series(rows["link_density"],
                                          dtype="float64"),
            }
            for c in passthrough:
                out[c] = pdf[c].reset_index(drop=True)
            yield pd.DataFrame(out)

    base = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("title", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("n_blocks", T.IntegerType()),
            T.StructField("n_kept", T.IntegerType()),
            T.StructField("link_density", T.DoubleType()),
        ]
    )
    for c in passthrough:
        base = base.add(df.schema[c])
    return df.select(
        F.col(id_col).alias(id_col), F.col(html_col).alias(html_col),
        *passthrough,
    ).mapInPandas(batches, schema=base)


class _LinkExtractor(HTMLParser):
    """``<a href>`` edge collector: (href, rel, anchor text) in
    document order, plus the first ``<base href>`` (HTML spec: only
    the first base element is honored). Anchor text accumulates
    across nested inline tags until the matching ``</a>``; a new
    ``<a>`` opening while one is open implicitly closes the previous
    (browser recovery behavior — the spec forbids nesting)."""

    _DROP_L = {"script", "style", "noscript", "template", "svg"}

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str | None, str]] = []
        self.base_href: str | None = None
        self._drop_depth = 0
        self._cur: tuple[str, str | None] | None = None  # (href, rel)
        self._buf: list[str] = []

    def _finish(self):
        if self._cur is not None:
            href, rel = self._cur
            anchor = " ".join("".join(self._buf).split())
            self.links.append((href, rel, anchor))
        self._cur = None
        self._buf = []

    @staticmethod
    def _first_wins(attrs):
        """HTML parsing rules: a DUPLICATE attribute is ignored — the
        FIRST occurrence wins (dict(attrs) would keep the last,
        letting '<a href=a href=evil>' point at evil)."""
        d = {}
        for k, v in attrs:
            d.setdefault(k, v)
        return d

    def handle_starttag(self, tag, attrs):
        if tag in self._DROP_L:
            self._drop_depth += 1
            return
        if tag == "base" and self.base_href is None and not self._drop_depth:
            d = self._first_wins(attrs)
            if d.get("href"):
                self.base_href = d["href"].strip()
            return
        if tag == "a" and not self._drop_depth:
            self._finish()
            d = self._first_wins(attrs)
            href = d.get("href")
            if href is not None:
                rel = d.get("rel")
                self._cur = (
                    href.strip(),
                    " ".join(rel.lower().split()) if rel else None,
                )

    def handle_endtag(self, tag):
        if tag in self._DROP_L:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        # an </a> inside a dropped region (an SVG <a>, say) must not
        # finish the OUTER html anchor and truncate its text
        if tag == "a" and not self._drop_depth:
            self._finish()

    def handle_startendtag(self, tag, attrs):
        # <a .../> on a NON-VOID element: browsers ignore the stray
        # slash and treat it as an open tag — so must we, or the edge
        # (and its following anchor text) is silently lost
        if tag in ("base", "a"):
            self.handle_starttag(tag, attrs)

    def handle_data(self, data):
        if self._cur is not None and not self._drop_depth:
            self._buf.append(data)

    def close(self):
        super().close()
        self._finish()


def extract_page_links(
    html: str,
    page_url: str | None,
    *,
    keep_schemes: tuple = ("http", "https"),
    strip_fragment: bool = True,
):
    """One page → ordered outlink rows ``(seq, dst_url, anchor, rel,
    nofollow)``. Relative hrefs resolve against the page URL, or the
    first ``<base href>`` when present (itself resolved against the
    page URL first, per the HTML spec); resolved URLs outside
    ``keep_schemes`` (javascript:, mailto:, data:, tel:, ...) are
    dropped; fragments are stripped (a crawl frontier fetches
    documents, not anchors). ``nofollow`` = the rel attribute carries
    the token (REP/Google semantics: the edge must not convey
    endorsement — frontier priority aggregation skips it, discovery
    may still use it). Never raises: malformed HTML degrades to
    whatever the parser salvaged."""
    from urllib.parse import urldefrag, urljoin, urlparse

    p = _LinkExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        p._finish()
    base = page_url or ""
    if p.base_href:
        try:
            base = urljoin(base, p.base_href)
        except ValueError:
            pass  # hostile base (bad IPv6 literal) — keep the page URL
    out = []
    seq = 0
    for href, rel, anchor in p.links:
        try:
            dst = urljoin(base, href)
            if strip_fragment:
                dst = urldefrag(dst)[0]
            scheme = urlparse(dst).scheme.lower()
        except ValueError:
            continue  # hostile href (bad IPv6 literal etc.) — skip
        if scheme not in keep_schemes or not dst:
            continue
        tokens = set((rel or "").split())
        out.append(
            {
                "seq": seq,
                "dst_url": dst,
                "anchor": anchor,
                "rel": rel,
                "nofollow": "nofollow" in tokens,
            }
        )
        seq += 1
    return out


def extract_links(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    url_col: str = "url",
    *,
    keep_schemes: tuple = ("http", "https"),
    strip_fragment: bool = True,
) -> DataFrame:
    """Corpus-wide outlink extraction — the edge that closes the crawl
    loop (fetched page → outlinks → frontier; r14 verdict task 1):
    one ``mapInPandas`` pass over the pages emits one row per kept
    ``<a href>`` edge, with relative resolution against ``url_col``
    (+ first ``<base href>``). Output: (id, src_url, seq, dst_url,
    anchor, rel, nofollow). The per-page work is bounded by page size
    (stdlib parser, no backtracking regex); the 100 TB-relevant shape
    is that link extraction rides the SAME scan as main-text
    extraction (``html_extract``) and metadata — no shuffle, no join;
    downstream frontier ops aggregate (dst) however they need.
    NULL html ⇒ no rows; NULL url keeps only absolute hrefs."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            ids, srcs, seqs, dsts, anchors, rels, nofos = (
                [], [], [], [], [], [], []
            )
            for did, src, html in zip(
                pdf[id_col], pdf[url_col], pdf[html_col]
            ):
                if not isinstance(html, str):
                    continue
                for r in extract_page_links(
                    html,
                    src if isinstance(src, str) else None,
                    keep_schemes=keep_schemes,
                    strip_fragment=strip_fragment,
                ):
                    ids.append(did)
                    srcs.append(src)
                    seqs.append(r["seq"])
                    dsts.append(r["dst_url"])
                    anchors.append(r["anchor"])
                    rels.append(r["rel"])
                    nofos.append(r["nofollow"])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "src_url": pd.Series(srcs, dtype="object"),
                    "seq": pd.Series(seqs, dtype="int32"),
                    "dst_url": pd.Series(dsts, dtype="object"),
                    "anchor": pd.Series(anchors, dtype="object"),
                    "rel": pd.Series(rels, dtype="object"),
                    "nofollow": pd.Series(nofos, dtype="bool"),
                }
            )

    return df.select(
        F.col(id_col).alias(id_col),
        F.col(url_col).alias(url_col),
        F.col(html_col).alias(html_col),
    ).mapInPandas(
        batches,
        schema=(
            "doc_id long, src_url string, seq int, dst_url string, "
            "anchor string, rel string, nofollow boolean"
        ),
    )


def html_metadata(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Page-metadata extraction (r14 wave 2) — the head fields a crawl
    index keeps per page: <title>, Open Graph title (og:title),
    meta description, rel=canonical link. PURE Catalyst
    (case-insensitive regexp_extract, a map-only projection riding
    the scan — no python per page); empty match ⇒ NULL. Attribute
    order follows the overwhelmingly dominant emitted form
    (property/name/rel before content/href); pages that reorder fall
    back to NULL rather than misparse — an audit count, not a loss,
    at corpus scale. Output: input + (page_title, og_title,
    meta_description, canonical_url)."""
    h = F.col(html_col)

    def rx(pattern: str):
        v = F.regexp_extract(h, pattern, 1)
        return F.when(v != "", v)

    return (
        df.withColumn("page_title", rx(r"(?is)<title[^>]*>([^<]*)</title>"))
        .withColumn(
            "og_title",
            rx(
                r"(?is)<meta[^>]*property\s*=\s*[\"']og:title[\"']"
                r"[^>]*content\s*=\s*[\"']([^\"']*)[\"']"
            ),
        )
        .withColumn(
            "meta_description",
            rx(
                r"(?is)<meta[^>]*name\s*=\s*[\"']description[\"']"
                r"[^>]*content\s*=\s*[\"']([^\"']*)[\"']"
            ),
        )
        .withColumn(
            "canonical_url",
            rx(
                r"(?is)<link[^>]*rel\s*=\s*[\"']canonical[\"']"
                r"[^>]*href\s*=\s*[\"']([^\"']*)[\"']"
            ),
        )
    )
