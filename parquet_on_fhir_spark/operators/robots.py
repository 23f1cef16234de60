"""robots.txt evaluation (RFC 9309) — crawl-compliance filtering.

A lawful crawl pipeline must drop URLs its robots.txt disallows for
the crawler's user-agent. This implements the RFC 9309 core:

- group selection: the group(s) whose ``User-agent`` line best matches
  the product token (exact case-insensitive match beats ``*``;
  multiple consecutive UA lines share one group),
- rule matching: ``Allow``/``Disallow`` path patterns with ``*``
  (any-sequence) and ``$`` (end anchor) wildcards,
- precedence: the LONGEST matching pattern wins; on a length tie,
  ``Allow`` wins; no matching rule ⇒ allowed; an empty ``Disallow:``
  value matches nothing,
- unknown directives and comments are ignored per spec.

Scale shape (r14 — replaces the r13 driver-side rule dict): a real
crawl's host set grows WITH the crawl (10⁷–10⁸ hosts), so nothing
about the robots frame may touch the driver. ``robots_rules`` parses
every host's robots.txt EXECUTOR-side (Arrow-batched ``mapInPandas``
over the robots frame) into exploded ``(host, seq, is_allow, pattern,
rx)`` rows; ``robots_filter`` folds them to one array-of-rules row per
host, equi-joins the URL side on host (Catalyst/AQE broadcasts the
rules side when it fits ``autoBroadcastJoinThreshold``, shuffle-joins
on host otherwise — ``distribute=`` forces either), and evaluates
longest-match precedence per URL with higher-order functions
(``filter``/``transform``/``array_max``) — pure Catalyst, zero Python
on the fact side, and when the rules side broadcasts the URL scan
never shuffles at all. Per-host rule arrays are bounded by robots.txt
itself (crawlers cap the fetch at ~500 KiB per RFC 9309 §2.5).
Deterministic by construction, so driver oracles are closed form.
"""

from __future__ import annotations

import functools
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_robots(text: str, user_agent: str = "*"):
    """robots.txt → ordered rule list [(is_allow, pattern)] for the
    best-matching user-agent group (RFC 9309 §2.2.1: exact
    case-insensitive token match preferred, else the ``*`` group;
    groups with the same UA merge)."""
    ua = user_agent.lower()
    groups: dict[str, list] = {}
    current_uas: list[str] = []
    last_was_ua = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, value = line.partition(":")
        if not _:
            continue
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not last_was_ua:
                current_uas = []
            current_uas.append(value.lower())
            for u in current_uas:
                groups.setdefault(u, [])
            last_was_ua = True
            continue
        last_was_ua = False
        if key in ("allow", "disallow") and current_uas:
            for u in current_uas:
                groups[u].append((key == "allow", value))
    if ua in groups:
        return groups[ua]
    return groups.get("*", [])


@functools.lru_cache(maxsize=4096)
def _compile(pattern: str):
    """RFC 9309 pattern → compiled regex: * = any sequence, a trailing
    $ anchors the end; otherwise prefix-match semantics (re.match)."""
    parts = pattern.split("*")
    anchored = parts[-1].endswith("$")
    if anchored:
        parts[-1] = parts[-1][:-1]
    rx = ".*".join(re.escape(p) for p in parts)
    return re.compile(rx + ("$" if anchored else ""))


def pattern_regex(pattern: str) -> str:
    """RFC 9309 pattern → an ANCHORED regex string valid in BOTH
    python and Java (``re.escape`` emits only backslash-escapes, which
    java.util.regex accepts): ``^`` + literal parts joined by ``.*``,
    plus ``$`` when the pattern ends with the end anchor. Used as the
    per-rule ``rx`` column so matching runs JVM-side via RLIKE."""
    parts = pattern.split("*")
    anchored = parts[-1].endswith("$")
    if anchored:
        parts[-1] = parts[-1][:-1]
    rx = "^" + ".*".join(re.escape(p) for p in parts)
    return rx + ("$" if anchored else "")


def _match_len(pattern: str, path: str):
    """Octet length of ``pattern`` when it matches ``path`` (the RFC
    9309 precedence key), else None. An empty pattern matches nothing
    (an empty Disallow allows everything). OCTETS, not characters
    (r14 advice): a multi-byte UTF-8 pattern outranks a
    shorter-in-bytes ASCII one even when the character counts tie the
    other way — ``len(pattern.encode())``, in lockstep with the
    ``octet_length`` fold in ``robots_filter``."""
    if not pattern:
        return None
    return (
        len(pattern.encode("utf-8"))
        if _compile(pattern).match(path)
        else None
    )


def robots_allowed(rules, path: str) -> bool:
    """RFC 9309 §2.2.2 precedence: longest match wins, Allow wins
    ties, no match ⇒ allowed. (Python twin of the Catalyst fold in
    ``robots_filter``; tests assert they agree.)"""
    best_len = -1
    best_allow = True
    for is_allow, pattern in rules:
        m = _match_len(pattern, path)
        if m is None:
            continue
        if m > best_len or (m == best_len and is_allow and not best_allow):
            best_len = m
            best_allow = is_allow
    return best_allow


_RULES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("is_allow", T.BooleanType()),
        T.StructField("pattern", T.StringType()),
        T.StructField("rx", T.StringType()),
    ]
)


def robots_rules(
    robots: DataFrame,
    *,
    user_agent: str = "*",
    host_col: str = "host",
    robots_text_col: str = "robots_txt",
) -> DataFrame:
    """Executor-side robots.txt parsing: one output row per
    ``(host, rule)`` for the best-matching user-agent group —
    ``(host, seq, is_allow, pattern, rx)``. Empty patterns (which
    match nothing per RFC 9309) are dropped here so the downstream
    fold never sees them. The robots frame streams through
    Arrow-batched ``mapInPandas``; the driver never sees a rule."""
    import pandas as pd

    ua = user_agent

    def batches(it):
        for pdf in it:
            hosts, seqs, allows, pats, rxs = [], [], [], [], []
            for host, text in zip(pdf[host_col], pdf[robots_text_col]):
                if not isinstance(text, str):
                    text = ""
                for i, (is_allow, pattern) in enumerate(
                    parse_robots(text, ua)
                ):
                    if not pattern:
                        continue
                    hosts.append(host)
                    seqs.append(i)
                    allows.append(is_allow)
                    pats.append(pattern)
                    rxs.append(pattern_regex(pattern))
            yield pd.DataFrame(
                {
                    "host": pd.Series(hosts, dtype="object"),
                    "seq": pd.Series(seqs, dtype="int32"),
                    "is_allow": pd.Series(allows, dtype="bool"),
                    "pattern": pd.Series(pats, dtype="object"),
                    "rx": pd.Series(rxs, dtype="object"),
                }
            )

    return robots.select(host_col, robots_text_col).mapInPandas(
        batches, schema=_RULES_SCHEMA
    )


def sitemap_urls(
    robots: DataFrame,
    *,
    host_col: str = "host",
    robots_text_col: str = "robots_txt",
) -> DataFrame:
    """Sitemap discovery (r14 wave 2): the ``Sitemap:`` lines of
    robots.txt (RFC 9309 §2.2.4 treats them as extension records; the
    sitemaps.org protocol defines them) are how a crawler finds a
    host's URL inventory without walking links. PURE Catalyst —
    case-insensitive ``regexp_extract_all`` + posexplode, a map-only
    projection over the robots frame; hosts with no Sitemap lines
    emit nothing. Output: (host, seq, sitemap_url) in declaration
    order."""
    urls = F.expr(
        f"regexp_extract_all({robots_text_col}, "
        "'(?im)^\\\\s*sitemap\\\\s*:\\\\s*(\\\\S+)', 1)"
    )
    return robots.select(
        F.col(host_col),
        F.posexplode(urls).alias("seq", "sitemap_url"),
    )


def crawl_delays(
    robots: DataFrame,
    *,
    host_col: str = "host",
    robots_text_col: str = "robots_txt",
    default_ms: int = 1000,
    max_ms: int = 60_000,
) -> DataFrame:
    """Per-host ``Crawl-delay`` extraction (r14 wave 7 — the de-facto
    extension Bing/Yandex honor; seconds, fractional allowed): the
    FIRST crawl-delay line wins, values clamp to ``max_ms`` (a site
    asking for a day per fetch is effectively opting out — cap and
    let budget allocation drop it), absent/NaN ⇒ ``default_ms``.
    PURE Catalyst regexp over the robots frame — map-only. Output:
    (host, delay_ms long)."""
    raw = F.regexp_extract(
        F.col(robots_text_col),
        r"(?im)^\s*crawl-delay\s*:\s*([0-9]+(?:\.[0-9]+)?)",
        1,
    )
    secs = F.when(raw != "", raw.cast("double"))
    # NOTE: least() SKIPS nulls in Spark (least(NULL, cap) = cap), so
    # the absent-directive default must branch BEFORE the clamp.
    ms = F.when(
        secs.isNotNull(), F.least(secs * 1000.0, F.lit(float(max_ms)))
    ).otherwise(F.lit(float(default_ms)))
    return robots.select(
        F.col(host_col), F.round(ms).cast("long").alias("delay_ms")
    )


def parse_sitemap(
    df: DataFrame,
    *,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Sitemap XML parsing (sitemaps.org protocol, r14 wave 4) — the
    step after :func:`sitemap_urls` discovery: a sitemap is either a
    ``<urlset>`` of page entries or a ``<sitemapindex>`` of child
    sitemaps; each entry carries ``<loc>`` and optionally
    ``<lastmod>``. PURE Catalyst: block split via
    ``regexp_extract_all`` (dotall), per-block field extraction via
    ``transform`` + ``regexp_extract`` — map-only, zero python per
    document, the schema is regular enough that a real XML parser
    buys nothing at corpus scale. Output: (host, kind ∈
    {urlset, index}, seq, loc, lastmod) in document order; entries
    without a <loc> are dropped (spec: loc is required)."""
    xml = F.col(xml_col)
    kind = F.when(xml.contains("<sitemapindex"), "index").otherwise(
        "urlset"
    )
    blocks = F.expr(
        f"regexp_extract_all({xml_col}, "
        "'(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>', 1)"
    )
    entries = F.transform(
        blocks,
        lambda b: F.struct(
            F.regexp_extract(b, r"(?s)<loc>\s*(.*?)\s*</loc>", 1).alias(
                "loc"
            ),
            F.regexp_extract(
                b, r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1
            ).alias("lastmod"),
        ),
    )
    out = df.select(
        F.col(host_col),
        kind.alias("kind"),
        F.posexplode(entries).alias("seq", "e"),
    ).filter(F.col("e.loc") != "")
    return out.select(
        host_col,
        "kind",
        "seq",
        F.col("e.loc").alias("loc"),
        F.when(F.col("e.lastmod") != "", F.col("e.lastmod")).alias(
            "lastmod"
        ),
    )


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    *,
    user_agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
    robots_text_col: str = "robots_txt",
    distribute: str = "auto",
) -> DataFrame:
    """Verdict per URL row: output = urls + (``allowed`` boolean).

    Plan shape: parse rules executor-side (``robots_rules``), fold to
    one ``array<struct(is_allow, pattern, rx)>`` row per host (the
    groupBy shuffles only the rules side), equi-join URLs on host, and
    evaluate RFC 9309 longest-match precedence in pure Catalyst:

        best = array_max(transform(
                   filter(rules, r -> path RLIKE r.rx),
                   r -> struct(octet_length(r.pattern), int(r.is_allow))))
        allowed = coalesce(best.a = 1, true)

    struct comparison is lexicographic, so the longest pattern wins and
    ``is_allow`` breaks length ties in Allow's favor — exactly
    ``robots_allowed``. Hosts with no robots.txt (left-join miss) and
    URLs matching no rule fold to NULL ⇒ allowed (RFC 9309 §2.3.1.2).

    ``distribute``: ``"auto"`` (default) leaves the join strategy to
    Catalyst/AQE — broadcast under ``autoBroadcastJoinThreshold``,
    shuffle otherwise; ``"broadcast"`` / ``"shuffle"`` force the hint
    for clusters that know their host-set size up front.
    """
    if distribute not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"robots_filter: bad distribute={distribute!r}")

    per_host = (
        robots_rules(
            robots,
            user_agent=user_agent,
            host_col=host_col,
            robots_text_col=robots_text_col,
        )
        .groupBy(F.col("host").alias("_rf_host"))
        .agg(
            F.collect_list(F.struct("is_allow", "pattern", "rx")).alias(
                "_rf_rules"
            )
        )
    )
    if distribute == "broadcast":
        per_host = F.broadcast(per_host)
    elif distribute == "shuffle":
        per_host = per_host.hint("SHUFFLE_HASH")

    u = urls.withColumn(
        "_rf_rest",
        F.expr(
            f"CASE WHEN instr({url_col}, '://') > 0 "
            f"THEN substring({url_col}, instr({url_col}, '://') + 3) "
            f"ELSE {url_col} END"
        ),
    ).withColumn(
        "_rf_path",
        F.expr(
            f"CASE WHEN instr({url_col}, '://') > 0 THEN "
            "  CASE WHEN instr(_rf_rest, '/') > 0 "
            "       THEN substring(_rf_rest, instr(_rf_rest, '/')) "
            "       ELSE '/' END "
            f"WHEN substring({url_col}, 1, 1) = '/' THEN {url_col} "
            "ELSE '/' END"
        ),
    )

    out = (
        u.join(per_host, F.col(host_col) == F.col("_rf_host"), "left")
        .withColumn(
            "_rf_best",
            F.expr(
                "array_max(transform("
                "  filter(_rf_rules, r -> _rf_path rlike r.rx),"
                "  r -> struct(octet_length(r.pattern) as l,"
                "              cast(r.is_allow as int) as a)))"
            ),
        )
        .withColumn(
            "allowed", F.coalesce(F.col("_rf_best.a") == 1, F.lit(True))
        )
        .drop("_rf_host", "_rf_rules", "_rf_rest", "_rf_path", "_rf_best")
    )
    return out
