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

``robots_filter`` evaluates a URL frame against a small per-host rules
frame: rules are PARSED once (python, host-count-sized), broadcast,
and each URL's verdict is computed in one ``mapInPandas`` pass over
the URL side — the fact table scans once, the rules ride the closure,
the 100 TB shape. Deterministic by construction, so driver oracles
are closed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


import functools
import re


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


def _match_len(pattern: str, path: str):
    """Octet length of ``pattern`` when it matches ``path`` (the RFC
    9309 precedence key), else None. An empty pattern matches nothing
    (an empty Disallow allows everything)."""
    if not pattern:
        return None
    return len(pattern) if _compile(pattern).match(path) else None


def robots_allowed(rules, path: str) -> bool:
    """RFC 9309 §2.2.2 precedence: longest match wins, Allow wins
    ties, no match ⇒ allowed."""
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


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    *,
    user_agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
    robots_text_col: str = "robots_txt",
) -> DataFrame:
    """Verdict per URL row: parse each host's robots.txt ONCE
    (driver-side; the robots frame is host-count-sized by contract,
    like terminology metadata), broadcast the parsed rules inside the
    mapInPandas closure, and evaluate every URL in one pass over the
    fact side. Output: urls + (allowed boolean). Hosts with no
    robots.txt allow everything (RFC 9309 §2.3.1.2)."""
    import pandas as pd

    rule_map = {
        r[0]: parse_robots(r[1] or "", user_agent)
        for r in robots.select(host_col, robots_text_col).collect()
    }

    def batches(it):
        for pdf in it:
            verdicts = []
            for host, url in zip(pdf[host_col], pdf[url_col]):
                rules = rule_map.get(host, [])
                # path = everything from the first '/' after authority
                path = "/"
                if "://" in url:
                    rest = url.split("://", 1)[1]
                    i = rest.find("/")
                    path = rest[i:] if i >= 0 else "/"
                elif url.startswith("/"):
                    path = url
                verdicts.append(robots_allowed(rules, path))
            out = pdf.copy()
            out["allowed"] = pd.Series(verdicts, dtype="bool")
            yield out

    schema = urls.schema.simpleString()[7:-1] + ", allowed boolean"
    return urls.mapInPandas(batches, schema=schema)
