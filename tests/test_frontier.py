"""Crawl-frontier operators (r14 wave 2): politeness scheduling,
largest-remainder budget apportionment, anchor-text aggregation, HTML
head metadata, sitemap discovery."""

from pyspark.sql import functions as F


def test_politeness_schedule_caps_and_sequences(spark):
    from parquet_on_fhir_spark.operators.frontier import politeness_schedule

    frontier = spark.createDataFrame(
        [("a", "u1", 5), ("a", "u2", 9), ("a", "u3", 9), ("a", "u4", 1),
         ("b", "v1", 0)],
        "host string, url string, priority int",
    )
    rows = {(r["host"], r["url"]): r for r in politeness_schedule(
        frontier, delay_ms=250, per_host_cap=3).collect()}
    # priority desc, url asc; u4 (lowest) cut by the cap
    assert rows[("a", "u2")]["slot"] == 1
    assert rows[("a", "u3")]["slot"] == 2
    assert rows[("a", "u1")]["slot"] == 3
    assert ("a", "u4") not in rows
    assert rows[("b", "v1")]["slot"] == 1
    assert rows[("a", "u1")]["eta_ms"] == 500  # (3-1)*250


def _hamilton(demands: dict, budget: int) -> dict:
    """Independent reference: python largest-remainder with the same
    tie rules (remainder desc, demand desc, host asc) and demand cap."""
    D = sum(demands.values())
    if D == 0:
        return {h: 0 for h in demands}
    exact = {h: budget * d / D for h, d in demands.items()}
    quota = {h: int(exact[h] // 1) for h in demands}
    leftover = budget - sum(quota.values())
    order = sorted(
        demands,
        key=lambda h: (-(exact[h] - quota[h]), -demands[h], h),
    )
    for h in order[:leftover]:
        quota[h] += 1
    return {h: min(demands[h], quota[h]) for h in demands}


def test_allocate_crawl_budget_matches_reference(spark):
    from parquet_on_fhir_spark.operators.frontier import (
        allocate_crawl_budget,
    )

    import random

    rng = random.Random(14)
    demands = {f"h{i:03d}": rng.randint(1, 500) for i in range(80)}
    df = spark.createDataFrame(
        list(demands.items()), "host string, n_urls long"
    )
    for budget in (0, 1, 97, 1000):
        got = {r["host"]: r["allocated"] for r in
               allocate_crawl_budget(df, budget).collect()}
        want = _hamilton(demands, budget)
        assert got == want, budget
        assert sum(got.values()) == min(budget, sum(demands.values()))
    # budget above total demand: everyone saturates at demand
    total = sum(demands.values())
    got = {r["host"]: r["allocated"] for r in
           allocate_crawl_budget(df, total + 500).collect()}
    assert got == demands


def test_allocate_crawl_budget_exact_proportions(spark):
    """No-remainder case: allocation is exactly proportional and no
    window pass runs at all (leftover == 0)."""
    from parquet_on_fhir_spark.operators.frontier import (
        allocate_crawl_budget,
    )

    df = spark.createDataFrame(
        [("a", 10), ("b", 30), ("c", 60)], "host string, n_urls long"
    )
    got = {r["host"]: r["allocated"] for r in
           allocate_crawl_budget(df, 10).collect()}
    assert got == {"a": 1, "b": 3, "c": 6}


def test_anchor_text_topk_counts_and_ties(spark):
    from parquet_on_fhir_spark.operators.frontier import anchor_text_topk

    links = spark.createDataFrame(
        [("d1", "best spark guide"), ("d1", "spark  guide"),
         ("d1", "SPARK"), ("d2", "zz aa")],
        "dst string, anchor string",
    )
    rows = [(r["dst"], r["term"], r["n"], r["rnk"]) for r in
            anchor_text_topk(links, k=2).orderBy("dst", "rnk").collect()]
    # d1: spark x3; guide x2; best x1 cut by k=2. d2: tie 1/1 -> term asc
    assert rows == [("d1", "spark", 3, 1), ("d1", "guide", 2, 2),
                    ("d2", "aa", 1, 1), ("d2", "zz", 1, 2)]


def test_html_metadata_nulls_and_extraction(spark):
    from parquet_on_fhir_spark.operators.html import html_metadata

    pages = spark.createDataFrame(
        [(1, '<html><head><TITLE>Mixed Case</TITLE>'
             '<meta property="og:title" content="OG"/>'
             '<meta name="description" content="D text"/>'
             '<link rel="canonical" href="https://c.ex/1"/></head></html>'),
         (2, "<html><body>headless</body></html>"),
         (3, '<head><title></title></head>')],  # empty title -> NULL
        "doc_id long, html string",
    )
    rows = {r["doc_id"]: r for r in html_metadata(pages).collect()}
    assert rows[1]["page_title"] == "Mixed Case"  # (?i) matched TITLE
    assert rows[1]["og_title"] == "OG"
    assert rows[1]["meta_description"] == "D text"
    assert rows[1]["canonical_url"] == "https://c.ex/1"
    assert all(rows[2][c] is None for c in
               ("page_title", "og_title", "meta_description",
                "canonical_url"))
    assert rows[3]["page_title"] is None


def test_sitemap_urls_order_and_case(spark):
    from parquet_on_fhir_spark.operators.robots import sitemap_urls

    robots = spark.createDataFrame(
        [("a.ex", "User-agent: *\nSitemap: https://a.ex/1.xml\n"
                  "  sitemap:https://a.ex/2.xml\nDisallow: /x\n"),
         ("b.ex", "User-agent: *\nDisallow: /\n"),
         ("c.ex", None)],
        "host string, robots_txt string",
    )
    rows = [(r["host"], r["seq"], r["sitemap_url"]) for r in
            sitemap_urls(robots).orderBy("host", "seq").collect()]
    assert rows == [("a.ex", 0, "https://a.ex/1.xml"),
                    ("a.ex", 1, "https://a.ex/2.xml")]


def test_crawl_delays_extraction(spark):
    """Crawl-delay extraction (r14 wave 7): first directive wins,
    fractional seconds, case/space tolerance, clamp at max, absent or
    malformed -> default (least() null-skip regression pinned)."""
    from parquet_on_fhir_spark.operators.robots import crawl_delays

    robots = spark.createDataFrame(
        [("a", "Crawl-delay: 2\nCrawl-delay: 9\n"),
         ("b", "  CRAWL-DELAY :  0.5  \n"),
         ("c", "Crawl-delay: 99999\n"),
         ("d", "User-agent: *\nDisallow:\n"),
         ("e", "Crawl-delay: nope\n"),
         ("f", None)],
        "host string, robots_txt string",
    )
    got = {r["host"]: r["delay_ms"]
           for r in crawl_delays(robots, default_ms=700).collect()}
    assert got == {"a": 2000, "b": 500, "c": 60000, "d": 700,
                   "e": 700, "f": 700}


def test_politeness_delay_column(spark):
    """Per-host delay column prices each host's ETA ladder."""
    from parquet_on_fhir_spark.operators.frontier import politeness_schedule

    f = spark.createDataFrame(
        [("a", "u1", 1, 100), ("a", "u2", 2, 100), ("b", "v1", 1, 7000)],
        "host string, url string, priority int, delay_ms long",
    )
    rows = {(r["host"], r["url"]): r["eta_ms"] for r in
            politeness_schedule(f, delay_ms_col="delay_ms").collect()}
    assert rows[("a", "u2")] == 0 and rows[("a", "u1")] == 100
    assert rows[("b", "v1")] == 0


def test_politeness_eta_no_int32_wrap(spark):
    """r14 advice: slot × delay must multiply in 64-bit — a scalar
    delay of 2e9 ms at slot 3 yields 4e9, past int32."""
    from parquet_on_fhir_spark.operators.frontier import politeness_schedule

    f = spark.createDataFrame(
        [("a", "u1", 3), ("a", "u2", 2), ("a", "u3", 1)],
        "host string, url string, priority int",
    )
    rows = {r["url"]: r["eta_ms"] for r in
            politeness_schedule(f, delay_ms=2_000_000_000).collect()}
    assert rows["u3"] == 4_000_000_000
    assert all(v >= 0 for v in rows.values())


def test_politeness_two_stage_cap_exact(spark):
    """r14 verdict task 6: the salted two-stage cap must return
    EXACTLY the single-stage result (slots, ETAs, membership) — the
    global top-cap is a subset of the union of per-salt top-caps."""
    import random

    from parquet_on_fhir_spark.operators.frontier import politeness_schedule

    rng = random.Random(15)
    data = [
        (f"h{i % 3}", f"u{rng.randrange(10**6):06d}x{i}", rng.randrange(50))
        for i in range(400)
    ]
    f = spark.createDataFrame(
        data, "host string, url string, priority int"
    ).repartition(8)
    for cap, salts in ((7, 16), (1, 4), (50, 8), (400, 16)):
        kw = dict(delay_ms=100, per_host_cap=cap)
        single = sorted(
            tuple(r)
            for r in politeness_schedule(f, cap_salts=1, **kw).collect()
        )
        salted = sorted(
            tuple(r)
            for r in politeness_schedule(f, cap_salts=salts, **kw).collect()
        )
        assert single == salted, (cap, salts)
    # cap 7: exactly 3 hosts x 7 survivors
    assert len(single) == 400  # cap 400 >= every host's size: all kept


def test_extract_page_links_semantics():
    """Link extraction core (r15): resolution, base-href, scheme
    drops, fragment strip, rel/nofollow, nested-anchor text, parser
    recovery (unterminated / implicitly-closed anchors), script
    content ignored."""
    from parquet_on_fhir_spark.operators.html import extract_page_links

    page = "https://h0.ex/dir/page.html"

    def one(html, **kw):
        return extract_page_links(html, page, **kw)

    assert one('<a href="https://EXT.ex/a?x=1#f" rel="external help">'
               "Read more</a>") == [
        {"seq": 0, "dst_url": "https://EXT.ex/a?x=1", "anchor": "Read more",
         "rel": "external help", "nofollow": False}]
    # relative + nested inline tags in the anchor
    assert one("<a href='sub/p.html'>More <b>info</b> now</a>")[0][
        "dst_url"] == "https://h0.ex/dir/sub/p.html"
    assert one("<a href='sub/p.html'>More <b>info</b> now</a>")[0][
        "anchor"] == "More info now"
    # base href wins, relative base resolves against the page first
    assert one('<base href="https://cdn.ex/b/"><a href="x.html">x</a>')[0][
        "dst_url"] == "https://cdn.ex/b/x.html"
    assert one('<base href="rel/"><a href="q.html">q</a>')[0][
        "dst_url"] == "https://h0.ex/dir/rel/q.html"
    # only the FIRST base is honored (HTML spec)
    assert one('<base href="https://a.ex/"><base href="https://b.ex/">'
               '<a href="p">p</a>')[0]["dst_url"] == "https://a.ex/p"
    # scheme drops, parent traversal, root-relative, seq order
    rows = one('<a href="/top">top</a><a href="mailto:a@b.c">m</a>'
               '<a href="javascript:void(0)">j</a><a href="../up.html">up</a>')
    assert [(r["seq"], r["dst_url"]) for r in rows] == [
        (0, "https://h0.ex/top"), (1, "https://h0.ex/up.html")]
    # rel normalization + case-insensitive nofollow token
    r = one('<a href="/p" rel="  NoFollow   UGC ">p</a>')[0]
    assert r["rel"] == "nofollow ugc" and r["nofollow"] is True
    # links inside <script> are not links; recovery cases
    assert [r["dst_url"] for r in one(
        "<script>var a='<a href=\"/fake\">x</a>'</script>"
        '<a href="/real">r</a>')] == ["https://h0.ex/real"]
    assert one('<a href="/unterminated">text')[0]["anchor"] == "text"
    assert [r["dst_url"] for r in one(
        '<a href="/one">f<a href="/two">s</a>')] == [
        "https://h0.ex/one", "https://h0.ex/two"]
    # no page URL: relative links drop (no scheme), absolute survive
    abs_only = extract_page_links(
        '<a href="/rel">r</a><a href="https://a.ex/x">a</a>', None)
    assert [r["dst_url"] for r in abs_only] == ["https://a.ex/x"]
    # href-less anchors emit nothing; empty href resolves to the page
    assert one("<a name='x'>no href</a>") == []
    assert one('<a href="">self</a>')[0]["dst_url"] == page


def test_extract_page_links_never_raises():
    """Hostile-input contract for the link extractor (same discipline
    as extract_main_text): seeded fuzz over random byte soup decoded
    as latin-1, plus pathological constructs."""
    import random

    from parquet_on_fhir_spark.operators.html import extract_page_links

    rng = random.Random(327)
    cases = ["", "<", "<a", "<a href", "<a href=", "<base", "<base href='",
             "<a href='http://[bad-v6'>x</a>",
             "<a href='https://h.ex/" + "%" * 50 + "'>p</a>"]
    for _ in range(150):
        cases.append(bytes(rng.randrange(256) for _ in
                           range(rng.randrange(300))).decode("latin-1"))
    for html in cases:
        for url in ("https://h.ex/p", None, ""):
            extract_page_links(html, url)  # must not raise


def test_extract_links_operator(spark):
    """Operator end-to-end: per-page rows with src passthrough, NULL
    html emits nothing, NULL url keeps absolute links only."""
    from parquet_on_fhir_spark.operators.html import extract_links

    pages = spark.createDataFrame(
        [(1, "https://h.ex/a/", '<a href="p.html">one</a>'
                               '<a href="https://b.ex/q" rel="nofollow">two</a>'),
         (2, None, '<a href="rel.html">r</a><a href="https://c.ex/z">c</a>'),
         (3, "https://h.ex/b", None)],
        "doc_id long, url string, html string",
    )
    rows = sorted(
        (r["doc_id"], r["seq"], r["dst_url"], r["nofollow"])
        for r in extract_links(pages).collect()
    )
    assert rows == [
        (1, 0, "https://h.ex/a/p.html", False),
        (1, 1, "https://b.ex/q", True),
        (2, 0, "https://c.ex/z", False),
    ]


def test_anchor_topk_on_extracted_links(spark):
    """r15 loop closure, anchor side: anchor_text_topk consumes
    ENGINE-produced edges from extract_links (dofollow only — the REP
    endorsement rule), not a synthetic frame: term counts aggregate
    across pages, nofollow anchors never contribute."""
    from parquet_on_fhir_spark.operators.frontier import anchor_text_topk
    from parquet_on_fhir_spark.operators.html import extract_links

    pages = spark.createDataFrame(
        [(1, "https://a.ex/1",
          '<a href="https://t.ex/page">Great Spark guide</a>'),
         (2, "https://a.ex/2",
          '<a href="https://t.ex/page">spark tutorial</a>'),
         (3, "https://a.ex/3",
          '<a href="https://t.ex/page" rel="nofollow">spam words</a>'
          '<a href="https://o.ex/x">other</a>')],
        "doc_id long, url string, html string",
    )
    links = extract_links(pages).filter(~F.col("nofollow"))
    rows = anchor_text_topk(
        links, k=2, dst_col="dst_url", anchor_col="anchor"
    ).collect()
    got = {(r["dst_url"], r["term"]): (r["n"], r["rnk"]) for r in rows}
    # 'spark' appears in two dofollow anchors -> top term; 'spam'
    # never appears (nofollow filtered before aggregation)
    assert got[("https://t.ex/page", "spark")] == (2, 1)
    assert ("https://t.ex/page", "spam") not in got
    assert got[("https://o.ex/x", "other")] == (1, 1)


def test_extract_links_hypothesis_differential():
    """Property sweep (r15): pages BUILT from random link specs must
    extract back exactly — dst = urljoin(effective base, href) with
    the fragment stripped, in document order, nofollow iff the rel
    tokens carry it; non-http(s) schemes never appear. The expected
    value is computed by an independent minimal reference (direct
    urljoin over the spec list), so this is a differential oracle
    over a much wider input space than the fixture templates."""
    from urllib.parse import urldefrag, urljoin

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from parquet_on_fhir_spark.operators.html import extract_page_links

    seg = st.text(
        alphabet="abcdefghij0123456789._-", min_size=1, max_size=8)
    rel_path = st.lists(seg, min_size=1, max_size=3).map("/".join)
    href = st.one_of(
        rel_path,                                      # relative
        rel_path.map(lambda p: "/" + p),               # root-relative
        rel_path.map(lambda p: "../" + p),             # parent
        rel_path.map(lambda p: f"https://ext.ex/{p}"),  # absolute
        rel_path.map(lambda p: f"https://ext.ex/{p}#frag"),
        st.just("javascript:void(0)"),                 # dropped
        st.just("mailto:a@b.c"),                       # dropped
    )
    link = st.tuples(href, seg, st.sampled_from(
        [None, "nofollow", "external", "nofollow ugc"]))
    base_href = st.sampled_from(
        [None, "https://cdn.ex/b/", "sub/", "/rooted/"])

    @settings(max_examples=120, deadline=None)
    @given(st.lists(link, max_size=6), base_href)
    def check(links, base):
        page_url = "https://h0.ex/dir/page.html"
        html = []
        if base is not None:
            html.append(f'<base href="{base}">')
        for h, anchor, rel in links:
            r = f' rel="{rel}"' if rel else ""
            html.append(f'<a href="{h}"{r}>{anchor}</a>')
        got = extract_page_links("".join(html), page_url)

        eff_base = urljoin(page_url, base) if base else page_url
        want = []
        for h, anchor, rel in links:
            dst = urldefrag(urljoin(eff_base, h))[0]
            if dst.split(":", 1)[0].lower() not in ("http", "https"):
                continue
            want.append((len(want), dst, anchor,
                         "nofollow" in (rel or "").split()))
        assert [
            (r["seq"], r["dst_url"], r["anchor"], r["nofollow"])
            for r in got
        ] == want

    check()


def test_extract_links_review_regressions():
    """r15 review fixes: hostile base never raises; self-closing <a/>
    opens an anchor (browser behavior); </a> inside a dropped region
    doesn't truncate the outer anchor; duplicate attributes are
    first-wins per the HTML parsing rules."""
    from parquet_on_fhir_spark.operators.html import extract_page_links

    page = "https://h.ex/p"
    # hostile base: degrade to the page URL, never raise
    r = extract_page_links('<base href="//[bad-v6"><a href="x.html">x</a>',
                           page)
    assert r[0]["dst_url"] == "https://h.ex/x.html"
    # XHTML-style self-closing anchor still captures the edge + text
    r = extract_page_links('<a href="/x"/>link text</a>', page)
    assert [(x["dst_url"], x["anchor"]) for x in r] == [
        ("https://h.ex/x", "link text")]
    # svg <a> inside an html anchor: no early finish, no extra edge
    r = extract_page_links(
        '<a href="/x">Hello <svg><a></a></svg> World</a>', page)
    assert [(x["dst_url"], x["anchor"]) for x in r] == [
        ("https://h.ex/x", "Hello World")]
    # duplicate href/rel: first occurrence wins
    r = extract_page_links('<a href="/good" href="/evil">x</a>', page)
    assert r[0]["dst_url"] == "https://h.ex/good"
    r = extract_page_links('<a href="/p" rel="nofollow" rel="">x</a>', page)
    assert r[0]["nofollow"] is True
