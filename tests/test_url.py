"""URL canonicalization tests (functions/url.py — SURVEY.md §2.4
extension; pure Column expressions, zero shuffles)."""

from pyspark.sql import functions as F

from pandance_spark.functions.url import (
    normalize_url,
    registered_domain,
    url_host,
    url_parts,
)


def test_normalize_url_cases(spark):
    cases = [
        # case noise + default port + tracking + param order + fragment
        ("HTTP://WWW.Example.COM:80/Path/A?utm_source=x&b=2&a=1#frag",
         "http://www.example.com/Path/A?a=1&b=2"),
        ("https://Site.example.co.uk:443/", "https://site.example.co.uk/"),
        # non-default port survives
        ("https://host.com:8443/x?z=1", "https://host.com:8443/x?z=1"),
        # empty path -> '/'
        ("http://example.com", "http://example.com/"),
        # tracking-only query disappears entirely
        ("http://a.b.com/p?fbclid=abc", "http://a.b.com/p"),
        # path case is NOT folded (paths are case-sensitive)
        ("http://X.com/CaseSensitive", "http://x.com/CaseSensitive"),
    ]
    df = spark.createDataFrame([(u, e) for u, e in cases], "u string, exp string")
    for r in df.select(normalize_url(F.col("u")).alias("n"), "exp").collect():
        assert r["n"] == r["exp"], r


def test_normalize_url_is_dedup_key(spark):
    # the whole point: case/port/tracking/order variants of one
    # resource collapse to ONE key
    variants = [
        "http://Example.com/a?x=1&y=2",
        "HTTP://EXAMPLE.COM:80/a?y=2&x=1",
        "http://example.com/a?utm_medium=m&x=1&y=2#top",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "u string")
    keys = df.select(normalize_url(F.col("u")).alias("k")).distinct()
    assert keys.count() == 1


def test_url_host_and_registered_domain(spark):
    rows = [
        ("http://www.example.co.uk/x", "www.example.co.uk", "example.co.uk"),
        ("https://a.b.site.com:8080/", "a.b.site.com", "site.com"),
        ("http://localhost/", "localhost", "localhost"),
        ("http://example.com/", "example.com", "example.com"),
    ]
    df = spark.createDataFrame(rows, "u string, h string, d string")
    out = df.select(
        url_host(F.col("u")).alias("host"),
        registered_domain(url_host(F.col("u"))).alias("dom"),
        "h", "d",
    ).collect()
    for r in out:
        assert r["host"] == r["h"] and r["dom"] == r["d"], r


def test_url_parts_struct(spark):
    r = (
        spark.createDataFrame(
            [("HTTP://User@Host.COM:8080/p/x?q=1#f",)], "u string"
        )
        .select(url_parts(F.col("u")).alias("p"))
        .first()["p"]
    )
    assert r["scheme"] == "http"
    assert r["path"] == "/p/x" and r["query"] == "q=1" and r["fragment"] == "f"


def test_url_functions_no_shuffle(spark):
    # the canonicalization pass must fuse into the scan: no Exchange
    df = spark.range(100).select(
        F.concat(F.lit("http://h"), F.col("id"), F.lit(".com/p")).alias("u")
    )
    out = df.select(
        normalize_url(F.col("u")), registered_domain(url_host(F.col("u")))
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_url_host_userinfo_ipv6_trailing_dot(spark):
    # r6 review fixes: userinfo stripped, bracketed IPv6 kept whole,
    # trailing FQDN dot dropped, valueless trackers removed
    rows = [
        ("http://user:pw@Example.com:8080/p", "example.com", "8080"),
        ("http://[::1]:8080/p", "[::1]", "8080"),
        ("http://example.com./p", "example.com", ""),
    ]
    df = spark.createDataFrame(rows, "u string, h string, prt string")
    from pandance_spark.functions.url import url_parts as _parts

    for r in df.select(
        url_host(F.col("u")).alias("host"),
        _parts(F.col("u")).alias("p"),
        "h", "prt",
    ).collect():
        assert r["host"] == r["h"], r
        assert r["p"]["port"] == r["prt"], r


def test_normalize_url_valueless_tracker_and_userinfo(spark):
    cases = [
        ("http://a.com/p?gclid", "http://a.com/p"),
        ("http://a.com/p?gclid=x", "http://a.com/p"),
        ("http://u:p@a.com:80/p?b=1", "http://a.com/p?b=1"),
    ]
    df = spark.createDataFrame(cases, "u string, exp string")
    for r in df.select(normalize_url(F.col("u")).alias("n"), "exp").collect():
        assert r["n"] == r["exp"], r


def test_url_dedup_composition(spark):
    # normalize_url as dedup key + dedup_exact deterministic keeper:
    # variants that differ only in case/port/tracking collapse to one
    from pandance_spark.functions.url import normalize_url
    from pandance_spark.operators.dedup import dedup_exact

    rows = [
        (1, "HTTP://Example.COM:80/a?utm_source=x"),
        (2, "http://example.com/a#frag"),
        (3, "http://example.com/a"),
        (4, "http://example.com/b"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"]).withColumn(
        "url_norm", normalize_url(F.col("url"))
    )
    out = {r["url_norm"]: r["doc_id"]
           for r in dedup_exact(df, ["url_norm"], tie_breaker="doc_id").collect()}
    assert out == {"http://example.com/a": 1, "http://example.com/b": 4}


def test_host_suffixes(spark):
    from pandance_spark.functions.url import host_suffixes

    df = spark.createDataFrame(
        [("a.b.co.uk",), ("example.com",), ("localhost",), ("",)],
        "h string",
    )
    got = {r["h"]: r["s"] for r in df.select(
        "h", host_suffixes(F.col("h")).alias("s")).collect()}
    assert got["a.b.co.uk"] == ["a.b.co.uk", "b.co.uk", "co.uk", "uk"]
    assert got["example.com"] == ["example.com", "com"]
    assert got["localhost"] == ["localhost"]
    assert got[""] == []


def test_blocklist_filter_suffix_semantics(spark):
    from pandance_spark.functions.url import blocklist_filter

    df = spark.createDataFrame(
        [
            (1, "http://example.com/a"),        # exact match -> blocked
            (2, "https://a.b.example.com/x"),   # subdomain -> blocked
            (3, "http://notexample.com/y"),     # suffix of string, not of domain -> kept
            (4, "http://good.org/"),            # kept
            (5, "http://BAD.ORG:8080/z"),       # case + port -> blocked
            (6, "not a url"),                   # unparseable host -> kept
        ],
        "rid int, url string",
    )
    bl = spark.createDataFrame([("example.com",), ("bad.org",)], "domain string")
    kept = sorted(r["rid"] for r in blocklist_filter(df, "url", bl).collect())
    assert kept == [3, 4, 6]
    blocked = sorted(
        r["rid"]
        for r in blocklist_filter(df, "url", bl, keep_blocked=True).collect()
    )
    assert blocked == [1, 2, 5]


def test_blocklist_filter_broadcasts_blocklist(spark):
    from pandance_spark.functions.url import blocklist_filter

    df = spark.createDataFrame(
        [(i, f"http://h{i % 20}.site{i % 5}.com/p") for i in range(200)],
        "rid int, url string",
    )
    bl = spark.createDataFrame([("site0.com",), ("site3.com",)], "domain string")
    out = blocklist_filter(df, "url", bl)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == 120  # 2 of 5 site groups dropped


def test_href_targets_and_resolution(spark):
    from pandance_spark.functions.url import extract_links

    html = (
        '<a href="https://other.example/x">a</a>'
        "<A HREF='//cdn.example/c.js'>b</A>"
        '<a data-x="1" href="/abs.html">c</a>'
        '<a href="sub/rel.html">d</a>'
        '<a href="  spaced.html ">e</a>'
        '<a href="#frag">f</a>'
        '<a href="javascript:void(0)">g</a>'
        '<a href="mailto:x@y.z">h</a>'
        '<a href="">i</a>'
        "<a name='no-href'>j</a>"
    )
    df = spark.createDataFrame(
        [(1, html, "http://www.shop.brand.co.uk/dir/sub/page.html")],
        ["doc_id", "html", "page_url"],
    )
    rows = extract_links(df, "html", "page_url").collect()
    urls = [r["link_url"] for r in rows]
    assert urls == [
        "https://other.example/x",
        "http://cdn.example/c.js",
        "http://www.shop.brand.co.uk/abs.html",
        "http://www.shop.brand.co.uk/dir/sub/sub/rel.html",
        "http://www.shop.brand.co.uk/dir/sub/spaced.html",
    ]
    assert [r["link_idx"] for r in rows] == [0, 1, 2, 3, 4]
    assert [r["link_domain"] for r in rows] == [
        "other.example",
        "cdn.example",
        "brand.co.uk",
        "brand.co.uk",
        "brand.co.uk",
    ]


def test_resolve_href_root_base(spark):
    from pandance_spark.functions.url import extract_links

    # base with empty path: relative links resolve against '/'
    df = spark.createDataFrame(
        [(1, '<a href="r.html">r</a>', "http://host.example")],
        ["doc_id", "html", "page_url"],
    )
    rows = extract_links(df, "html", "page_url").collect()
    assert rows[0]["link_url"] == "http://host.example/r.html"


def _robots_fixture(spark):
    txt = (
        "# crawl policy\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /private/ok\n"
        "Disallow:\n"              # empty disallow dropped
        "\n"
        "User-agent: SpecialBot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: a-bot\n"
        "User-agent: b-bot\n"       # multi-agent group
        "Disallow: /shared\n"
    )
    return spark.createDataFrame(
        [("h.example", txt)], ["host", "robots"]
    )


def test_parse_robots_groups(spark):
    from pandance_spark.functions.url import parse_robots

    rules = {
        (r["agent"], r["rule"], r["path"])
        for r in parse_robots(
            _robots_fixture(spark), "robots", "host"
        ).collect()
    }
    assert rules == {
        ("*", "disallow", "/private"),
        ("*", "allow", "/private/ok"),
        ("specialbot", "disallow", "/"),
        ("a-bot", "disallow", "/shared"),
        ("b-bot", "disallow", "/shared"),
    }


def test_robots_filter_longest_match_and_precedence(spark):
    from pandance_spark.functions.url import parse_robots, robots_filter

    rules = parse_robots(_robots_fixture(spark), "robots", "host")
    urls = spark.createDataFrame(
        [
            (1, "http://h.example/private/x"),       # disallow /private
            (2, "http://h.example/private/ok/page"), # allow wins (longer)
            (3, "http://h.example/public"),          # no rule -> allowed
            (4, "http://h.example"),                 # empty path -> '/'
            (5, "http://other.example/private/x"),   # unknown host -> allowed
        ],
        ["doc_id", "url"],
    )
    out = {
        r["doc_id"]: r
        for r in robots_filter(urls, "url", rules, agent="*").collect()
    }
    assert not out[1]["allowed"] and out[1]["rule_path"] == "/private"
    assert out[2]["allowed"] and out[2]["rule_path"] == "/private/ok"
    assert out[3]["allowed"] and out[3]["rule_path"] is None
    assert out[4]["allowed"]
    assert out[5]["allowed"] and out[5]["rule_path"] is None
    # exact-agent group is exclusive: specialbot loses everything
    sp = {
        r["doc_id"]: r
        for r in robots_filter(
            urls, "url", rules, agent="specialbot"
        ).collect()
    }
    assert not sp[1]["allowed"] and sp[1]["rule_path"] == "/"
    assert not sp[3]["allowed"]
    # agent without its own group falls back to *
    fb = {
        r["doc_id"]: r
        for r in robots_filter(
            urls, "url", rules, agent="crawlbot"
        ).collect()
    }
    assert not fb[1]["allowed"] and fb[2]["allowed"] and fb[3]["allowed"]


def test_html_meta_and_sitemap_urls(spark):
    from pyspark.sql import functions as F

    from pandance_spark.functions.url import html_meta, sitemap_urls

    html = (
        "<html><head><TITLE>  My   Page \n Title </TITLE>"
        "<meta NAME='robots' content='NOINDEX, nofollow'>"
        '<link rel="canonical" href="http://c.example/x">'
        "<title>second ignored</title></head></html>"
    )
    sm = (
        "<sitemapindex><sitemap><loc> http://a.example/s?x=1&amp;y=2 "
        "</loc></sitemap><sitemap><loc>http://b.example/</loc>"
        "</sitemap></sitemapindex>"
    )
    df = spark.createDataFrame([(html, sm)], ["h", "s"])
    r = df.select(
        html_meta(F.col("h")).alias("m"),
        sitemap_urls(F.col("s")).alias("u"),
    ).collect()[0]
    assert r["m"]["title"] == "My Page Title"
    assert r["m"]["canonical"] == "http://c.example/x"
    assert r["m"]["noindex"] and r["m"]["nofollow"]
    assert r["u"] == ["http://a.example/s?x=1&y=2", "http://b.example/"]
    # absent tags degrade to ''/False/empty
    r2 = spark.createDataFrame([("<p>no head</p>", "<x/>")], ["h", "s"]) \
        .select(html_meta(F.col("h")).alias("m"),
                sitemap_urls(F.col("s")).alias("u")).collect()[0]
    assert r2["m"]["title"] == "" and r2["m"]["canonical"] == ""
    assert not r2["m"]["noindex"] and not r2["m"]["nofollow"]
    assert r2["u"] == []


def test_robots_wildcards_and_anchor(spark):
    """RFC 9309 wildcard grammar (r11): '*' matches any run, trailing
    '$' anchors, pattern length (incl. wildcards) drives precedence,
    and regex metachars inside rule paths stay literal."""
    from pandance_spark.functions.url import parse_robots, robots_filter

    robots = spark.createDataFrame(
        [
            (
                "ex.com",
                "User-agent: *\n"
                "Disallow: /*.pdf$\n"
                "Allow: /pub*\n"
                "Disallow: /private\n"
                "Disallow: /a+b\n",
            )
        ],
        "host string, text string",
    )
    rules = parse_robots(robots, "text", "host")
    urls = spark.createDataFrame(
        [
            (1, "https://ex.com/pub/x.html"),     # allow /pub*
            (2, "https://ex.com/docs/r.pdf"),     # *.pdf$ -> blocked
            (3, "https://ex.com/docs/r.pdfx"),    # $ anchor -> NOT pdf
            (4, "https://ex.com/pub/r.pdf"),      # /*.pdf$ (len 7) beats /pub* (len 5)
            (5, "https://ex.com/private/z"),      # plain prefix
            (6, "https://ex.com/a+b/c"),          # '+' literal
            (7, "https://ex.com/axb/c"),          # '+' must NOT be regex
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: (r["allowed"], r["rule_path"])
        for r in robots_filter(urls, "url", rules).collect()
    }
    assert got[1] == (True, "/pub*")
    assert got[2] == (False, "/*.pdf$")
    assert got[3][0] is True
    assert got[4] == (False, "/*.pdf$")
    assert got[5] == (False, "/private")
    assert got[6] == (False, "/a+b")
    assert got[7][0] is True
