"""URL handling for crawl corpora — pure Column expressions (JVM-side,
whole-stage-codegen; no UDF anywhere), the normalization pass that runs
BEFORE URL-keyed dedup and per-domain caps on a 100 TB crawl.

Engine extension beyond the reference (SURVEY.md §2.4).  Design notes:

- everything is regexp/array built-ins over the RFC 3986 split regex,
  so the pass fuses into the scan (zero shuffles, parquet-prunable);
- :func:`normalize_url` canonicalizes the variants that fragment a
  crawl's URL keyspace without changing the resource: case of
  scheme/host, default ports, fragment, tracking parameters
  (``utm_*``/``gclid``/``fbclid``/...), and query-parameter order.
  Inputs are expected to be absolute ``http(s)`` URLs (what a WARC
  ``WARC-Target-URI`` carries); anything else is normalized
  best-effort, never an error;
- :func:`registered_domain` uses the classic last-two-labels
  heuristic plus a small built-in table of common two-level public
  suffixes (``co.uk``/``com.au``/...).  It is an APPROXIMATION of the
  Public Suffix List — good enough for per-domain capping/stats;
  swap in a broadcast PSL table for exactness if the corpus needs it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "url_parts",
    "url_host",
    "normalize_url",
    "registered_domain",
    "host_suffixes",
    "blocklist_filter",
    "href_targets",
    "resolve_href",
    "extract_links",
    "parse_robots",
    "robots_filter",
    "html_meta",
    "sitemap_urls",
]

# RFC 3986 appendix-B split regex (scheme, authority, path, query, frag)
_URL_RE = r"^(?:([^:/?#]+):)?(?:\/\/([^\/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?"
# host inside an authority AFTER userinfo strip: a bracketed IPv6
# literal or everything up to the port colon; trailing FQDN dot
# normalized away
_HOST_RE = r"^(\[[^\]]*\]|[^:]*)"
_PORT_RE = r":(\d+)$"

# common second-level public suffixes (approximation of the PSL)
_TWO_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "co.za", "com.tr", "com.ar", "com.sg", "co.nz", "com.hk",
    "com.tw",
]

# query parameters that track the click, not the resource — with or
# without a value ('?gclid' must normalize identically to '?gclid=x')
_TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|igshid|ref_src)(=|$)"


def _part(col: Column, i: int) -> Column:
    return F.regexp_extract(col, _URL_RE, i)


def _host_part(auth: Column) -> Column:
    """Host from an authority: strip userinfo, keep bracketed IPv6
    literals whole, drop the port and any trailing FQDN dot."""
    bare = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.regexp_replace(
        F.regexp_extract(bare, _HOST_RE, 1), r"\.$", ""
    )


def _port_part(auth: Column) -> Column:
    return F.regexp_extract(
        F.regexp_replace(auth, r"^[^@]*@", ""), _PORT_RE, 1
    )


def url_parts(col: Column) -> Column:
    """``struct(scheme, host, port, path, query, fragment)`` — scheme
    and host lowercased (userinfo and any trailing FQDN dot dropped
    from the host; bracketed IPv6 literals kept whole), everything
    else verbatim."""
    auth = _part(col, 2)
    return F.struct(
        F.lower(_part(col, 1)).alias("scheme"),
        F.lower(_host_part(auth)).alias("host"),
        _port_part(auth).alias("port"),
        _part(col, 3).alias("path"),
        _part(col, 4).alias("query"),
        _part(col, 5).alias("fragment"),
    )


def url_host(col: Column) -> Column:
    """Lowercased host without userinfo, port, or trailing dot."""
    return F.lower(_host_part(_part(col, 2)))


def normalize_url(col: Column) -> Column:
    """Canonical form: lowercase scheme+host, default ports (80/http,
    443/https) stripped, fragment dropped, tracking parameters
    removed, remaining query parameters sorted, empty path -> ``/``.
    Deterministic and shuffle-free; two URLs naming the same resource
    through case/port/tracking/param-order noise map to one key."""
    scheme = F.lower(_part(col, 1))
    auth = F.lower(_part(col, 2))
    host = _host_part(auth)
    port = _port_part(auth)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    netloc = F.when(
        (port == "") | default, host
    ).otherwise(F.concat(host, F.lit(":"), port))
    path = _part(col, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.filter(
        F.split(_part(col, 4), "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        netloc,
        path,
        F.when(qnorm == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), qnorm)
        ),
    )


def registered_domain(host: Column) -> Column:
    """Registrable domain from a (lowercased) host: last two labels,
    or last three when the host ends in a known two-level public
    suffix.  Bare hosts/IPs pass through unchanged."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(parts, -3),
        F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    is_two_level = last2.isin(*_TWO_LEVEL_SUFFIXES)
    return F.when(n <= 2, host).otherwise(
        F.when(is_two_level & (n >= 3), last3).otherwise(last2)
    )


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host, longest first: ``a.b.co.uk`` ->
    ``[a.b.co.uk, b.co.uk, co.uk, uk]``.  Pure Column expressions; the
    array length is the host's label count (bounded ~5 in practice),
    so exploding it is a small, fixed fan-out — NOT data-dependent
    blow-up."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    sfx = F.transform(
        F.sequence(F.greatest(n, F.lit(1)), F.lit(1), F.lit(-1)),
        lambda i: F.array_join(F.slice(parts, n - i + 1, i), "."),
    )
    return F.filter(sfx, lambda s: s != "")


def blocklist_filter(
    df: DataFrame,
    url_col: str,
    blocklist: DataFrame,
    domain_col: str = "domain",
    keep_blocked: bool = False,
) -> DataFrame:
    """Drop (or select) the rows whose URL host falls under a blocked
    domain — the opt-out / spam-list pass of a crawl pipeline, with
    registrar-style suffix semantics: a blocklist entry ``example.com``
    blocks ``example.com`` AND every subdomain (``a.b.example.com``),
    never the unrelated ``notexample.com``.

    Plan shape for 100 TB: the block decision depends only on the
    host, so it is computed once per DISTINCT host, not per row —
    (1) distinct hosts (shuffle ∝ host cardinality, orders of
    magnitude below row count), (2) explode each host's dot-suffixes
    (bounded fan-out, :func:`host_suffixes`) and broadcast-semi-join
    the blocklist (blocklists are 10^4..10^6 domains — broadcast
    territory), (3) anti-join (or semi-join with ``keep_blocked=True``)
    the corpus against the small blocked-hosts set, which AQE
    broadcasts when it fits.  The full rows are never exploded and the
    blocklist is never shuffled.

    Rows whose URL has no parseable host never match and are KEPT by
    the default drop mode (a malformed URL is a quality-filter
    problem, not an opt-out match).  Blocklist entries are lowercased;
    hosts already come lowercased from :func:`url_host`.
    """
    host = url_host(F.col(url_col))
    hosts = df.select(host.alias("__bl_host")).distinct()
    sfx = hosts.select(
        "__bl_host",
        F.explode(host_suffixes(F.col("__bl_host"))).alias("__bl_sfx"),
    )
    bl = blocklist.select(F.lower(F.col(domain_col)).alias("__bl_dom"))
    blocked = (
        sfx.join(
            F.broadcast(bl),
            F.col("__bl_sfx") == F.col("__bl_dom"),
            "left_semi",
        )
        .select("__bl_host")
        .distinct()
    )
    how = "left_semi" if keep_blocked else "left_anti"
    return df.join(blocked, host == F.col("__bl_host"), how)


# --- outlink extraction (crawl link graph) ------------------------------
# The step between HTML cleaning and the URL layer: pull anchor targets
# out of raw pages, resolve them against the page URL, and key them by
# registrable domain.  Pure regexp/array Column expressions — the whole
# pass fuses into the parquet scan (zero shuffle until the caller
# aggregates the edge list), and the regexes are RE2-portable (no
# lookarounds/backrefs) so an independent engine replays them exactly.

# href value of an anchor tag; [^>]*? keeps the match inside the tag,
# the captured value is everything between one kind of quote
_HREF_RE = r"""(?is)<a\b[^>]*?href\s*=\s*["']([^"']*)["']"""
# schemes that are not crawlable links
_NONLINK_RE = r"(?i)^(javascript:|mailto:|tel:|data:|#)"


def href_targets(html: Column) -> Column:
    """Array of crawlable href values from anchor tags: trimmed,
    fragment-only and javascript:/mailto:/tel:/data: targets removed.
    Unquoted href attributes are not matched (a documented
    simplification — quoted attributes dominate real crawls and an
    unquoted variant needs no new machinery, only a second pattern).
    """
    raw = F.regexp_extract_all(html, F.lit(_HREF_RE), F.lit(1))
    return F.filter(
        F.transform(raw, lambda u: F.trim(u)),
        lambda t: (t != F.lit("")) & ~t.rlike(_NONLINK_RE),
    )


def resolve_href(base: Column, href: Column) -> Column:
    """RFC 3986 reference resolution for the forms that dominate real
    pages: absolute URLs pass through, ``//host/...`` inherits the
    base scheme, ``/path`` inherits scheme+authority, and relative
    paths append to the base URL's directory.  Dot-segment
    normalization (``../``) is intentionally NOT performed — like
    :func:`normalize_url`, path semantics are preserved as written.
    """
    t = F.trim(href)
    scheme = F.lower(_part(base, 1))
    auth = F.lower(_part(base, 2))
    base_dir = F.regexp_replace(_part(base, 3), "[^/]*$", "")
    base_dir = F.when(base_dir == "", F.lit("/")).otherwise(base_dir)
    return (
        F.when(t.rlike(r"(?i)^[a-z][a-z0-9+.-]*:"), t)
        .when(t.startswith("//"), F.concat(scheme, F.lit(":"), t))
        .when(
            t.startswith("/"), F.concat(scheme, F.lit("://"), auth, t)
        )
        .otherwise(F.concat(scheme, F.lit("://"), auth, base_dir, t))
    )


def extract_links(
    df: DataFrame,
    html_col: str,
    base_col: str,
    keep_cols=("doc_id",),
) -> DataFrame:
    """Explode pages into the outlink edge list: one row per crawlable
    anchor, with the resolved absolute URL and its registrable domain.

    Output columns: ``keep_cols`` + ``link_idx`` (0-based position of
    the link in the page, long), ``link_url``, ``link_domain``.

    100 TB shape: extraction + resolution are map-only over the page
    scan; the result is the standard edge list that feeds per-domain
    caps (:func:`~pandance_spark.functions.split.cap_per_group`),
    blocklists, and link-graph analytics (e.g.
    :func:`~pandance_spark.operators.cluster.pagerank`) — each of
    which decides its own shuffle key downstream.
    """
    hrefs = href_targets(F.col(html_col))
    edges = df.select(
        *keep_cols,
        F.col(base_col).alias("__base"),
        F.posexplode(hrefs).alias("link_idx", "__href"),
    )
    url = resolve_href(F.col("__base"), F.col("__href"))
    return edges.select(
        *keep_cols,
        F.col("link_idx").cast("long"),
        url.alias("link_url"),
        registered_domain(url_host(url)).alias("link_domain"),
    )


# --- robots.txt crawl policy --------------------------------------------
# Crawl governance: parse robots.txt payloads into a rules table and
# filter candidate URLs by the longest-match rule, entirely
# relationally.  The across-line group structure (consecutive
# User-agent lines share the rules that follow) is recovered with
# window functions — no per-file sequential fold — so parsing scales
# like any other exploded-line pipeline and an independent SQL engine
# replays it exactly.  Path rules implement full RFC 9309 matching:
# prefix match plus the '*' (any run) and trailing '$' (end anchor)
# wildcards (r11 — closes the residual documented through r10); an
# empty Disallow (allow-everything) is dropped at parse time.


def parse_robots(
    df: DataFrame, text_col: str, host_col: str
) -> DataFrame:
    """Parse one robots.txt payload per row into
    ``(host, agent, rule, path)`` — one row per (user-agent, rule)
    pair, with consecutive ``User-agent:`` lines sharing the rule
    block that follows (the RFC 9309 group rule).

    Group recovery is relational: a group starts at an agent line
    whose previous line is not an agent line (lag), ``group_id`` is
    the running count of group starts, and agent rows inner-join rule
    rows on (host, group_id) — rules before any User-agent line are
    dropped by the join, comments (``#``) and empty Disallows at
    classification.  One line explode + one host-keyed window + one
    equi-join, all engine-replayable.
    """
    from pyspark.sql.window import Window

    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "__idx", "__raw"
        ),
    )
    clean = F.trim(F.regexp_replace(F.col("__raw"), "#.*", ""))
    is_agent = clean.rlike(r"(?i)^user-agent\s*:")
    agent_val = F.lower(
        F.trim(
            F.regexp_extract(clean, r"(?i)^user-agent\s*:\s*(.*)$", 1)
        )
    )
    rule_type = (
        F.when(clean.rlike(r"(?i)^allow\s*:"), F.lit("allow"))
        .when(clean.rlike(r"(?i)^disallow\s*:"), F.lit("disallow"))
        .otherwise(F.lit(None).cast("string"))
    )
    path_val = F.trim(
        F.regexp_extract(clean, r"(?i)^(dis)?allow\s*:\s*(.*)$", 2)
    )
    w = Window.partitionBy("host").orderBy("__idx")
    tagged = lines.select(
        "host",
        "__idx",
        is_agent.alias("__ia"),
        agent_val.alias("__agent"),
        rule_type.alias("__rule"),
        path_val.alias("__path"),
    ).withColumn(
        "__new_group",
        (
            F.col("__ia")
            & ~F.coalesce(F.lag("__ia").over(w), F.lit(False))
        ).cast("int"),
    ).withColumn(
        "__gid",
        F.sum("__new_group").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    agents = tagged.filter(F.col("__ia") & (F.col("__agent") != "")).select(
        "host", "__gid", F.col("__agent").alias("agent")
    )
    rules = tagged.filter(
        F.col("__rule").isNotNull() & (F.col("__path") != "")
    ).select(
        "host", "__gid", F.col("__rule").alias("rule"),
        F.col("__path").alias("path"),
    )
    return agents.join(rules, ["host", "__gid"]).select(
        "host", "agent", "rule", "path"
    )


def robots_filter(
    urls: DataFrame,
    url_col: str,
    rules: DataFrame,
    agent: str = "*",
    keep_cols=("doc_id",),
) -> DataFrame:
    """Crawl-policy decision per URL against a ``parse_robots`` rules
    table: RFC 9309 longest-match — among the agent's applicable rules
    MATCHING the URL path, the longest RULE PATTERN wins (pattern
    length including wildcards, the google robots.cc convention),
    ``allow`` beating ``disallow`` on equal length; no matching rule
    means allowed.  Matching implements the full RFC 9309 grammar:
    plain rules are prefix matches, ``*`` matches any character run,
    a trailing ``$`` anchors at the path end (r11 — previously
    prefix-only, documented).  The rule pattern is rewritten to an
    RE2-safe regex RELATIONALLY (escape metachars, ``\\*`` -> ``.*``,
    conditional anchor), so the decision replays in any RE2 engine —
    the DuckDB oracle does.  Agent precedence is exclusive: if a host
    has any group for exactly ``agent``, only those rules apply, else
    the ``*`` group (the spec's most-specific-group rule, restricted
    to exact-vs-wildcard — documented).

    Output: ``keep_cols`` + ``url``, ``allowed`` (boolean),
    ``rule_path`` (the winning rule's path, NULL when no rule
    matched).

    Shape: rules are per-host small — the join is host-keyed (AQE
    broadcasts a small rules side); the longest-match pick is one
    max(struct) aggregate per URL, map-side combinable.  Prefix match
    cannot explode: a URL meets at most the host's rule count.
    """
    keep_cols = list(keep_cols)
    u = urls.select(
        *keep_cols,
        F.col(url_col).alias("url"),
        url_host(F.col(url_col)).alias("host"),
        F.when(
            F.regexp_extract(F.col(url_col), _URL_RE, 3) == "",
            F.lit("/"),
        )
        .otherwise(F.regexp_extract(F.col(url_col), _URL_RE, 3))
        .alias("__path"),
    )
    r = rules.filter(
        F.col("agent").isin(agent, "*")
        if agent != "*"
        else (F.col("agent") == "*")
    ).withColumn(
        "__prio", F.when(F.col("agent") == agent, 2).otherwise(1)
    )
    best_prio = r.groupBy("host").agg(F.max("__prio").alias("__bp"))
    applicable = r.join(best_prio, "host").filter(
        F.col("__prio") == F.col("__bp")
    )
    # rule pattern -> anchored RE2: strip a trailing '$' (anchor flag),
    # escape regex metachars, then turn the escaped '\*' into '.*'.
    # All relational string ops — the oracle rebuilds the same regex.
    anchored = F.col("path").endswith("$")
    body = F.when(
        anchored, F.expr("substring(path, 1, length(path) - 1)")
    ).otherwise(F.col("path"))
    esc = F.regexp_replace(
        body, r"([.^$+?(){}\[\]|\\*])", r"\\$1"
    )
    rx = F.concat(
        F.lit("^"),
        F.regexp_replace(esc, r"\\\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    applicable = applicable.withColumn("__rx", rx)
    j = u.join(applicable, "host", "left").filter(
        F.col("path").isNotNull()
        & F.regexp_like(F.col("__path"), F.col("__rx"))
    )
    won = j.groupBy(*keep_cols, "url").agg(
        F.max(
            F.struct(
                F.length("path").alias("l"),
                (F.col("rule") == "allow").cast("int").alias("a"),
                F.col("path").alias("p"),
            )
        ).alias("__w")
    )
    return (
        u.join(won, keep_cols + ["url"], "left")
        .select(
            *keep_cols,
            "url",
            F.coalesce(F.col("__w.a") == 1, F.lit(True)).alias(
                "allowed"
            ),
            F.col("__w.p").alias("rule_path"),
        )
    )


# --- page metadata & sitemaps -------------------------------------------

_TITLE_RE = r"(?is)<title\b[^>]*>([^<]*)</title"
_CANON_RE = (
    r"""(?is)<link\b[^>]*?rel\s*=\s*["']canonical["'][^>]*?"""
    r"""href\s*=\s*["']([^"']*)["']"""
)
_META_ROBOTS_RE = (
    r"""(?is)<meta\b[^>]*?name\s*=\s*["']robots["'][^>]*?"""
    r"""content\s*=\s*["']([^"']*)["']"""
)
_LOC_RE = r"(?is)<loc\s*>\s*([^<]*?)\s*</loc\s*>"


def html_meta(html: Column) -> Column:
    """Crawl-side page metadata as a struct: ``title`` (trimmed,
    whitespace-collapsed), ``canonical`` (href of the canonical link,
    '' when absent), ``noindex``/``nofollow`` (from the robots meta
    tag).  First match wins throughout (document order, the browser
    rule).  Attribute order is fixed rel-before-href / name-before-
    content (the overwhelmingly common serialization; a reversed-
    attribute variant needs only a second pattern).  Pure regexp
    Column expressions — map-only, RE2-portable."""
    title = F.trim(
        F.regexp_replace(F.regexp_extract(html, _TITLE_RE, 1), r"\s+", " ")
    )
    canon = F.regexp_extract(html, _CANON_RE, 1)
    robots = F.lower(F.regexp_extract(html, _META_ROBOTS_RE, 1))
    return F.struct(
        title.alias("title"),
        canon.alias("canonical"),
        robots.contains("noindex").alias("noindex"),
        robots.contains("nofollow").alias("nofollow"),
    )


def sitemap_urls(xml: Column) -> Column:
    """``<loc>`` targets of a sitemap / sitemap-index payload, in
    document order (array<string>, entity-decoded ``&amp;`` only —
    the one entity RFC-required in sitemap URLs).  Works for both
    urlset and sitemapindex files; pair with ``normalize_url`` +
    ``blocklist_filter`` downstream.  Map-only."""
    locs = F.regexp_extract_all(xml, F.lit(_LOC_RE), F.lit(1))
    return F.transform(
        locs, lambda u: F.replace(u, F.lit("&amp;"), F.lit("&"))
    )
