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

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "url_parts",
    "url_host",
    "normalize_url",
    "registered_domain",
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
