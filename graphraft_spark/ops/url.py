"""URL canonicalization for crawl dedup and per-domain curation.

Two crawls of the same page rarely carry byte-identical URLs —
tracking parameters, fragment anchors, default ports, and trailing
slashes all vary — so URL-level dedup and per-domain caps (the first
stages of every crawl pipeline, before any content hashing) need a
canonical form.  Everything here is pure string/array expressions
(codegen; oracle-replayable): no java.net.URL on the hot path, no
Python.

Canonical form produced by :func:`canonicalize_url`:

- scheme and host lowercased; userinfo kept as-is (rare, significant)
- default ports stripped (``:80`` for http, ``:443`` for https)
- path defaulted to ``/`` when empty; trailing slash stripped
  elsewhere
- query parameters: tracking params dropped (``utm_*``, ``fbclid``,
  ``gclid``, ``msclkid``, ``ref``), the rest SORTED (param order is
  not semantic in practice; sorting makes equal pages equal strings)
- fragment dropped (never sent to the server)

Malformed URLs (no ``scheme://``) canonicalize to NULL — surface
them, don't guess.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def url_parts(url: Column) -> dict[str, Column]:
    """(scheme, authority, path, query) — raw regex split; empty string
    for absent parts, as regexp_extract yields on no match."""
    return {
        "scheme": F.lower(F.regexp_extract(url, _URL_RE, 1)),
        "authority": F.regexp_extract(url, _URL_RE, 2),
        "path": F.regexp_extract(url, _URL_RE, 3),
        "query": F.regexp_extract(url, _URL_RE, 4),
    }


def url_host(url: Column) -> Column:
    """Lowercased host without userinfo or port — the per-domain
    grouping key (pair with ``source_quota`` for domain caps)."""
    auth = url_parts(url)["authority"]
    no_user = F.element_at(F.split(auth, "@"), -1)
    return F.lower(F.element_at(F.split(no_user, ":"), 1))


def canonicalize_url(url: Column) -> Column:
    p = url_parts(url)
    scheme = p["scheme"]
    auth = p["authority"]
    # lowercase host but preserve userinfo case; strip default port
    user = F.when(auth.contains("@"),
                  F.concat(F.element_at(F.split(auth, "@"), 1),
                           F.lit("@"))).otherwise(F.lit(""))
    hostport = F.element_at(F.split(auth, "@"), -1)
    host = F.lower(F.element_at(F.split(hostport, ":"), 1))
    port = F.when(F.size(F.split(hostport, ":")) > 1,
                  F.element_at(F.split(hostport, ":"), 2)) \
        .otherwise(F.lit(""))
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443")))
    authority = F.concat(
        user, host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")))

    path = F.when(p["path"] == "", F.lit("/")).otherwise(
        F.when((F.length(p["path"]) > 1) & p["path"].endswith("/"),
               p["path"].substr(F.lit(1), F.length(p["path"]) - 1))
        .otherwise(p["path"]))

    params = F.array_sort(F.filter(
        F.split(p["query"], "&"),
        lambda kv: (kv != "") & ~kv.rlike(TRACKING_PARAM_RE)))
    qs = F.array_join(params, "&")
    tail = F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit(""))

    return F.when(
        scheme == "", F.lit(None).cast("string")).otherwise(
        F.concat(scheme, F.lit("://"), authority, path, tail))
