"""URL canonicalization — the key-maker for URL-level dedup.

Web-corpus pipelines dedup by URL before they ever fetch or compare
content (the same page is crawled as ``HTTP://Example.com/a/`` and
``http://example.com/a?utm_source=feed``); a canonical form turns
that into one exact groupBy key. The rules here are the standard
conservative set (RFC 3986 §6 syntax-based normalization + the
universally-safe tracking-param strip):

1. drop the fragment (``#…`` never reaches the server);
2. lowercase scheme and host; strip default ports (``:80``/``:443``);
3. strip ONE trailing slash from a non-root path;
4. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``) and SORT the survivors — query order is almost always
   semantically irrelevant and sorting makes the key stable.

Everything is Catalyst-side (regexp + split/filter/array_sort/
array_join — all with DuckDB twins: string_split/list_filter/
list_sort/array_to_string), so q157 is hash-exact across engines and
at 100 TB the canonicalization rides the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# per-KEY anchored: the name must be exactly utm_*/fbclid/gclid/ref
# (followed by '=' or end) — an unanchored prefix would strip real
# params like gclidset=1 or refresh=1 (r16 review)
TRACKING_RE = "^(utm_[^=]*|fbclid|gclid|ref)(=|$)"


def url_host(url: Column) -> Column:
    """Lowercased host (authority minus port) of a URL."""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)", 1))


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module's rule set."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme_host = F.lower(
        F.regexp_extract(no_frag, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", 1)
    )
    scheme_host = F.regexp_replace(scheme_host, r":(80|443)$", "")
    path = F.regexp_extract(no_frag, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path, r"^(.+?)/$", r"$1")
    # RFC 3986 §6.2.3: an empty path is equivalent to '/' — without
    # this, http://h.com and http://h.com/ (the most common dup pair
    # on the web) would keep two dedup keys (r16 review)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(no_frag, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda x: (x != "") & ~x.rlike(TRACKING_RE),
        )
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        scheme_host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def canonical_url_sql(col_expr: str) -> str:
    """The SAME canonicalization as a DuckDB SQL expression — the
    oracle mirror (list_filter/list_sort/array_to_string for the
    query-param step)."""
    no_frag = f"regexp_replace({col_expr}, '#.*$', '')"
    scheme_host = (
        f"regexp_replace(lower(regexp_extract({no_frag}, "
        f"'^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)', 1)), ':(80|443)$', '')"
    )
    path0 = (
        f"regexp_replace(regexp_extract({no_frag}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1), '^(.+?)/$', '\\1')"
    )
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    kept = (
        f"list_sort(list_filter(string_split(regexp_extract({no_frag}, "
        f"'\\?([^#]*)', 1), '&'), "
        f"x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_RE}')))"
    )
    # DuckDB's array_to_string returns NULL for an empty list where
    # Spark's array_join returns '' — coalesce pins the Spark semantic
    qs = f"coalesce(array_to_string({kept}, '&'), '')"
    return (
        f"({scheme_host} || {path} || "
        f"CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END)"
    )
