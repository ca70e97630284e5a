"""URL canonicalization — the canonical-key problem of a url-keyed CDC
engine.

The north-star data model keys web pages by ``url`` (reference analog:
the origin partition key, ``schema/CqlTable.java``). Real crawl/CDC
feeds carry the SAME page under cosmetically different URLs — host
case, default ports, fragments, tracking query params, param order —
and every variant becomes a separate key: the LWW merge can't collapse
them, dedup sees them as distinct documents, and hot pages fragment
their own history. Canonicalizing the key BEFORE the merge fixes all
three at the cost of one codegen projection.

``canonical_url_expr`` is a pure Catalyst expression composition (no
UDF — it stays inside whole-stage codegen and pushes through the
pipeline like any other transform), built only from regex/array
builtins that behave identically under Java regex and DuckDB's RE2
(no lookarounds, no backrefs), so the ``url_canonicalize`` entry query
is value-checked against a DuckDB replay of the same rules.

Rules applied (the common-crawl-style normal form):

1. trim; non-URLs (no ``scheme://``) pass through trimmed, otherwise:
2. scheme and host lowercase (path/query case is PRESERVED);
3. default ports stripped (``http://h:80``, ``https://h:443``);
4. a leading ``www.`` stripped from the host (``strip_www=False`` to
   keep it);
5. the ``#fragment`` dropped;
6. tracking query params dropped (``utm_*``, ``fbclid``, ``gclid``,
   ``ref`` by default — override with ``tracking_params``), remaining
   params sorted byte-wise, empty pairs removed;
7. a single trailing ``/`` of the path dropped (``.../a/`` == ``.../a``;
   the bare root ``/`` canonicalizes to the empty path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default query parameters treated as tracking noise (regex alternates,
#: matched against the full ``name=value`` pair)
TRACKING_PARAMS = ("utm_[^=]*", "fbclid", "gclid", "ref")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"


def canonical_url_expr(
    url, strip_www: bool = True,
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
) -> Column:
    """Canonical form of ``url`` (column or name) per the module rules.

    One codegen projection; NULL-safe (null in → null out); inputs
    without a ``scheme://`` prefix are returned trimmed but otherwise
    untouched (opaque keys stay opaque).
    """
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    # default ports; then optionally the www. prefix
    host = F.when(scheme == "http", F.regexp_replace(host, ":80$", "")) \
        .when(scheme == "https", F.regexp_replace(host, ":443$", "")) \
        .otherwise(host)
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    # path?query with the fragment already excluded by _REST_RE
    rest = F.regexp_extract(u, _REST_RE, 1)
    path = F.regexp_replace(rest, r"\?.*", "")
    path = F.regexp_replace(path, "/$", "")
    qs = F.when(rest.contains("?"),
                F.regexp_replace(rest, r"^[^?]*\?", "")).otherwise(F.lit(""))
    drop_re = "^(" + "|".join(tracking_params) + ")="
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.rlike(drop_re))
    canon_q = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q))
         .otherwise(F.lit("")))
    return F.when(scheme == "", u).otherwise(rebuilt)


def canonical_url_sql(
    source_sql: str, url_expr: str, carry_cols: tuple[str, ...] = (),
    out_col: str = "canon_url", strip_www: bool = True,
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
) -> str:
    """DuckDB replay of :func:`canonical_url_expr` — the oracle half,
    kept adjacent so the two rule sets cannot drift apart silently.

    Returns a full SELECT over ``source_sql`` (a relation SQL string)
    producing ``carry_cols`` + ``<out_col>`` where ``url_expr`` is the
    messy-URL expression evaluated against the source relation.
    """
    drop_re = "^(" + "|".join(tracking_params) + ")="
    carry = "".join(f"{c}, " for c in carry_cols)
    host3 = "regexp_replace(host2, '^www\\.', '')" if strip_www else "host2"
    return f"""
WITH _src AS ({source_sql}),
_u AS (SELECT {carry}trim({url_expr}) AS u FROM _src),
_p AS (
  SELECT {carry}u,
    lower(regexp_extract(u, '{_SCHEME_RE}', 1)) AS scheme,
    lower(regexp_extract(u, '{_HOST_RE}', 1)) AS host,
    regexp_extract(u, '{_REST_RE}', 1) AS rest
  FROM _u),
_h AS (
  SELECT {carry}u, scheme,
    CASE WHEN scheme = 'http' THEN regexp_replace(host, ':80$', '')
         WHEN scheme = 'https' THEN regexp_replace(host, ':443$', '')
         ELSE host END AS host2,
    regexp_replace(regexp_replace(rest, '\\?.*', ''), '/$', '') AS path,
    CASE WHEN contains(rest, '?')
         THEN regexp_replace(rest, '^[^?]*\\?', '') ELSE '' END AS qs
  FROM _p),
_q AS (
  SELECT {carry}u, scheme, {host3} AS host3, path,
    array_to_string(list_sort(list_filter(string_split(qs, '&'),
      p -> p <> '' AND NOT regexp_matches(p, '{drop_re}'))), '&') AS cq
  FROM _h)
SELECT {carry}
  CASE WHEN scheme = '' THEN u ELSE
    scheme || '://' || host3 || path ||
    CASE WHEN cq <> '' THEN '?' || cq ELSE '' END
  END AS {out_col}
FROM _q"""
