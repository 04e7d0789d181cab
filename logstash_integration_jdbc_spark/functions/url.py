"""URL canonicalization — the web-curation primitive behind URL-level
dedup and crawl-frontier merging: two spellings of the same resource
(`HTTP://Example.COM:80/a/?b=2&utm_source=x#frag` vs
`http://example.com/a?b=2`) must map to one canonical string before an
exact-dedup pass can treat them as one document.

Rules (each mirrored bit-exactly by the pure-Python twin the DuckDB
oracle uses — see ``canonicalize_url_py``):

1. scheme and host lowercase; userinfo dropped
2. fragment dropped
3. default port stripped (``:80`` for http, ``:443`` for https);
   non-default ports kept
4. tracking params dropped: any ``utm_*`` plus ``fbclid``, ``gclid``,
   ``ref``, ``mc_cid``, ``mc_eid``
5. surviving query params sorted bytewise on the full ``k=v`` string
   (a stable total order both engines share)
6. empty path becomes ``/``; a trailing slash on a non-root path is
   stripped (``/a/`` ≡ ``/a``)

Everything is JVM-side Catalyst expressions — ``parse_url`` +
higher-order array functions (filter / array_sort / array_join) — so
canonicalization is map-only, codegen'd, and scale-free: no UDF, no
shuffle, no Python in the hot path. At 100 TB this runs at scan speed
as a projection fused into whatever pass reads the URL column.

Reference parity note: the logstash ecosystem handles this with the
`urldecode` mutate + custom ruby filters; here it is a first-class
declarative operator (SURVEY.md training-data pipeline section).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAMS = ("fbclid", "gclid", "ref", "mc_cid", "mc_eid")


def _is_tracking(p: Column) -> Column:
    key = F.split(p, "=", 2).getItem(0)
    cond = key.startswith("utm_")
    for t in TRACKING_PARAMS:
        cond = cond | (key == t)
    return cond


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules. Pure expressions."""
    scheme = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    authority = F.parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    port_part = F.when(default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port))

    raw_path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.when(raw_path == "", F.lit("/")).otherwise(
        F.when((F.length(raw_path) > 1) & raw_path.endswith("/"),
               F.substring(raw_path, F.lit(1), F.length(raw_path) - 1))
        .otherwise(raw_path))

    query = F.parse_url(url, F.lit("QUERY"))
    params = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: (p != "") & ~_is_tracking(p))
    qs = F.array_join(F.array_sort(params), "&")
    q_part = F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs))

    return F.concat(scheme, F.lit("://"), host, port_part, path, q_part)


def with_canonical_url(df: DataFrame, url_col: str = "url",
                       out_col: str = "canon_url") -> DataFrame:
    """Project a canonical-URL column (map-only)."""
    return df.withColumn(out_col, canonicalize_url(F.col(url_col)))


def canonicalize_url_py(url: str) -> str:
    """Pure-Python twin (urllib) — powers the independent DuckDB
    VALUES oracle; kept rule-for-rule in sync with the expression form."""
    from urllib.parse import urlsplit

    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    port_part = ""
    if port is not None and not (
            (scheme == "http" and port == 80)
            or (scheme == "https" and port == 443)):
        port_part = f":{port}"
    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    kept = []
    for p in (parts.query or "").split("&"):
        if not p:
            continue
        key = p.split("=", 1)[0]
        if key.startswith("utm_") or key in TRACKING_PARAMS:
            continue
        kept.append(p)
    qs = "&".join(sorted(kept))
    q_part = f"?{qs}" if qs else ""
    return f"{scheme}://{host}{port_part}{path}{q_part}"
