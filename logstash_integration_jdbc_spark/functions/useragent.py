"""User-agent parsing: logstash-filter-useragent, Catalyst-first.

The filter wraps the public uap-core regex database (browser family /
version, OS, device class). Re-expressed here as an ORDERED
first-match chain of ``rlike`` + ``regexp_extract`` — one codegen'd
projection, no Python in the row path, no dictionary shuffle.

The pattern set is a compact curated subset of the public uap-core
ordering rules (Edge before Chrome, Opera before Chrome, Chrome before
Safari — derivative browsers embed their ancestors' tokens), not the
full database: the full uap-core YAML is ~1000 regexes and would
compile into an impractical CASE chain; swap in a broadcast-join
variant against the full table if family coverage beyond the majors
matters. Unknown agents yield family='Other' (uap-core's fallback).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (family, detect-regex, version-capture-regex) — ORDER IS PRIORITY.
_BROWSERS: tuple[tuple[str, str, str], ...] = (
    ("Edge", r"Edge?[A|iOS]*/\d", r"Edge?[A|iOS]*/(\d+)"),
    ("Opera", r"(OPR|Opera)/\d", r"(?:OPR|Opera)/(\d+)"),
    ("Chrome Mobile", r"Chrome/\d+[^ ]* Mobile", r"Chrome/(\d+)"),
    ("Chrome", r"Chrome/\d", r"Chrome/(\d+)"),
    ("Firefox", r"Firefox/\d", r"Firefox/(\d+)"),
    ("Mobile Safari", r"Version/\d+[^ ]*( Mobile[^ ]*)? Safari/",
     r"Version/(\d+)"),
    ("IE", r"(MSIE \d|Trident/.*rv:\d)", r"(?:MSIE |rv:)(\d+)"),
)
_BOT_RE = r"(?i)(bot|crawl|spider|slurp|archiver)"

# (os family, detect-regex) — ordered; iOS before Mac (iPads may carry
# "like Mac OS X").
_OSES: tuple[tuple[str, str], ...] = (
    ("iOS", r"(iPhone|iPad|iPod)"),
    ("Android", r"Android"),
    ("Windows", r"Windows NT"),
    ("Mac OS X", r"Mac OS X"),
    ("Linux", r"Linux"),
)


def ua_family(ua: Column) -> Column:
    expr = F.when(ua.rlike(_BOT_RE), F.lit("Spider"))
    for fam, detect, _ in _BROWSERS:
        expr = expr.when(ua.rlike(detect), F.lit(fam))
    return expr.otherwise(F.lit("Other"))


def ua_major(ua: Column) -> Column:
    """Major version of the MATCHED family (first match wins, so the
    extract must be guarded by the same priority chain — a bare
    Chrome/ extract would misreport Edge's embedded Chrome token)."""
    expr = F.when(ua.rlike(_BOT_RE), F.lit(None).cast("string"))
    for fam, detect, ver in _BROWSERS:
        got = F.regexp_extract(ua, ver, 1)
        expr = expr.when(ua.rlike(detect),
                         F.when(got != "", got))
    return expr.otherwise(F.lit(None).cast("string"))


def ua_os(ua: Column) -> Column:
    expr = None
    for fam, detect in _OSES:
        branch = F.when(ua.rlike(detect), F.lit(fam))
        expr = branch if expr is None else expr.when(ua.rlike(detect),
                                                     F.lit(fam))
    return expr.otherwise(F.lit("Other"))


def ua_device(ua: Column) -> Column:
    return (F.when(ua.rlike(_BOT_RE), F.lit("Spider"))
             .when(ua.rlike(r"iPad"), F.lit("iPad"))
             .when(ua.rlike(r"iPhone"), F.lit("iPhone"))
             .when(ua.rlike(r"Android.*Mobile"), F.lit("Android Mobile"))
             .when(ua.rlike(r"Android"), F.lit("Android Tablet"))
             .otherwise(F.lit("Other")))


def parse_useragent(df: DataFrame, source: str,
                    target: str | None = "user_agent") -> DataFrame:
    """Attach ``name`` (family), ``major``, ``os_name``, ``device`` —
    nested under ``target`` (the filter's default ``[user_agent]``
    target) or top-level when ``target=None``. One projection; every
    branch is an RE2-safe regex in codegen."""
    ua = F.col(source)
    fields = {
        "name": ua_family(ua),
        "major": ua_major(ua),
        "os_name": ua_os(ua),
        "device": ua_device(ua),
    }
    if target is None:
        for k, v in fields.items():
            df = df.withColumn(k, v)
        return df
    return df.withColumn(
        target, F.struct(*[v.alias(k) for k, v in fields.items()]))
