"""Human-readable size parsing + hostname TLD splitting
(logstash-filter-bytes and logstash-filter-tld semantics), Catalyst-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# logstash-filter-bytes units: b/kb/mb/gb/tb/pb with kib/mib/... binary
# forms. conversion_method binary (default, 1024 for kb) vs metric.
_UNIT_POWERS = {"b": 0, "k": 1, "m": 2, "g": 3, "t": 4, "p": 5}
_BYTES_RE = r"^\s*([0-9]*\.?[0-9]+)\s*([kKmMgGtTpP]?)([iI]?)[bB]?\s*$"


def bytes_expr(col: Column, conversion_method: str = "binary") -> Column:
    """'10 MB' / '1.5GiB' / '512' → byte count (double; null when
    unparseable). ``conversion_method='binary'`` treats kB/MB as 1024-
    based (the filter's default); ``'metric'`` as 1000-based; the
    explicit ``KiB/MiB`` forms are always 1024-based in both modes."""
    if conversion_method not in ("binary", "metric"):
        raise ValueError("conversion_method must be 'binary' or 'metric'")
    num = F.regexp_extract(col, _BYTES_RE, 1)
    unit = F.lower(F.regexp_extract(col, _BYTES_RE, 2))
    ibi = F.regexp_extract(col, _BYTES_RE, 3) != ""
    base_default = 1024.0 if conversion_method == "binary" else 1000.0
    base = F.when(ibi, F.lit(1024.0)).otherwise(F.lit(base_default))
    power = F.lit(0.0)
    for u, p in _UNIT_POWERS.items():
        power = F.when(unit == u, F.lit(float(p))).otherwise(power)
    ok = col.rlike(_BYTES_RE)
    return F.when(ok & (num != ""),
                  num.cast("double") * F.pow(base, power))


def parse_bytes(df: DataFrame, source: str, target: str = "bytes",
                conversion_method: str = "binary",
                tag_on_failure: tuple[str, ...] = ("_bytesparsefailure",),
                ) -> DataFrame:
    """Attach the parsed byte count; unparseable non-null input takes
    ``tag_on_failure`` (the filter's behavior)."""
    df = df.withColumn(target, bytes_expr(F.col(source), conversion_method))
    if tag_on_failure:
        from logstash_integration_jdbc_spark.operators.lookup import add_tags

        failed = F.col(source).isNotNull() & F.col(target).isNull()
        df = add_tags(df, failed, tag_on_failure)
    return df


# Two-level public suffixes a curated subset of the public suffix list
# covers (the tld filter wraps the full Mozilla PSL — ~9000 rules; a
# broadcast-join variant against the full list is the drop-in upgrade,
# same shape as geoip's range dim).
_TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.sg", "com.tr", "co.za",
)


def tld_split(df: DataFrame, host_col: str, prefix: str = "tld_") -> DataFrame:
    """logstash-filter-tld: split a hostname into top-level domain,
    registered domain ("domain"), and subdomain, honoring a curated
    two-level public-suffix subset (full-PSL parity = swap in the list
    as literals or a broadcast dim). One codegen projection."""
    host = F.lower(F.trim(F.col(host_col)))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    two_level = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1))
    is2 = two_level.isin(*_TWO_LEVEL_SUFFIXES) & (n >= 2)
    # suffix length in labels: 2 for listed two-level suffixes, else 1
    slen = F.when(is2, 2).otherwise(1)
    ok = host.rlike(r"^[a-z0-9.-]+$") & (n > slen)
    tld = F.when(is2, two_level).otherwise(F.element_at(parts, -1))
    domain = F.concat_ws(".", F.element_at(parts, -(slen + F.lit(1))), tld)
    sub = F.when(n > slen + 1,
                 F.array_join(F.slice(parts, 1, n - slen - 1), "."))
    return (df
            .withColumn(f"{prefix}tld", F.when(ok, tld))
            .withColumn(f"{prefix}domain", F.when(ok, domain))
            .withColumn(f"{prefix}subdomain", F.when(ok, sub)))
