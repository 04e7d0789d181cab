"""IP/CIDR enrichment — the logstash ``cidr`` filter, Spark-first.

The cidr filter tags events whose IP falls inside configured networks
(public logstash-filter-cidr semantics). Columnar form: parse the
dotted-quad to a uint32 with arithmetic expressions (codegen, no UDF),
then label it against the network list. Two strategies:

- ``method="case"`` (default): the networks compile to ONE nested
  CASE/WHEN expression ordered most-specific-first — map-only, zero
  shuffle, the right plan for the filter's usual dozens-of-networks
  config at any data scale.
- ``method="join"``: a broadcast range join against a networks
  DataFrame, most-specific match kept per event. Pays a broadcast +
  per-row range probe; use when the network table is too large to
  inline as an expression (thousands+) or comes from a dimension
  source with refresh semantics.
"""

from __future__ import annotations

import ipaddress
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ip_to_long(col: Column) -> Column:
    """Dotted-quad string → uint32-as-long; null for malformed input.

    Pure split/cast arithmetic — whole-stage codegen, and trivially
    replayable in ANSI SQL for oracles.
    """
    ok = col.rlike(
        r"^(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
        r"(\.(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)){3}$")
    p = F.split(col, r"\.")
    val = (p[0].cast("long") * 16777216 + p[1].cast("long") * 65536
           + p[2].cast("long") * 256 + p[3].cast("long"))
    return F.when(ok, val)


def _parse_networks(networks: Sequence[tuple[str, str]]) -> list[tuple[int, int, int, str]]:
    """[(cidr, label)] → [(lo, hi, prefixlen, label)], validated."""
    out = []
    for cidr, label in networks:
        net = ipaddress.ip_network(cidr, strict=True)
        if net.version != 4:
            raise ValueError(f"only IPv4 networks supported, got {cidr!r}")
        out.append((int(net.network_address), int(net.broadcast_address),
                    net.prefixlen, label))
    return out


def geoip_lookup(df: DataFrame, ip_col: str, geo: DataFrame, *,
                 lo_col: str = "lo", hi_col: str = "hi",
                 attrs: Sequence[str] = ("country", "city"),
                 bucket_bits: int = 16,
                 broadcast_geo: bool = True) -> DataFrame:
    """logstash-filter-geoip re-expressed over a range table: enrich
    each row with the attributes of the (disjoint) IP range containing
    its address — the MaxMind-style city/country/ASN lookup, minus the
    proprietary .mmdb reader (load the vendor CSVs into ``geo`` as
    (lo, hi, attrs...) uint32 ranges; reference jdbc_static docs model
    the same local-copy-of-a-dimension pattern).

    Scale plan: a raw ``BETWEEN`` against a broadcast range table is a
    BroadcastNestedLoopJoin — O(rows × ranges), hopeless at MaxMind's
    ~3M ranges. Instead both sides bucket by the address's top
    ``32 - bucket_bits`` bits (ranges explode into every bucket they
    span via ``sequence()`` — JVM-side, done ONCE on the dim), the join
    is an EQUI-join on the bucket (hashable: broadcast when the
    exploded dim fits, shuffle-hash otherwise), and the BETWEEN becomes
    a cheap post-join filter inside the join condition. GeoIP ranges
    are disjoint by construction, so at most one range matches — rows
    keep left-join semantics, unmatched rows null the attrs.
    """
    if not attrs:
        raise ValueError("geoip_lookup needs at least one attribute column")
    shift = 1 << bucket_bits
    gsel = [F.col(lo_col).alias("__glo"), F.col(hi_col).alias("__ghi")]
    gsel += [F.col(a) for a in attrs]
    gx = (geo.select(*gsel)
              .withColumn("__bkt", F.explode(F.sequence(
                  (F.col("__glo") / shift).cast("long"),
                  (F.col("__ghi") / shift).cast("long")))))
    if broadcast_geo:
        gx = F.broadcast(gx)
    ip = ip_to_long(F.col(ip_col))
    tmp = "_geo_ip_long"
    left = df.withColumn(tmp, ip)
    cond = ((left[tmp] / shift).cast("long") == gx["__bkt"]) & \
        left[tmp].between(gx["__glo"], gx["__ghi"])
    out = left.join(gx, cond, "left")
    return out.drop(tmp, "__glo", "__ghi", "__bkt")


def cidr_enrich(df: DataFrame, ip_col: str,
                networks: Sequence[tuple[str, str]], *,
                out_col: str = "network", method: str = "case",
                id_col: str | None = None) -> DataFrame:
    """Label each row's ``ip_col`` with the most-specific matching
    network's label (null when none match or the IP is malformed).

    ``method="join"`` needs ``id_col`` (a unique row key) to resolve
    overlapping matches deterministically without inventing row ids.
    """
    nets = _parse_networks(networks)
    ip = ip_to_long(F.col(ip_col))
    if method == "case":
        expr = F.lit(None).cast("string")
        # build from LEAST specific outward so most-specific lands on top
        for lo, hi, _plen, label in sorted(nets, key=lambda t: t[2]):
            expr = F.when(ip.between(lo, hi), F.lit(label)).otherwise(expr)
        return df.withColumn(out_col, expr)
    if method != "join":
        raise ValueError(f"method must be 'case' or 'join', got {method!r}")
    if id_col is None:
        raise ValueError("method='join' needs id_col for deterministic "
                         "most-specific resolution")
    spark = df.sparkSession
    nets_df = spark.createDataFrame(
        nets, "lo long, hi long, prefixlen int, label string")
    tmp_ip = "_ip_long"
    joined = (df.withColumn(tmp_ip, ip)
                .join(F.broadcast(nets_df),
                      F.col(tmp_ip).between(F.col("lo"), F.col("hi")),
                      "left"))
    # most-specific per row: max prefixlen wins; struct-max avoids a
    # window pass (one groupBy on the unique id, partial-aggregatable)
    best = F.max(F.when(F.col("label").isNotNull(),
                        F.struct(F.col("prefixlen"), F.col("label"))))
    keep = list(df.columns)
    return (joined.groupBy(F.col(id_col))
            .agg(*[F.first(c).alias(c) for c in keep if c != id_col],
                 best.alias("_best"))
            .withColumn(out_col, F.col("_best.label"))
            .select(*keep, out_col))
