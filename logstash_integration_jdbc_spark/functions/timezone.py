"""Timezone conversion with the reference's DST-ambiguity policy.

``jdbc_default_timezone => "tz[dst_enabled_on_overlap:true|false]"``
(/root/reference/lib/logstash/plugin_mixins/jdbc/timezone_proxy.rb:20-38,
docs/input-jdbc.asciidoc:334-363): naive DB-local timestamps are
converted to UTC; during the autumn DST overlap a wall-clock time is
ambiguous and the extension picks the DST (earlier-UTC) or standard
(later-UTC) reading instead of raising.

Spark's ``to_utc_timestamp`` silently picks one reading (the later,
non-DST offset). To honor the policy we detect ambiguity declaratively:
a wall time W is ambiguous iff converting W→UTC→W' round-trips to a
different wall time under the two candidate offsets. We implement it as:

    utc_std  = to_utc_timestamp(W, tz)                 # Spark's default pick
    utc_dst  = utc_std - (offset difference)           # the DST reading

Ambiguity test: W is in the overlap iff
``from_utc_timestamp(utc_std - 1h, tz) == W - 0h`` ... in practice the
robust declarative test is that both candidate instants map back to W.
All of it is plain Catalyst expressions — no UDF, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def local_to_utc(col: Column, tz: str, dst_enabled_on_overlap: bool = False) -> Column:
    """Naive-local → UTC with an explicit DST-overlap policy.

    ``dst_enabled_on_overlap=True``: ambiguous wall times take the DST
    (earlier-UTC) reading — empirically Spark's own pick in
    ``to_utc_timestamp`` (java.time resolves overlaps to the earlier
    offset). ``False``: take the standard-time (later-UTC) reading —
    computed as +1h from the DST reading when and only when that instant
    round-trips back to the same wall time (i.e. the wall time really is
    inside the overlap).
    """
    dst = F.to_utc_timestamp(col, tz)  # Spark picks the DST (earlier) reading
    if dst_enabled_on_overlap:
        return dst
    cand = dst + F.expr("INTERVAL 1 HOUR")
    roundtrip = F.from_utc_timestamp(cand, tz)
    return F.when(roundtrip == col, cand).otherwise(dst)


def parse_date(df, source: str, formats, target: str = "parsed_ts",
               tag_on_failure: tuple[str, ...] = ("_dateparsefailure",)):
    """Multi-format timestamp parsing — the logstash ``date`` filter.

    The filter tries each ``match`` format in order and the first that
    parses wins; an unparseable value gets ``_dateparsefailure``.
    Columnar form: a ``coalesce`` chain of ``to_timestamp(col, fmt)``
    branches (Spark's non-ANSI to_timestamp yields null on mismatch —
    exactly the try-next signal), one codegen'd projection. Formats are
    Spark/JDK datetime patterns, the moral equivalent of the filter's
    Joda patterns; ``UNIX``/``UNIX_MS`` (epoch seconds/millis string
    forms) are supported by name like the filter.
    """
    from pyspark.sql import DataFrame  # noqa: F401  (signature clarity)

    if not formats:
        raise ValueError("parse_date needs at least one format")
    src = F.col(source)
    branches = []
    for fmt in formats:
        if fmt == "UNIX":
            branches.append(F.to_timestamp(
                F.when(src.rlike(r"^\d+(\.\d+)?$"), src).cast("double")))
        elif fmt == "UNIX_MS":
            branches.append(F.to_timestamp(
                F.when(src.rlike(r"^\d+$"), src).cast("double") / 1000.0))
        else:
            branches.append(F.try_to_timestamp(src, F.lit(fmt)))
    parsed = F.coalesce(*branches) if len(branches) > 1 else branches[0]
    df = df.withColumn(target, parsed)
    if tag_on_failure:
        from logstash_integration_jdbc_spark.operators.lookup import add_tags

        df = add_tags(df, src.isNotNull() & F.col(target).isNull(),
                      tag_on_failure)
    return df
