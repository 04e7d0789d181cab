"""Syslog priority + RFC3164 line decoding (logstash-filter-syslog_pri
and the input plugin's line grok), Catalyst-only.

``PRI = facility * 8 + severity`` (RFC 5424 §6.2.1); the label tables
below are the public defaults the syslog_pri filter documents. Both
decode paths are integer arithmetic + literal-array indexing in
whole-stage codegen — no dictionary join, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Public RFC 5424 tables (= the filter's facility_labels/severity_labels
# defaults).
FACILITY_LABELS: tuple[str, ...] = (
    "kernel", "user-level", "mail", "daemon", "security/authorization",
    "syslogd", "line printer", "network news", "uucp", "clock",
    "security/authorization", "ftp", "ntp", "log audit", "log alert",
    "clock", "local0", "local1", "local2", "local3", "local4", "local5",
    "local6", "local7",
)
SEVERITY_LABELS: tuple[str, ...] = (
    "emergency", "alert", "critical", "error", "warning", "notice",
    "informational", "debug",
)


def syslog_pri(df: DataFrame, pri_col: str,
               prefix: str = "syslog_") -> DataFrame:
    """Decode a numeric PRI column into facility/severity codes +
    labels (out-of-range PRI → null labels, the filter's unset
    behavior). One codegen projection."""
    pri = F.col(pri_col).cast("int")
    fac = (pri / 8).cast("int")
    sev = pri % 8
    fac_label = F.element_at(
        F.array(*[F.lit(x) for x in FACILITY_LABELS]), fac + 1)
    sev_label = F.element_at(
        F.array(*[F.lit(x) for x in SEVERITY_LABELS]), sev + 1)
    ok = pri.isNotNull() & (pri >= 0) & (pri < 8 * len(FACILITY_LABELS))
    return (df
            .withColumn(f"{prefix}facility_code", F.when(ok, fac))
            .withColumn(f"{prefix}severity_code", F.when(ok, sev))
            .withColumn(f"{prefix}facility", F.when(ok, fac_label))
            .withColumn(f"{prefix}severity", F.when(ok, sev_label)))


_RFC3164_RE = (r"^<(\d{1,3})>"
               r"([A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}) "
               r"(\S+) "
               r"([^\[:]+)(?:\[(\d+)\])?: "
               r"(.*)$")


def parse_syslog_line(df: DataFrame, line_col: str,
                      tag_on_failure: tuple[str, ...] = ("_syslogfailure",),
                      ) -> DataFrame:
    """RFC3164 line → pri/timestamp-text/host/program/pid/message via
    one shared regex (six ``regexp_extract`` over the same pattern —
    Catalyst CSEs the match). Non-matching lines null the fields and
    take ``tag_on_failure``; the timestamp is left as text for
    ``functions.timezone.parse_date`` (RFC3164 has no year — policy
    belongs to the date filter, as in logstash)."""
    line = F.col(line_col)
    matched = line.rlike(_RFC3164_RE)

    def grp(i: int) -> Column:
        got = F.regexp_extract(line, _RFC3164_RE, i)
        return F.when(matched & (got != ""), got)

    df = (df
          .withColumn("syslog_pri_raw", grp(1).cast("int"))
          .withColumn("syslog_timestamp", grp(2))
          .withColumn("syslog_hostname", grp(3))
          .withColumn("syslog_program", grp(4))
          .withColumn("syslog_pid", grp(5).cast("int"))
          .withColumn("syslog_message", grp(6)))
    df = syslog_pri(df.withColumn("_pri_tmp", F.col("syslog_pri_raw")),
                    "_pri_tmp").drop("_pri_tmp")
    if tag_on_failure:
        from logstash_integration_jdbc_spark.operators.lookup import add_tags

        df = add_tags(df, ~matched | line.isNull(), tag_on_failure)
    return df
