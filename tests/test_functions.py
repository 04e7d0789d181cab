"""Timezone DST-overlap policy (F3) + charset conversion (P4)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.functions.charset import convert_charset
from logstash_integration_jdbc_spark.functions.timezone import local_to_utc


def test_unambiguous_time_same_under_both_policies(spark):
    # plain summer timestamp in Europe/Berlin (UTC+2)
    df = spark.createDataFrame([("2024-07-01 12:00:00",)], "w string") \
        .select(F.to_timestamp("w").alias("w"))
    a = df.select(local_to_utc(F.col("w"), "Europe/Berlin", False).alias("u")).first().u
    b = df.select(local_to_utc(F.col("w"), "Europe/Berlin", True).alias("u")).first().u
    assert a == b == datetime.datetime(2024, 7, 1, 10, 0)


def test_dst_overlap_policy_picks_reading(spark):
    # 2024-10-27 02:30 in Europe/Berlin happens twice: 00:30Z (DST, +02)
    # and 01:30Z (standard, +01). timezone_proxy.rb:20-38 lets the user
    # pick; dst_enabled_on_overlap:true → the DST (earlier) instant.
    df = spark.createDataFrame([("2024-10-27 02:30:00",)], "w string") \
        .select(F.to_timestamp("w").alias("w"))
    std = df.select(local_to_utc(F.col("w"), "Europe/Berlin", False).alias("u")).first().u
    dst = df.select(local_to_utc(F.col("w"), "Europe/Berlin", True).alias("u")).first().u
    assert std == datetime.datetime(2024, 10, 27, 1, 30)
    assert dst == datetime.datetime(2024, 10, 27, 0, 30)


def test_charset_latin1_reinterpretation(spark):
    # bytes of 'café' in latin-1 misread as one-byte-per-char string
    misread = "café".encode("utf-8").decode("latin-1")  # 'cafÃ©'
    df = spark.createDataFrame([(misread,)], "s string")
    out = convert_charset(df, columns_charset={"s": "ISO-8859-1"}).first().s
    assert out == "café"


def test_charset_utf8_noop(spark):
    df = spark.createDataFrame([("héllo",)], "s string")
    assert convert_charset(df, charset="UTF-8").first().s == "héllo"
