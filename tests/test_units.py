"""bytes / tld filter tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.functions.units import (
    bytes_expr,
    parse_bytes,
    tld_split,
)


def test_parse_bytes_binary_and_metric(spark):
    rows = [(1, "10 MB"), (2, "1.5GiB"), (3, "512"), (4, "2kb"),
            (5, "junk"), (6, None), (7, "3 TB")]
    df = spark.createDataFrame(rows, "id int, s string")
    out = {r["id"]: (r["bytes"], r["tags"])
           for r in parse_bytes(df, "s").collect()}
    assert out[1][0] == 10 * 1024 ** 2
    assert out[2][0] == 1.5 * 1024 ** 3
    assert out[3][0] == 512.0
    assert out[4][0] == 2 * 1024.0
    assert out[5][0] is None and "_bytesparsefailure" in out[5][1]
    assert out[6][0] is None and out[6][1] == []   # null input: no tag
    assert out[7][0] == 3 * 1024 ** 4

    metric = {r["id"]: r["bytes"]
              for r in parse_bytes(df, "s",
                                   conversion_method="metric").collect()}
    assert metric[1] == 10 * 1000 ** 2
    assert metric[2] == 1.5 * 1024 ** 3   # explicit GiB stays binary
    assert metric[4] == 2000.0

    with pytest.raises(ValueError):
        bytes_expr(F.col("s"), conversion_method="nope")


def test_tld_split(spark):
    rows = [
        (1, "www.example.com"),
        (2, "a.b.example.co.uk"),
        (3, "example.org"),
        (4, "localhost"),          # no suffix beyond itself → nulls
        (5, "not a host!"),
        (6, "WWW.Example.COM"),    # case-folded
    ]
    df = spark.createDataFrame(rows, "id int, h string")
    out = {r["id"]: (r["tld_tld"], r["tld_domain"], r["tld_subdomain"])
           for r in tld_split(df, "h").collect()}
    assert out[1] == ("com", "example.com", "www")
    assert out[2] == ("co.uk", "example.co.uk", "a.b")
    assert out[3] == ("org", "example.org", None)
    assert out[4] == (None, None, None)
    assert out[5] == (None, None, None)
    assert out[6] == ("com", "example.com", "www")
