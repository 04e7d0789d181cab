"""Parameter schemes (J4) — field ref / %{...} interpolation / constant,
vs /root/reference/lib/logstash/plugin_mixins/jdbc_streaming/parameter_handler.rb
and lookup.rb sprintf_or_get."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.functions.interpolate import (
    field_ref,
    param_expr,
    sprintf_expr,
)


def test_field_ref_plain_and_bracketed(spark):
    df = spark.createDataFrame([("x", ("y",))], "a string, n struct<b:string>")
    row = df.select(field_ref("a").alias("p"), field_ref("[n][b]").alias("q")).first()
    assert row.p == "x" and row.q == "y"


def test_sprintf_like_pattern(spark):
    # "%%{[ip]}" → LIKE pattern "%<ip>" (spec/filters/jdbc_static_spec.rb:23-25)
    df = spark.createDataFrame([("10.1.1.1",)], "ip string")
    row = df.select(sprintf_expr("%%{[ip]}").alias("p")).first()
    assert row.p == "%10.1.1.1"


def test_sprintf_mixed_segments(spark):
    df = spark.createDataFrame([("a", 7)], "k string, v int")
    row = df.select(sprintf_expr("key=%{k}/v=%{[v]}!").alias("p")).first()
    assert row.p == "key=a/v=7!"


def test_constant_param_never_invalid(spark):
    expr, invalid = param_expr(42)
    assert invalid is None
    df = spark.range(1)
    assert df.select(expr.alias("c")).first().c == 42


def test_field_param_invalid_when_null(spark):
    expr, invalid = param_expr("[tool]")
    df = spark.createDataFrame([("a",), (None,)], "tool string")
    rows = df.select(expr.alias("k"), invalid.alias("inv")).collect()
    assert [r.inv for r in rows] == [False, True]


def test_classify_bind_value_schemes():
    from logstash_integration_jdbc_spark.functions.interpolate import (
        classify_bind_value,
    )

    # parameter_handler.rb:19-34 parity
    assert classify_bind_value(2) == "constant"
    assert classify_bind_value(1.5) == "constant"
    assert classify_bind_value("%{[ip]}-x") == "interpolated"
    assert classify_bind_value("[ip]") == "field"
    assert classify_bind_value(" [a] [b] ") == "field"
    assert classify_bind_value("ip") == "constant"
    assert classify_bind_value("tokyo") == "constant"
    # degenerate empty ref: the reference's index('%{')/index('}') probe
    # (parameter_handler.rb:26) classifies "%{}" as interpolated (ADVICE r4)
    assert classify_bind_value("%{}") == "interpolated"


def test_prepared_statement_constant_warning(caplog):
    """jdbc_streaming_spec.rb 'warns on constant usage' /
    'using one variable and one constant' parity."""
    import logging

    from logstash_integration_jdbc_spark.functions.interpolate import (
        warn_on_string_constants,
    )
    from logstash_integration_jdbc_spark.sources.scan import (
        validate_prepared_statement_mode,
    )

    # ["[ip]", 2]: field + numeric constant — no warning
    with caplog.at_level(logging.WARNING):
        assert warn_on_string_constants(["[ip]", 2]) == []
    assert not caplog.records

    # ["ip", 2]: bare string binds as a constant — warned, named
    with caplog.at_level(logging.WARNING):
        assert warn_on_string_constants(["ip", 2]) == ["ip"]
    assert any("treated as constants" in r.getMessage() for r in caplog.records)

    # flows through prepared-statement validation (default-on, off-able)
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        errs = validate_prepared_statement_mode(
            "SELECT * FROM t WHERE a = ? AND b = ?", ["ip", 2], name="p1")
    assert errs == []
    assert any("treated as constants" in r.getMessage() for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        validate_prepared_statement_mode(
            "SELECT * FROM t WHERE a = ? AND b = ?", ["ip", 2], name="p1",
            warn_on_constant_usage=False)
    assert not caplog.records
