from __future__ import annotations

from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.sources.textfile import (
    read_log_lines,
    read_multiline_logs,
)


def _write_logs(tmp_path):
    (tmp_path / "app1.log").write_text(
        "ERROR boom\n  at Foo.bar\nINFO ok\n")
    (tmp_path / "app2.log").write_text(
        "INFO start\nERROR crash\n  at Baz.qux\n  at Quux.z\n")
    return str(tmp_path)


def test_read_log_lines_order_and_provenance(spark, tmp_path):
    d = _write_logs(tmp_path)
    rows = read_log_lines(spark, d).collect()
    assert len(rows) == 7
    per_file = {}
    for r in rows:
        per_file.setdefault(r["source"].rsplit("/", 1)[-1], []).append(
            (r["line_no"], r["line"]))
    assert sorted(per_file["app1.log"]) == [
        (0, "ERROR boom"), (1, "  at Foo.bar"), (2, "INFO ok")]
    assert sorted(per_file["app2.log"])[0] == (0, "INFO start")


def test_read_log_lines_wholetext(spark, tmp_path):
    d = _write_logs(tmp_path)
    rows = read_log_lines(spark, d, wholetext=True).collect()
    assert len(rows) == 2
    assert all(r["line_no"] == 0 and "\n" in r["line"] for r in rows)


def test_read_multiline_logs(spark, tmp_path):
    d = _write_logs(tmp_path)
    out = read_multiline_logs(
        spark, d, ~F.col("line").startswith("  ")).collect()
    msgs = {(r["source"].rsplit("/", 1)[-1], r["event_no"]): r["message"]
            for r in out}
    assert msgs[("app1.log", 1)] == "ERROR boom\n  at Foo.bar"
    assert msgs[("app1.log", 2)] == "INFO ok"
    assert msgs[("app2.log", 2)] == "ERROR crash\n  at Baz.qux\n  at Quux.z"
    assert not any(r["orphaned"] for r in out)


def test_gzip_transparent(spark, tmp_path):
    import gzip

    with gzip.open(tmp_path / "z.log.gz", "wt") as f:
        f.write("a\nb\n")
    rows = read_log_lines(spark, str(tmp_path)).orderBy("line_no").collect()
    assert [r["line"] for r in rows] == ["a", "b"]
