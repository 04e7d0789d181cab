"""JDBC source adapter: option translation (pure), plus REAL
`spark.read.format("jdbc")` round-trips against the in-memory Derby
that ships inside pyspark's jars — the same embedded database the
reference uses for its jdbc_static local store (jdbc_static.rb
loaders), so this is the closest in-sandbox stand-in for the
reference's integration suite (jdbc_spec.rb)."""

import datetime as dt

import pytest

from logstash_integration_jdbc_spark.sources.jdbc import (
    explicit_page_predicates,
    jdbc_reader_options,
    read_jdbc,
    read_jdbc_explicit_pages,
    sql_literal,
    substitute_sql_params,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby(spark, name, rows=100):
    """Create an in-memory Derby db (same JVM as local-mode executors)
    with `logs(id INT, msg VARCHAR, ts TIMESTAMP)` and n seeded rows."""
    url = f"jdbc:derby:memory:{name};create=true"
    jvm = spark.sparkContext._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE logs (id INT NOT NULL, msg VARCHAR(64), "
               "ts TIMESTAMP, PRIMARY KEY (id))")
    ps = conn.prepareStatement("INSERT INTO logs VALUES (?, ?, ?)")
    base = jvm.java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    for i in range(rows):
        ps.setInt(1, i)
        ps.setString(2, f"event-{i % 7}")
        ps.setTimestamp(3, jvm.java.sql.Timestamp(
            base.getTime() + i * 60_000))
        ps.executeUpdate()
    st.close(); ps.close(); conn.close()
    return url


# -- pure option translation (no database) --------------------------------

def test_sql_literal_quoting():
    assert sql_literal(None) == "NULL"
    assert sql_literal(True) == "TRUE"
    assert sql_literal(42) == "42"
    assert sql_literal(1.5) == "1.5"
    assert sql_literal("o'brien") == "'o''brien'"
    assert sql_literal(dt.date(2024, 1, 2)) == "{d '2024-01-02'}"
    assert (sql_literal(dt.datetime(2024, 1, 2, 3, 4, 5))
            == "{ts '2024-01-02 03:04:05'}")
    with pytest.raises(TypeError):
        sql_literal(object())


def test_substitute_sql_params_longest_first():
    out = substitute_sql_params(
        "SELECT * FROM t WHERE id > :sql_last_value AND k = :sql",
        {"sql": "x"}, sql_last_value=7)
    assert out == "SELECT * FROM t WHERE id > 7 AND k = 'x'"
    # unknown markers survive untouched (the DB reports them)
    assert ":nope" in substitute_sql_params("SELECT :nope", {})


def test_jdbc_reader_options_mapping():
    opts = jdbc_reader_options(
        jdbc_connection_string="jdbc:postgresql://db/x",
        jdbc_user="u", jdbc_password="p",
        jdbc_driver_class="org.postgresql.Driver",
        jdbc_fetch_size=5000,
        statement="SELECT * FROM logs WHERE id > :sql_last_value",
        sql_last_value=10)
    assert opts == {
        "url": "jdbc:postgresql://db/x", "user": "u", "password": "p",
        "driver": "org.postgresql.Driver", "fetchsize": "5000",
        "query": "SELECT * FROM logs WHERE id > 10",
    }


def test_jdbc_reader_options_paging_partitions():
    opts = jdbc_reader_options(
        jdbc_connection_string="jdbc:x", statement="SELECT * FROM logs",
        jdbc_paging_enabled=True, jdbc_page_size=25,
        tracking_column="id", bounds=(0, 99))
    assert opts["dbtable"] == "(SELECT * FROM logs) SPARK_GEN_SUBQ"
    assert opts["partitionColumn"] == "id"
    assert (opts["lowerBound"], opts["upperBound"]) == ("0", "99")
    assert opts["numPartitions"] == "4"  # ceil(99/25)
    # connection cap: a 100-TB-scale read must not open unbounded conns
    capped = jdbc_reader_options(
        jdbc_connection_string="jdbc:x", statement="SELECT * FROM logs",
        jdbc_paging_enabled=True, jdbc_page_size=1,
        tracking_column="id", bounds=(0, 10_000_000), max_partitions=64)
    assert capped["numPartitions"] == "64"


def test_jdbc_reader_options_paging_validation():
    with pytest.raises(ValueError, match="tracking_column"):
        jdbc_reader_options(jdbc_connection_string="jdbc:x",
                            statement="SELECT 1", jdbc_paging_enabled=True)
    with pytest.raises(ValueError, match="bounds"):
        jdbc_reader_options(jdbc_connection_string="jdbc:x",
                            statement="SELECT 1", jdbc_paging_enabled=True,
                            tracking_column="id")


def test_explicit_page_predicates():
    preds = explicit_page_predicates(3, 10, "id")
    assert preds == ["id >= 0 AND id < 10",
                     "id >= 10 AND id < 20",
                     "id >= 20 AND id < 30"]
    with pytest.raises(ValueError):
        explicit_page_predicates(0, 10, "id")


# -- real Derby round-trips ------------------------------------------------

def test_read_jdbc_full_scan(spark):
    url = _derby(spark, "full1")
    df = read_jdbc(spark, jdbc_connection_string=url,
                   jdbc_driver_class=DERBY_DRIVER,
                   statement="SELECT id, msg, ts FROM logs")
    assert df.columns == ["id", "msg", "ts"]  # P1 lowercase
    rows = df.orderBy("id").collect()
    assert len(rows) == 100
    assert rows[0].id == 0 and rows[0].msg == "event-0"
    assert rows[13].ts == dt.datetime(2024, 1, 1, 0, 13)


def test_read_jdbc_incremental_sql_last_value(spark):
    """S2 over JDBC: the watermark is substituted into the statement
    TEXT, so the filter runs ON the database (jdbc_spec.rb's
    sql_last_value cases)."""
    url = _derby(spark, "incr1")
    df = read_jdbc(
        spark, jdbc_connection_string=url, jdbc_driver_class=DERBY_DRIVER,
        statement="SELECT id FROM logs WHERE id > :sql_last_value",
        sql_last_value=89)
    assert sorted(r.id for r in df.collect()) == list(range(90, 100))
    # timestamp watermark renders as a TIMESTAMP literal Derby accepts
    df2 = read_jdbc(
        spark, jdbc_connection_string=url, jdbc_driver_class=DERBY_DRIVER,
        statement="SELECT id FROM logs WHERE ts > :sql_last_value",
        sql_last_value=dt.datetime(2024, 1, 1, 1, 35))
    assert df2.count() == 4  # minutes 96..99


def test_read_jdbc_auto_paging_partitions(spark):
    """S4 auto paging: page_size=25 over ids 0..99 → 4 range partitions,
    all rows exactly once, bounds auto-discovered."""
    url = _derby(spark, "page1")
    df = read_jdbc(spark, jdbc_connection_string=url,
                   jdbc_driver_class=DERBY_DRIVER,
                   statement="SELECT id, msg FROM logs",
                   jdbc_paging_enabled=True, jdbc_page_size=25,
                   tracking_column="id")
    assert df.rdd.getNumPartitions() == 4
    assert sorted(r.id for r in df.collect()) == list(range(100))


def test_read_jdbc_auto_paging_empty_result(spark):
    url = _derby(spark, "page2", rows=0)
    df = read_jdbc(spark, jdbc_connection_string=url,
                   jdbc_driver_class=DERBY_DRIVER,
                   statement="SELECT id FROM logs",
                   jdbc_paging_enabled=True, jdbc_page_size=25,
                   tracking_column="id")
    assert df.count() == 0


def test_read_jdbc_explicit_pages(spark):
    url = _derby(spark, "expl1")
    df = read_jdbc_explicit_pages(
        spark, n_pages=5, order_column="id",
        jdbc_connection_string=url, jdbc_driver_class=DERBY_DRIVER,
        statement="SELECT id, msg FROM logs", jdbc_page_size=20)
    assert df.rdd.getNumPartitions() == 5
    assert sorted(r.id for r in df.collect()) == list(range(100))


def test_read_jdbc_fetch_size_passthrough(spark):
    url = _derby(spark, "fs1", rows=10)
    df = read_jdbc(spark, jdbc_connection_string=url,
                   jdbc_driver_class=DERBY_DRIVER, jdbc_fetch_size=2,
                   statement="SELECT id FROM logs")
    assert df.count() == 10
