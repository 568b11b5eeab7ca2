"""JDBC source SQL-generation tests (no database needed — the query
strings ARE the pushdown contract; SURVEY §4 R1)."""

from __future__ import annotations

from d365fo_db_sync_spark.sources import jdbc


def test_top_n_sql():
    assert (
        jdbc.top_n_sql("CUSTTABLE", "RecId", 5000, ["RecId", "NAME"])
        == "SELECT TOP (5000) [RecId], [NAME] FROM [CUSTTABLE] ORDER BY [RecId] DESC"
    )
    assert jdbc.top_n_sql("T", "RecId", 10) == (
        "SELECT TOP (10) * FROM [T] ORDER BY [RecId] DESC"
    )


def test_control_sql_pruned_projection():
    sql = jdbc.control_sql("T", "RecId", "SysRowVersion", 1000)
    assert sql == (
        "SELECT TOP (1000) [RecId], [SysRowVersion] FROM [T] ORDER BY [RecId] DESC"
    )
    assert jdbc.control_sql("T", "RecId", "SysRowVersion") == (
        "SELECT [RecId], [SysRowVersion] FROM [T]"
    )


def test_watermark_sql_predicates():
    sql = jdbc.watermark_sql(
        "T", "RecId", "SysRowVersion", "0x00000000000A1B2C", 42, n=500
    )
    assert "WHERE [SysRowVersion] >= 0x00000000000A1B2C AND [RecId] >= 42" in sql
    assert sql.startswith("SELECT TOP (500) ")
    assert sql.endswith("ORDER BY [RecId] DESC")


def test_recency_sql():
    sql = jdbc.recency_sql("T", "MODIFIEDDATETIME", 93)
    assert "DATEADD(DAY, -93, GETUTCDATE())" in sql


def test_int_coercion_blocks_injection():
    # numeric slots coerce to int — non-numeric input must raise, never
    # interpolate
    import pytest

    with pytest.raises((ValueError, TypeError)):
        jdbc.top_n_sql("T", "RecId", "1; DROP TABLE x")  # type: ignore[arg-type]
    with pytest.raises((ValueError, TypeError)):
        jdbc.watermark_sql("T", "k", "v", "0x0", "7; --")  # type: ignore[arg-type]


def test_source_builds_reader_options(spark):
    src = jdbc.JdbcSource(url="jdbc:sqlserver://localhost;database=x", fetchsize=5000)
    # no connection is attempted until .load(); building the reader is
    # enough to validate the option plumbing
    reader = src._reader(spark, jdbc.top_n_sql("T", "RecId", 10))
    assert reader is not None


def test_parse_connection_string_both_formats():
    from d365fo_db_sync_spark.sources.jdbc import parse_connection_string, to_jdbc

    std = parse_connection_string(
        "Server=host.db.net; Database=axdb ;User Id=u1;Password=p=w;Encrypt=true"
    )
    assert std["server"] == "host.db.net" and std["database"] == "axdb"
    assert std["password"] == "p=w"  # '=' inside the value survives

    three = parse_connection_string("host.db.net\\axdb\nu1\npw\n")
    assert three == {
        "server": "host.db.net",
        "database": "axdb",
        "user id": "u1",
        "password": "pw",
    }
    assert parse_connection_string("") == {}
    assert parse_connection_string("only\ntwo") == {}

    url, opts = to_jdbc(std)
    assert url == "jdbc:sqlserver://host.db.net:1433;databaseName=axdb;encrypt=true"
    assert opts == {"user": "u1", "password": "p=w"}
    # credentials never leak into the URL
    assert "p=w" not in url and "u1" not in url

    url2, _ = to_jdbc({"server": "h,1544", "database": "d"})
    assert url2.startswith("jdbc:sqlserver://h:1544;")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        to_jdbc({"server": "h"})
