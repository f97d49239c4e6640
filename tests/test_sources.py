"""Source-layer tests: LIKE-list table selection (F3) and the JDBC
option plumbing (S1-S3) — reader-level, no live database (none ships in
this image; the terminal load() is intercepted)."""

from __future__ import annotations

import pytest

from opengauss_tools_datachecker_spark.sources.catalog import (
    JDBC_DIALECT_FETCH,
    filter_tables,
    jdbc_reader_options,
    like_to_regex,
    read_table,
)


def test_like_to_regex_semantics():
    assert like_to_regex("t%").match("tables")
    assert like_to_regex("t_e").match("the")
    assert not like_to_regex("t_e").match("three")
    assert like_to_regex(r"a\%b").match("a%b")
    assert not like_to_regex(r"a\%b").match("aXb")
    assert like_to_regex("T%").match("tables")  # case-insensitive like the reference


def test_filter_tables_white_black():
    tables = ["orders", "orders_old", "lineitem", "tmp_scratch"]
    assert filter_tables(tables) == tables
    assert filter_tables(tables, whitelist=["orders%"]) == ["orders", "orders_old"]
    assert filter_tables(tables, whitelist=["orders%"], blacklist=["%_old"]) == ["orders"]
    assert filter_tables(tables, blacklist=["tmp_%"]) == ["orders", "orders_old", "lineitem"]


def test_jdbc_options_mysql_streaming_defaults():
    """MySQL defaults to Connector/J row-streaming fetch size — the
    reference's setFetchSize(Integer.MIN_VALUE) hint
    (DbOnceFullRecordExtractor.java:124)."""
    opts = jdbc_reader_options(
        url="jdbc:mysql://host:3306/db",
        table="src.orders",
        user="checker",
        password="pw",
        session_init="SET NAMES utf8",
    )
    assert opts["url"] == "jdbc:mysql://host:3306/db"
    assert opts["dbtable"] == "src.orders"
    assert opts["fetchsize"] == str(-(2**31))
    assert opts["sessionInitStatement"] == "SET NAMES utf8"
    assert opts["user"] == "checker" and opts["password"] == "pw"


def test_jdbc_options_dialect_fetch_and_partitioned_scan():
    opts = jdbc_reader_options(
        url="jdbc:oracle:thin:@host:1521/svc",
        query="select * from t",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=64,
    )
    assert opts["fetchsize"] == str(JDBC_DIALECT_FETCH["oracle"]) == "200"
    assert opts["query"] == "select * from t"
    assert (
        opts["partitionColumn"],
        opts["lowerBound"],
        opts["upperBound"],
        opts["numPartitions"],
    ) == ("id", "0", "1000000", "64")
    assert jdbc_reader_options(url="jdbc:opengauss://h/db", table="t")["fetchsize"] == "10000"


def test_jdbc_options_validation():
    with pytest.raises(ValueError):
        jdbc_reader_options(url="jdbc:mysql://h/db")  # neither table nor query
    with pytest.raises(ValueError):
        jdbc_reader_options(url="jdbc:mysql://h/db", table="t", query="q")  # both
    with pytest.raises(ValueError):
        jdbc_reader_options(url="mysql://h/db", table="t")  # not a jdbc url
    with pytest.raises(ValueError):
        jdbc_reader_options(
            url="jdbc:mysql://h/db", table="t", partition_column="id"
        )  # bounds missing


def test_read_table_jdbc_forwards_options(spark, monkeypatch):
    """read_table(fmt='jdbc') must construct the reader with exactly the
    supplied option map; the terminal load() (which would open a
    connection for schema inference) is intercepted."""
    from pyspark.sql.readwriter import DataFrameReader

    captured: dict = {}
    real_options = DataFrameReader.options

    def rec_options(self, **kw):
        captured.update(kw)
        return real_options(self, **kw)

    monkeypatch.setattr(DataFrameReader, "options", rec_options)
    monkeypatch.setattr(DataFrameReader, "load", lambda self, *a, **k: "LOADED")

    opts = jdbc_reader_options(
        url="jdbc:postgresql://h:5432/db", table="public.t", num_partitions=None
    )
    assert read_table(spark, fmt="jdbc", jdbc_options=opts) == "LOADED"
    assert captured == opts
    assert captured["fetchsize"] == str(JDBC_DIALECT_FETCH["postgresql"])

    with pytest.raises(ValueError):
        read_table(spark, fmt="jdbc")
    with pytest.raises(ValueError):
        read_table(spark, fmt="jdbc", jdbc_options={"url": "jdbc:x"})  # no dbtable/query
