"""Canonicalization unit tests — SURVEY.md §7 'where silent divergence lives'."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from opengauss_tools_datachecker_spark.functions.canon import (
    NULL_DATE_SENTINEL,
    canon_column,
    row_checksum,
)


def _render(spark, value, dtype):
    schema = T.StructType([T.StructField("v", dtype, True)])
    df = spark.createDataFrame([(value,)], schema)
    return df.select(canon_column("v", dtype).alias("c")).collect()[0]["c"]


def test_integer_and_bool(spark):
    assert _render(spark, 42, T.LongType()) == "42"
    assert _render(spark, True, T.BooleanType()) == "1"
    assert _render(spark, False, T.BooleanType()) == "0"


def test_float_fixed_ten_decimals(spark):
    assert _render(spark, 17.0, T.DoubleType()) == "17.0000000000"
    assert _render(spark, 0.04, T.DoubleType()) == "0.0400000000"
    assert _render(spark, -1.5, T.DoubleType()) == "-1.5000000000"


def test_timestamp_and_null_sentinel(spark):
    ts = datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)
    assert _render(spark, ts, T.TimestampNTZType()) == "2024-01-02 03:04:05.123456"
    assert _render(spark, None, T.TimestampNTZType()) == NULL_DATE_SENTINEL
    assert _render(spark, datetime.date(2024, 1, 2), T.DateType()) == "2024-01-02"


def test_binary_hex(spark):
    assert _render(spark, bytearray(b"\x00\xff"), T.BinaryType()) == "00ff"


def test_array_to_json(spark):
    assert _render(spark, [1, 2], T.ArrayType(T.IntegerType())) == "[1,2]"


def test_null_adjacency_no_collision(spark):
    """(NULL,'a') and ('a',NULL) must produce DIFFERENT checksums — the
    concat_ws skip-NULL collision of the reference (SURVEY.md §1.4) is
    fixed by the NULL sentinel in default mode."""
    df = spark.createDataFrame([(None, "a"), ("a", None)], "x string, y string")
    digests = [r["checksum"] for r in df.select(row_checksum(df)).collect()]
    assert digests[0] != digests[1]


def test_boundary_no_collision(spark):
    """('ab','c') vs ('a','bc') differ under the unit separator."""
    df = spark.createDataFrame([("ab", "c"), ("a", "bc")], "x string, y string")
    digests = [r["checksum"] for r in df.select(row_checksum(df)).collect()]
    assert digests[0] != digests[1]


def test_reference_compat_mode_collides(spark):
    """reference_compat reproduces the reference's exact semantics,
    including its documented collision."""
    df = spark.createDataFrame([(None, "a"), ("a", None)], "x string, y string")
    digests = [
        r["checksum"] for r in df.select(row_checksum(df, reference_compat=True)).collect()
    ]
    assert digests[0] == digests[1]


def test_checksum_deterministic_across_repartition(spark):
    df = spark.createDataFrame([(i, f"s{i}") for i in range(100)], "id long, s string")
    a = sorted(r["checksum"] for r in df.select(row_checksum(df)).collect())
    b = sorted(r["checksum"] for r in df.repartition(7).select(row_checksum(df)).collect())
    assert a == b


def test_reencode_roundtrip_and_lossy(spark):
    from opengauss_tools_datachecker_spark.functions.canon import reencode

    df = spark.createDataFrame([("héllo wörld",), ("plain",)], "s string")
    # UTF-8 -> UTF-8 is the identity (the normal deployment)
    same = df.select(reencode("s", "UTF-8", "UTF-8").alias("r")).collect()
    assert [r.r for r in same] == ["héllo wörld", "plain"]
    # Spark 4 decodes strictly: unmappable bytes are a data FINDING
    # (MALFORMED_CHARACTER_CODING), unlike the reference's silent REPLACE
    with pytest.raises(Exception, match="MALFORMED_CHARACTER_CODING"):
        df.select(reencode("s", "UTF-8", "US-ASCII").alias("r")).collect()
