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


def _render_d(spark, value, dtype, dialect):
    schema = T.StructType([T.StructField("v", dtype, True)])
    df = spark.createDataFrame([(value,)], schema)
    return df.select(canon_column("v", dtype, dialect=dialect).alias("c")).collect()[0]["c"]


def test_mysql_dialect_golden_strings(spark):
    """MysqlUtil.java:25,31,33 — round(convert(col,char),10) float form
    (trailing zeros dropped), trailing-NUL-trimmed UPPER hex binary,
    DATE through the '%Y-%m-%d %H:%i:%s.%f' datetime mask."""
    assert _render_d(spark, 1.5, T.DoubleType(), "mysql") == "1.5"
    assert _render_d(spark, 25.0, T.DoubleType(), "mysql") == "25"
    assert _render_d(spark, 0.04, T.DoubleType(), "mysql") == "0.04"
    assert _render_d(spark, 0.0, T.DoubleType(), "mysql") == "0"
    assert _render_d(spark, -0.25, T.DoubleType(), "mysql") == "-0.25"
    assert _render_d(spark, 0.12345678995, T.DoubleType(), "mysql") == "0.12345679"
    assert _render_d(spark, b"\x1a\x2b\x00\x00", T.BinaryType(), "mysql") == "1A2B"
    assert _render_d(spark, b"\x00\x00", T.BinaryType(), "mysql") == ""
    assert (
        _render_d(spark, datetime.date(2024, 2, 29), T.DateType(), "mysql")
        == "2024-02-29 00:00:00.000000"
    )
    assert _render_d(spark, None, T.DateType(), "mysql") == NULL_DATE_SENTINEL


def test_opengauss_dialect_golden_strings(spark):
    """OpenGaussUtil.java:38,43,45 — to_char 'fm…0000000000' float form
    (zero integer digit dropped, 10 fractional digits kept), lowercase
    hex binary, DATE through the timestamp mask."""
    assert _render_d(spark, 0.5, T.DoubleType(), "opengauss") == ".5000000000"
    assert _render_d(spark, -0.25, T.DoubleType(), "opengauss") == "-.2500000000"
    assert _render_d(spark, 25.0, T.DoubleType(), "opengauss") == "25.0000000000"
    assert _render_d(spark, 1234.5, T.DoubleType(), "opengauss") == "1234.5000000000"
    assert _render_d(spark, b"\x1a\x2b\x00", T.BinaryType(), "opengauss") == "1a2b00"
    assert (
        _render_d(spark, datetime.date(2024, 2, 29), T.DateType(), "opengauss")
        == "2024-02-29 00:00:00.000000"
    )


def test_dialect_digest_modes_differ_and_are_deterministic(spark):
    df = spark.createDataFrame([(1, 0.5), (2, 25.0)], "id long, x double")
    out = df.select(
        "id",
        row_checksum(df, cols=["x"], algo="md5", reference_compat=True,
                     dialect="mysql", out="m"),
        row_checksum(df, cols=["x"], algo="md5", reference_compat=True,
                     dialect="opengauss", out="g"),
        row_checksum(df, cols=["x"], algo="md5", reference_compat=True, out="s"),
    ).collect()
    by_id = {r.id: r for r in out}
    # 0.5: '.5000000000' vs '0.5' vs '0.5000000000' — all three diverge
    assert len({by_id[1].m, by_id[1].g, by_id[1].s}) == 3
    # 25.0: mysql drops the fraction entirely; opengauss == spark form
    assert by_id[2].m != by_id[2].s and by_id[2].g == by_id[2].s

    with pytest.raises(ValueError, match="unknown dialect"):
        canon_column("v", T.DoubleType(), dialect="oracle9i")


def test_oracle_dialect_golden_strings(spark):
    """OracleUtil.java:23,38,40,46 — 'fm' float mask, SECONDS-only
    timestamps without a NULL sentinel, lowercase hex, CHAR rtrim."""
    assert _render_d(spark, 0.5, T.DoubleType(), "oracle") == ".5000000000"
    assert _render_d(spark, 25.0, T.DoubleType(), "oracle") == "25.0000000000"
    ts = datetime.datetime(2024, 2, 29, 12, 34, 56, 789012)
    assert _render_d(spark, ts, T.TimestampType(), "oracle") == "2024-02-29 12:34:56"
    assert _render_d(spark, None, T.TimestampType(), "oracle") is None  # no nvl
    assert _render_d(spark, b"\x1a\x2b\x00", T.BinaryType(), "oracle") == "1a2b00"
    assert (
        _render_d(spark, datetime.date(2024, 2, 29), T.DateType(), "oracle")
        == "2024-02-29 00:00:00"
    )


def test_postgres_dialect_golden_strings(spark):
    """PostgresUtil.java:27,31 + default timestamp text — scale-10
    numeric floats; fraction zeros trimmed from timestamps."""
    assert _render_d(spark, 0.5, T.DoubleType(), "postgres") == "0.5000000000"
    t0 = datetime.datetime(2024, 2, 29, 12, 0, 10)
    assert _render_d(spark, t0, T.TimestampType(), "postgres") == "2024-02-29 12:00:10"
    t5 = datetime.datetime(2024, 2, 29, 12, 0, 0, 500000)
    assert _render_d(spark, t5, T.TimestampType(), "postgres") == "2024-02-29 12:00:00.5"
    t123 = datetime.datetime(2024, 2, 29, 12, 0, 0, 123400)
    assert _render_d(spark, t123, T.TimestampType(), "postgres") == "2024-02-29 12:00:00.1234"
    assert _render_d(spark, None, T.TimestampType(), "postgres") is None
    assert (
        _render_d(spark, datetime.date(2024, 2, 29), T.DateType(), "postgres") == "2024-02-29"
    )


def test_float_render_parity_vs_duckdb_randomized(spark):
    """Randomized cross-engine parity inside the guaranteed envelope
    (ulp(|x|) * 1e10 < 0.5, see canon.py): 2000 seeded decimal-authored
    doubles render byte-identically in Spark and DuckDB across the
    spark/mysql/opengauss matrices. Outside the envelope the engines
    legitimately diverge in the 10th digit (documented; that is what
    the dialect matrices are for)."""
    import random

    import duckdb
    import pandas as pd

    rng = random.Random(7)
    vals = [round(rng.uniform(-1e5, 1e5), rng.randint(0, 4)) for _ in range(1000)]
    vals += [round(rng.uniform(-1, 1), rng.randint(1, 6)) for _ in range(1000)]
    vals += [0.0, 99999.99, -99999.99, 0.000001, 0.5, -0.5]

    df = spark.createDataFrame(list(enumerate(vals)), "i long, v double")
    cols = [
        canon_column("v", T.DoubleType(), dialect=d).alias(d)
        for d in ("spark", "mysql", "opengauss")
    ]
    got = {r.i: (r.spark, r.mysql, r.opengauss) for r in df.select("i", *cols).collect()}

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(vals)), "v": vals}))
    base = "CAST(CAST(v AS DECIMAL(38,10)) AS VARCHAR)"
    my = f"regexp_replace({base}, '\\.?0+$', '')"
    og = f"regexp_replace({base}, '^(-?)0\\.', '\\1.')"
    rows = con.execute(f"SELECT i, {base}, {my}, {og} FROM t").fetchall()
    bad = [(i, got[i], (s, m, g)) for i, s, m, g in rows if got[i] != (s, m, g)]
    assert not bad, bad[:5]


def test_geometry_dialect_golden_strings(spark):
    # MysqlUtil.java:29 substring(AsText(col),6) and OpenGaussUtil.java:40
    # replace(cast(col as varchar),',',' ') converge on the same bytes
    from opengauss_tools_datachecker_spark.functions.canon import canon_geometry

    df = spark.createDataFrame(
        [
            (0, "POINT(1 2)"),
            (1, "POINT(-3.5 0.25)"),
            (2, None),
        ],
        "i long, geo string",
    )
    rows = {
        r.i: (r.my, r.og)
        for r in df.select(
            "i",
            canon_geometry("geo", dialect="mysql").alias("my"),
            canon_geometry("geo", dialect="opengauss").alias("og"),
        ).collect()
    }
    assert rows[0] == ("(1 2)", "(1 2)")
    assert rows[1] == ("(-3.5 0.25)", "(-3.5 0.25)")
    assert rows[2] == (None, None)

    # multi-part: openGauss's native comma positions come out spaced
    poly = spark.createDataFrame([("LINESTRING(0 0, 1 1)",)], "geo string")
    got = poly.select(canon_geometry("geo", dialect="opengauss").alias("og")).first()
    assert got.og == "(0 0  1 1)"

    # digest integration: geometry_cols pushes a WKT string through the
    # geometry rule; the two dialect digests agree on points
    from opengauss_tools_datachecker_spark.functions.canon import row_checksum

    pts = df.filter("geo IS NOT NULL")
    my = pts.select(
        row_checksum(pts, cols=["geo"], algo="md5", reference_compat=True,
                     dialect="mysql", geometry_cols={"geo"}).alias("d")
    ).collect()
    og = pts.select(
        row_checksum(pts, cols=["geo"], algo="md5", reference_compat=True,
                     dialect="opengauss", geometry_cols={"geo"}).alias("d")
    ).collect()
    assert [r.d for r in my] == [r.d for r in og]
