from __future__ import annotations

from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.operators.checksum import (
    checksum_table,
    multiset_diff,
    recover_rows,
    symmetric_diff,
)


def _sides(spark):
    src = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (3, "c")], "id long, v string"
    )
    tgt = spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], "id long, v string")
    return src, tgt


def test_symmetric_diff_reference_semantics(spark):
    src, tgt = _sides(spark)
    a = checksum_table(src, ["id"])
    b = checksum_table(tgt, ["id"])
    diff = symmetric_diff(a, b).collect()
    sides = {r["side"] for r in diff}
    # (2,'b') only in source, (2,'B') only in target; the 3-duplicate is
    # invisible (reference's blindness, reproduced on purpose)
    assert len(diff) == 2 and sides == {"source_only", "target_only"}


def test_multiset_diff_catches_duplicates(spark):
    src, tgt = _sides(spark)
    a = checksum_table(src, ["id"])
    b = checksum_table(tgt, ["id"])
    diff = multiset_diff(a, b).collect()
    assert len(diff) == 3  # b-mismatch both ways + the 2-vs-1 duplicate
    assert any(r["n_source"] == 2 and r["n_target"] == 1 for r in diff)


def test_recover_rows(spark):
    src, tgt = _sides(spark)
    a = checksum_table(src, ["id"])
    b = checksum_table(tgt, ["id"])
    missing = symmetric_diff(a, b).filter("side = 'source_only'")
    rows = recover_rows(src, missing, on="checksum", value_cols=["v"]).collect()
    assert [(r["id"], r["v"]) for r in rows] == [(2, "b")]


def test_empty_tables(spark):
    empty = spark.createDataFrame([], "id long, v string")
    a = checksum_table(empty, ["id"])
    assert symmetric_diff(a, a).count() == 0
    assert multiset_diff(a, a).count() == 0


def test_column_diff_localizes_changed_columns(spark):
    from opengauss_tools_datachecker_spark.operators.checksum import column_diff

    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.0), (3, "c", 3.0)], "id long, s string, x double"
    )
    tgt = spark.createDataFrame(
        [(1, "a", 1.5), (2, "B", 2.0), (3, "c", 4.25)], "id long, s string, x double"
    )
    rows = sorted(
        (r["id"], r["column_name"], r["source_value"], r["target_value"])
        for r in column_diff(src, tgt, key_cols=["id"]).collect()
    )
    # exactly one row per (key, differing column); canon decimal(38,10)
    # rendering for the double column
    assert rows == [
        (2, "s", "b", "B"),
        (3, "x", "3.0000000000", "4.2500000000"),
    ]


def test_column_diff_null_semantics(spark):
    from opengauss_tools_datachecker_spark.operators.checksum import column_diff

    src = spark.createDataFrame([(1, "a"), (2, None)], "id long, s string")
    tgt = spark.createDataFrame([(1, None), (2, None)], "id long, s string")
    rows = column_diff(src, tgt, key_cols=["id"]).collect()
    # value -> NULL is a finding; NULL == NULL is not
    assert [(r["id"], r["source_value"], r["target_value"]) for r in rows] == [(1, "a", None)]


def test_column_diff_unpivots_only_mismatched_rows(spark):
    from opengauss_tools_datachecker_spark.operators.checksum import column_diff

    src = spark.createDataFrame([(i, "v", float(i)) for i in range(100)],
                                "id long, s string, x double")
    tgt = src.withColumn("x", F.when(F.col("id") == 7, 99.0).otherwise(F.col("x")))
    plan = column_diff(src, tgt, key_cols=["id"])._jdf.queryExecution().optimizedPlan().toString()
    # the any-differs filter must sit BELOW the stack/Generate so the
    # unpivot runs on O(mismatches), not O(rows)
    gen_pos = plan.find("Generate")
    assert gen_pos != -1
    below = plan[gen_pos:]
    assert "Filter" in below and "Join" in below


def test_column_diff_agrees_with_row_digest(spark):
    """Metamorphic consistency: a key appears in column_diff iff its row
    checksum differs — the two views of 'modified' must coincide for
    any perturbation."""
    from opengauss_tools_datachecker_spark.operators.checksum import column_diff

    src = spark.createDataFrame(
        [(i, f"s{i % 7}", float(i) / 3.0, i % 5) for i in range(300)],
        "id long, s string, x double, k long",
    )
    tgt = (
        src.withColumn("x", F.when(F.col("id") % 11 == 0, F.col("x") * 2 + 1).otherwise(F.col("x")))
        .withColumn("s", F.when(F.col("id") % 13 == 0, F.lit(None)).otherwise(F.col("s")))
        .withColumn("k", F.when(F.col("id") % 17 == 0, F.col("k") + 10).otherwise(F.col("k")))
    )
    diff_keys = {
        r["id"] for r in column_diff(src, tgt, key_cols=["id"]).select("id").distinct().collect()
    }
    a = checksum_table(src, ["id"]).withColumnRenamed("checksum", "ca")
    b = checksum_table(tgt, ["id"]).withColumnRenamed("checksum", "cb")
    digest_keys = {
        r["id"]
        for r in a.join(b, "id").filter(~F.col("ca").eqNullSafe(F.col("cb"))).collect()
    }
    assert diff_keys == digest_keys and len(diff_keys) > 0
