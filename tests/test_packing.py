"""Sequence packing: semantics + DuckDB windowed-sum twin."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.operators.packing import pack_sequences, pack_stats


def test_pack_sequences_semantics(spark):
    rows = [(i, 30) for i in range(10)]  # 10 docs x 30 tokens, budget 100
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {r.doc_id: (r.pack_id, r.pack_offset) for r in
           pack_sequences(df, "doc_id", "n_tok", budget=100).collect()}
    # cum_before: 0,30,60,90,120,... -> packs 0,0,0,0,1,1,1,2,2,2
    assert [got[i][0] for i in range(10)] == [0, 0, 0, 0, 1, 1, 1, 2, 2, 2]
    assert got[4] == (1, 120)

    stats = {r.pack_id: (r.n_docs, r.pack_tokens) for r in
             pack_stats(pack_sequences(df, "doc_id", "n_tok", budget=100)).collect()}
    assert stats == {0: (4, 120), 1: (3, 90), 2: (3, 90)}


def test_pack_sequences_sharded_and_stable(spark):
    rows = [(s, i, 10 + (i * 7) % 23) for s in ("a", "b") for i in range(50)]
    df = spark.createDataFrame(rows, "shard string, doc_id long, n_tok long")
    packed = pack_sequences(df, "doc_id", "n_tok", budget=64, by=["shard"])
    # each shard starts at pack 0 independently
    firsts = {r.shard: r.pack_id for r in packed.filter("doc_id = 0").collect()}
    assert firsts == {"a": 0, "b": 0}
    # stable under repartitioning (deterministic order, not arrival order)
    re = pack_sequences(df.repartition(13), "doc_id", "n_tok", budget=64, by=["shard"])
    assert sorted(map(tuple, packed.collect())) == sorted(map(tuple, re.collect()))


def test_pack_sequences_matches_duckdb_windowed_sum(spark):
    rows = [(s, i, 5 + (i * 13) % 40) for s in range(4) for i in range(200)]
    df = spark.createDataFrame(rows, "shard int, doc_id long, n_tok long")
    got = sorted(
        map(tuple, pack_sequences(df, "doc_id", "n_tok", budget=128, by=["shard"]).collect())
    )
    con = duckdb.connect()
    con.sql("CREATE TABLE t (shard int, doc_id bigint, n_tok bigint)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.sql("""
        SELECT shard, doc_id, n_tok,
               COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pack_offset,
               CAST(FLOOR(COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 128) AS INT)
                 AS pack_id
        FROM t
    """).fetchall()))
    assert got == want


def test_pack_budget_validation(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tok long")
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "n_tok", budget=0)


def test_pack_sequences_sharded_plan_single_exchange(spark):
    # the scale property: sharded packing is ONE hash exchange on the
    # shard cols + a sort-based window — no extra shuffles sneak in
    rows = [(s, i, 10) for s in ("a", "b") for i in range(20)]
    df = spark.createDataFrame(rows, "shard string, doc_id long, n_tok long")
    plan = (
        pack_sequences(df, "doc_id", "n_tok", budget=64, by=["shard"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
