from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.operators import ann


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),    # near 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.98, 0.2, 0.0]),    # near 2
        (4, [-1.0, 0.0, 0.0, 0.0]),    # opposite of 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_brute_force_topk_exact(vecs):
    top1 = {
        r.query_id: r.neighbor_id
        for r in ann.brute_force_topk(vecs, "vec_id", "embedding", k=1).collect()
    }
    assert top1[0] == 1 and top1[1] == 0 and top1[2] == 3 and top1[3] == 2


def test_cosine_values(vecs, spark):
    rows = ann.brute_force_topk(vecs, "vec_id", "embedding", k=4).collect()
    sims = {(r.query_id, r.neighbor_id): r.cos_sim for r in rows}
    assert sims[(0, 4)] == -1.0
    assert abs(sims[(0, 1)] - 0.99 / math.sqrt(0.99**2 + 0.1**2)) < 1e-6


def test_lsh_recall_on_real_embeddings(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200).cache()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann.brute_force_topk(emb, "vec_id", "embedding", k=1).collect()
    }
    approx = ann.lsh_topk(emb, "vec_id", "embedding", k=1, n_planes=3, n_tables=8)
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(exact & got) / len(exact)
    assert recall > 0.5, f"LSH top-1 recall too low: {recall}"


def test_near_dup_embeddings(spark, vecs):
    dup = vecs.filter("vec_id = 0").select(
        F.lit(100).cast("long").alias("vec_id"), "embedding"
    )
    pairs = ann.near_dup_embeddings(vecs.unionByName(dup), "vec_id", "embedding", 0.99)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 100) in found


def test_exact_near_dup_pairs(spark, vecs):
    dup = vecs.filter("vec_id = 0").select(
        F.lit(100).cast("long").alias("vec_id"), "embedding"
    )
    pairs = ann.exact_near_dup_pairs(vecs.unionByName(dup), "vec_id", "embedding", 0.99)
    rows = {(r.id_a, r.id_b): r.cos_sim for r in pairs.collect()}
    assert (0, 100) in rows and rows[(0, 100)] == 1.0
    # ordering invariant: only id_a < id_b pairs, no self-pairs
    assert all(a < b for a, b in rows)
    # exact baseline is a superset of the LSH-pruned result
    lsh = ann.near_dup_embeddings(vecs.unionByName(dup), "vec_id", "embedding", 0.99)
    lsh_pairs = {(r.id_a, r.id_b) for r in lsh.collect()}
    assert lsh_pairs <= set(rows)


def test_ivf_topk_recall_and_shape(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200).cache()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann.brute_force_topk(emb, "vec_id", "embedding", k=1).collect()
    }
    rows = ann.ivf_topk(emb, "vec_id", "embedding", k=1, n_centroids=2).collect()
    got = {(r.query_id, r.neighbor_id) for r in rows}
    # nprobe=1 bounds recall by the cell-hit rate (measured ~0.64 at 2
    # cells, ~0.35 at 4 on these near-uniform vectors — production
    # raises nprobe, not the centroid count, to buy recall)
    recall = len(exact & got) / len(exact)
    assert recall > 0.5, f"IVF top-1 recall too low: {recall}"
    assert all(r.rank == 1 and r.query_id != r.neighbor_id for r in rows)


def test_ivf_assign_deterministic(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    cents = ann.ivf_centroids(64, 4)
    a1 = emb.select("vec_id", ann.ivf_assign(F.col("embedding"), cents).alias("cell"))
    a2 = emb.select("vec_id", ann.ivf_assign(F.col("embedding"), cents).alias("cell"))
    assert {(r.vec_id, r.cell) for r in a1.collect()} == {
        (r.vec_id, r.cell) for r in a2.collect()
    }
    cells = {r.cell for r in a1.collect()}
    assert cells <= set(range(4)) and len(cells) > 1
