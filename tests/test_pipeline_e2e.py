"""End-to-end training-data pipeline: the operators COMPOSE.

corpus → quality gate → exact-dedup keep → train/test hash split →
decontamination → token counting → sequence packing. Each stage is an
operator tested in isolation elsewhere; this test pins the composed
invariants a pipeline user actually relies on — and that the stages
agree on ids, schemas, and determinism when chained.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opengauss_tools_datachecker_spark.functions import text as tx
from opengauss_tools_datachecker_spark.operators import contamination as ctm
from opengauss_tools_datachecker_spark.operators.packing import pack_sequences, pack_stats


def _corpus(spark):
    base = [
        (i, " ".join(f"w{(i * 7 + j) % 97} t{(i + j) % 53}" for j in range(40)))
        for i in range(120)
    ]
    dups = [(1000 + i, base[i][1]) for i in range(10)]            # exact dups
    junk = [(2000 + i, "x") for i in range(5)]                    # fails quality
    return spark.createDataFrame(base + dups + junk, "doc_id long, text string")


def test_full_training_pipeline_composes(spark):
    docs = _corpus(spark).cache()

    # 1. quality gate (codegen expressions)
    kept = docs.filter(tx.quality_score("text") >= 0.5)
    assert kept.filter(F.col("doc_id") >= 2000).count() == 0

    # 2. exact dedup: smallest doc_id per digest survives
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    deduped = (
        kept.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    )
    assert deduped.filter(F.col("doc_id") >= 1000).count() == 0  # dups lost to originals

    # 3. deterministic split + 4. decontamination of train vs test
    split = ctm.hash_split(deduped, "doc_id")
    train = split.filter("split = 'train'")
    test = split.filter("split = 'test'")
    keep_ids = ctm.decontaminated_train_ids(
        train, test, "doc_id", "text", shingle_n=3, min_overlap=2
    )
    # keep-list is a subset of train and disjoint from test
    assert keep_ids.join(train, "doc_id", "left_anti").count() == 0
    assert keep_ids.join(test, "doc_id", "left_semi").count() == 0

    # 5. token counting (codegen) + 6. packing under a budget
    counted = (
        train.join(keep_ids, "doc_id", "left_semi")
        .select("doc_id", F.size(tx.tokens("text")).alias("n_tok"))
    )
    packed = pack_sequences(counted, "doc_id", "n_tok", budget=256)
    # every kept train doc lands in exactly one pack; totals preserved
    assert packed.count() == counted.count()
    stats = pack_stats(packed)
    total = counted.agg(F.sum("n_tok")).first()[0]
    assert stats.agg(F.sum("pack_tokens")).first()[0] == total
    # every non-final pack starts below budget boundary by construction
    assert packed.filter(F.col("pack_offset") < 0).count() == 0
    # deterministic under repartitioning — the whole chain replays
    packed2 = pack_sequences(counted.repartition(7), "doc_id", "n_tok", budget=256)
    assert sorted(map(tuple, packed.collect())) == sorted(map(tuple, packed2.collect()))
