"""Train/eval hash split + n-gram contamination (operators/contamination)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from opengauss_tools_datachecker_spark.operators.contamination import (
    BLOOM_BITS,
    _bloom_positions,
    bloom_decontamination,
    bloom_flagged_train,
    decontaminated_train_ids,
    eval_bloom_bitmap,
    hash_split,
    ngram_contamination,
    split_thresholds,
)


def _prefix(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()[:8].rjust(9, "0")


def test_split_thresholds_cover_space_and_validate():
    t = split_thresholds({"test": 0.10, "valid": 0.10, "train": 0.80})
    assert [name for name, _ in t] == ["test", "valid", "train"]
    # final bound is the clamped full space: no unassigned sliver
    assert t[-1][1] == f"{16**8:09x}"
    assert t[0][1] < t[1][1] < t[2][1]
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.4})


def test_hash_split_matches_python_md5_and_is_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    bounds = split_thresholds({"test": 0.10, "valid": 0.10, "train": 0.80})
    for i in [0, 1, 7, 42, 999, 1999]:
        p = _prefix(str(i))
        expect = next(name for name, b in bounds if p < b)
        assert got[i] == expect, i
    # deterministic: a second run assigns identically
    again = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    assert got == again
    # fractions land near the targets (md5 uniformity)
    n = len(got)
    frac_test = sum(1 for v in got.values() if v == "test") / n
    assert 0.06 < frac_test < 0.14


def test_hash_split_is_map_only(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = hash_split(df, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_split_salt_derives_independent_split(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", salt="s2").collect()}
    assert a != b  # some docs move between splits under a new salt


@pytest.fixture(scope="module")
def corpus(spark):
    leak = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        Row(doc_id=1, text=leak),  # train, leaked
        Row(doc_id=2, text="completely unrelated training text about spark shuffles"),
        Row(doc_id=3, text=leak + " extra trailing words here"),  # train, leaked too
        Row(doc_id=4, text="another clean training document body"),
    ]
    evals = [
        Row(doc_id=100, text="prefix words then " + leak),  # contaminated
        Row(doc_id=101, text="nothing in common with anything at all"),
    ]
    return spark.createDataFrame(rows), spark.createDataFrame(evals)


def test_contamination_finds_leaked_docs(corpus):
    train, ev = corpus
    pairs = {
        (r["eval_id"], r["train_id"]): r["n_overlap"]
        for r in ngram_contamination(train, ev, "doc_id", "text", min_overlap=2).collect()
    }
    assert (100, 1) in pairs and (100, 3) in pairs
    assert all(eid != 101 for eid, _ in pairs)
    # doc 1 is a 10-token doc fully inside eval 100: 8 shared 3-grams
    assert pairs[(100, 1)] == 8


def test_contamination_df_cap_drops_boilerplate(spark, corpus):
    _, ev = corpus
    # the leaked shingles appear in 3 train docs -> cap of 2 drops them
    boiler = "the quick brown fox jumps over the lazy dog tonight"
    train = spark.createDataFrame(
        [Row(doc_id=i, text=boiler) for i in range(1, 4)]
    )
    with_cap = ngram_contamination(
        train, ev, "doc_id", "text", min_overlap=2, max_shingle_df=2
    ).count()
    without = ngram_contamination(train, ev, "doc_id", "text", min_overlap=2).count()
    assert without == 3 and with_cap == 0


def test_decontaminated_keep_list(corpus):
    train, ev = corpus
    keep = {
        r["doc_id"]
        for r in decontaminated_train_ids(train, ev, "doc_id", "text", min_overlap=2).collect()
    }
    assert keep == {2, 4}


def test_bloom_positions_are_20_bit_md5_slices():
    h = hashlib.md5(b"the quick brown").hexdigest()
    pos = _bloom_positions(h)
    assert pos == [int(h[8 * i + 3 : 8 * i + 8], 16) for i in range(4)]
    assert all(0 <= p < BLOOM_BITS for p in pos)


def test_bloom_flags_leaked_docs(corpus):
    train, ev = corpus
    flagged = {
        r["train_id"]: r["n_hits"]
        for r in bloom_decontamination(train, ev, "doc_id", "text", min_overlap=2).collect()
    }
    # the exact join's dirty set must be flagged (bloom has no false
    # NEGATIVES — every truly shared shingle tests positive)
    assert {1, 3} <= set(flagged)
    assert flagged[1] >= 8  # all 8 shared 3-grams hit (+ possible FPs)
    exact_dirty = {
        r["train_id"]
        for r in ngram_contamination(train, ev, "doc_id", "text", min_overlap=2).collect()
    }
    assert exact_dirty <= set(flagged)


def test_bloom_train_side_is_map_only(corpus):
    """The scale property: the train pass is a pure map — the eval set
    rides a broadcast variable, so the executed plan contains no
    Exchange at all."""
    train, ev = corpus
    bitmap = eval_bloom_bitmap(ev, "doc_id", "text")
    assert bitmap.nbytes == BLOOM_BITS // 8  # 128 KiB regardless of eval size
    flagged = bloom_flagged_train(train, bitmap, "doc_id", "text", min_overlap=2)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bloom_no_false_negatives_on_synthetic_corpus(spark):
    """Soundness: the exact join's dirty train set is ALWAYS a subset of
    the bloom flags (a truly shared shingle can't test negative — only
    extra false POSITIVES are possible). Checked over a deterministic
    120-doc corpus with planted partial overlaps of varying length."""
    def words(seed, n):
        return " ".join(
            hashlib.md5(f"{seed}_{i}".encode()).hexdigest()[:6] for i in range(n)
        )

    train_rows = []
    for i in range(100):
        body = words(f"t{i}", 8 + i % 12)
        if i % 7 == 0:  # plant a leak: shares a 4..9-word span with eval doc i%10
            body = words(f"e{i % 10}", 4 + i % 6) + " " + body
        train_rows.append((i, body))
    eval_rows = [(1000 + j, words(f"e{j}", 15)) for j in range(10)]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")

    exact_dirty = {
        r["train_id"]
        for r in ngram_contamination(train, ev, "doc_id", "text", min_overlap=2).collect()
    }
    flagged = {
        r["train_id"]
        for r in bloom_decontamination(train, ev, "doc_id", "text", min_overlap=2).collect()
    }
    assert exact_dirty, "fixture must plant real leaks"
    assert exact_dirty <= flagged


def test_bloom_empty_eval_flags_nothing(spark, corpus):
    train, _ = corpus
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bloom_decontamination(train, empty, "doc_id", "text").count() == 0


def test_bloom_caller_owned_broadcast(spark, corpus):
    """Repeated screens reuse ONE broadcast (broadcast_bitmap) and own
    its lifecycle — same flags as the per-call path, destroyable after
    the last screen materializes."""
    from opengauss_tools_datachecker_spark.operators.contamination import (
        broadcast_bitmap,
    )

    train, ev = corpus
    bitmap = eval_bloom_bitmap(ev, "doc_id", "text")
    want = sorted(
        map(tuple, bloom_flagged_train(train, bitmap, "doc_id", "text", min_overlap=2).collect())
    )
    bc = broadcast_bitmap(spark, bitmap)
    try:
        got1 = bloom_flagged_train(
            train, None, "doc_id", "text", min_overlap=2, bitmap_bc=bc
        ).collect()
        got2 = bloom_flagged_train(
            train, None, "doc_id", "text", min_overlap=2, bitmap_bc=bc
        ).collect()
        assert sorted(map(tuple, got1)) == sorted(map(tuple, got2)) == want
    finally:
        bc.destroy()
    with pytest.raises(ValueError, match="exactly one"):
        bloom_flagged_train(train, bitmap, "doc_id", "text", bitmap_bc=bc)
    with pytest.raises(ValueError, match="exactly one"):
        bloom_flagged_train(train, None, "doc_id", "text")
