"""Train/eval split assignment and cross-corpus contamination checks.

Training-data extensions (build brief): before training, a corpus is
split into train/validation/test partitions, and the training side must
be screened for benchmark/eval contamination — documents that share long
n-grams with the held-out set leak evaluation answers into training.
No reference analog (the reference validates one table pair at a time);
these compose the engine's shingle machinery into the two standard
pipeline stages.

Scale design (10^9+ documents):
- hash_split is a pure map: one md5 per row, no shuffle, no state. The
  assignment is a deterministic function of the document id (+ salt), so
  it is stable across runs, cluster sizes, and engines — re-running the
  pipeline never migrates a document between splits (the property that
  keeps eval sets honest as the corpus grows).
- ngram_contamination shuffles (shingle, doc_id) pairs — docs × shingles
  rows per side, the same shape as the Jaccard verifier's shingle join.
  Hot shingles (boilerplate that appears in a large fraction of the
  train corpus) would densify the join quadratically; `max_shingle_df`
  drops train shingles above a document-frequency cap BEFORE the join
  (the standard stop-gram guard in decontamination pipelines — a shingle
  shared by half the corpus carries no leak signal). The DF cap is
  computed with one extra groupBy over the train shingle rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.operators.dedup import (
    _py_shingles,
    _py_tokens,
    distinct_shingle_rows,
)

#: md5-prefix space: assignments compare the first 8 hex chars (32 bits)
_PREFIX_SPACE = 16**8


def split_thresholds(splits: dict[str, float]) -> list[tuple[str, str]]:
    """(name, cumulative-threshold-hex) pairs, insertion order, for
    :func:`hash_split`. Fractions must sum to 1 (±1e-9). The final
    split's threshold is clamped to the full space so rounding can
    never leave an unassigned sliver."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out, cum = [], 0.0
    names = list(splits)
    for name in names:
        cum += splits[name]
        bound = _PREFIX_SPACE if name == names[-1] else int(cum * _PREFIX_SPACE)
        out.append((name, f"{min(bound, _PREFIX_SPACE):09x}"))
    return out


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/valid/test assignment by content-hash of the id.

    Adds ``out_col``: the split whose cumulative-fraction interval
    contains ``md5(salt || id)``'s 8-hex-char prefix (lexicographic
    compare on fixed-width lowercase hex == numeric compare on the
    uniform 32-bit value). Map-only, shuffle-free, engine-portable
    (DuckDB's md5 produces the same hex), and stable under corpus
    growth: a document's split never changes when rows are added or
    the job is re-partitioned. ``salt`` derives independent splits
    from the same ids (e.g. per-epoch held-out rotations).
    """
    if splits is None:
        splits = {"test": 0.10, "valid": 0.10, "train": 0.80}
    prefix = F.lpad(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8), 9, "0")
    pairs = split_thresholds(splits)
    expr = F.lit(pairs[-1][0])
    for name, bound in reversed(pairs[:-1]):
        expr = F.when(prefix < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def ngram_contamination(
    train: DataFrame,
    eval_: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_overlap: int = 2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(eval_id, train_id, n_overlap) — held-out documents sharing at
    least ``min_overlap`` distinct word ``shingle_n``-grams with a
    training document (decontamination candidates).

    Both sides reduce to distinct (doc, shingle) rows via the Arrow
    shingle kernel, then equi-join on the shingle string — eval corpora
    are orders of magnitude smaller than train, so the aggregated join
    output is bounded by eval's size times its per-doc match count.
    ``max_shingle_df`` drops train shingles whose train document
    frequency exceeds the cap before the join (boilerplate guard; the
    dropped grams carry no leak signal and would otherwise fan out
    quadratically).
    """
    tr = distinct_shingle_rows(train, id_col, text_col, shingle_n)
    ev = distinct_shingle_rows(eval_, id_col, text_col, shingle_n)
    if max_shingle_df is not None:
        dfreq = tr.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
        tr = tr.join(dfreq.filter(F.col("_df") <= max_shingle_df), "sh").drop("_df")
    return (
        ev.select(F.col("doc_id").alias("eval_id"), "sh")
        .join(tr.select(F.col("doc_id").alias("train_id"), "sh"), "sh")
        .groupBy("eval_id", "train_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


# ---------------------------------------------------------------------
# Broadcast-bloom decontamination — the JOIN-FREE scale path.
#
# ngram_contamination shuffles (shingle, doc_id) rows from BOTH sides.
# That is the right shape for pair-level attribution (which eval doc
# leaked into which train doc), but a 10^12-doc corpus screened against
# a FIXED eval set doesn't need pairs — it needs a doc-level verdict,
# and that is a broadcast bloom filter: the eval set's shingles become
# a 128 KiB bitmap shipped to every executor, and the train side is a
# PURE MAP (zero shuffle, zero join, one pass) counting bloom-positive
# shingles per doc. The standard production decontamination shape.
#
# Determinism/oracle: bit positions derive from md5(shingle) — hash i's
# position is the last 5 hex chars of its 8-char digest chunk (5 hex
# digits = 20 bits = an index into the 2^20-bit filter, no modulo
# needed) — so DuckDB rebuilds the identical filter and reproduces even
# the FALSE POSITIVES bit-for-bit. False-positive rate at k=4 hashes,
# m=2^20 bits, n eval shingles: (1 - e^{-kn/m})^k ≈ 1% per shingle at
# n = 10^5; `min_overlap` guards the doc-level verdict, and
# ngram_contamination remains the exact pair-level verifier for flagged
# docs.
# ---------------------------------------------------------------------

BLOOM_BITS = 1 << 20  # m: 2^20 bits = 128 KiB broadcast
BLOOM_HASHES = 4      # k: four 20-bit slices of one md5


def _bloom_positions(digest_hex: str) -> list[int]:
    return [
        int(digest_hex[8 * i + 3 : 8 * i + 8], 16) for i in range(BLOOM_HASHES)
    ]


def eval_bloom_bitmap(
    eval_: DataFrame, id_col: str, text_col: str, shingle_n: int = 3
) -> np.ndarray:
    """Build the eval set's bloom bitmap (packed uint8, BLOOM_BITS/8
    bytes). Distinct shingles are hashed in an Arrow kernel; the driver
    collects only DISTINCT bit positions — bounded by min(k·n_shingles,
    BLOOM_BITS) ≤ 2^20 ints no matter how large the eval set grows."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            poss: set[int] = set()
            for s in pdf["sh"]:
                poss.update(_bloom_positions(hashlib.md5(s.encode()).hexdigest()))
            yield pd.DataFrame({"pos": pd.Series(sorted(poss), dtype="int32")})

    sh = distinct_shingle_rows(eval_, id_col, text_col, shingle_n).select("sh").distinct()
    rows = sh.mapInPandas(kernel, "pos int").distinct().collect()
    bitmap = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
    if rows:
        arr = np.array([r["pos"] for r in rows], dtype=np.int64)
        np.bitwise_or.at(bitmap, arr >> 3, (1 << (arr & 7)).astype(np.uint8))
    return bitmap


def broadcast_bitmap(spark, bitmap: np.ndarray):
    """Broadcast an eval bloom bitmap ONCE for reuse across many
    :func:`bloom_flagged_train` calls. The function's own per-call
    broadcast can never be released (the returned frame is lazy), so a
    long-lived session screening many train batches should create one
    of these, pass it as ``bitmap_bc``, and ``.destroy()`` it after the
    last screen materializes — otherwise 128 KiB of driver+executor
    broadcast state accrues per call."""
    return spark.sparkContext.broadcast(bitmap.tobytes())


def bloom_flagged_train(
    train: DataFrame,
    bitmap: np.ndarray | None,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_overlap: int = 2,
    bitmap_bc=None,
) -> DataFrame:
    """(train_id, n_hits): train docs with at least ``min_overlap``
    distinct shingles testing bloom-positive against ``bitmap``. Pure
    map over the train corpus — the bitmap rides a Spark broadcast, no
    shuffle anywhere in the plan.

    One-shot callers pass ``bitmap`` and accept that the per-call
    broadcast lives until the session ends (the result is lazy, so the
    function cannot destroy it); repeated callers pass a
    :func:`broadcast_bitmap` handle as ``bitmap_bc`` and own its
    lifecycle."""
    if (bitmap is None) == (bitmap_bc is None):
        raise ValueError("exactly one of bitmap / bitmap_bc is required")
    bc = (
        bitmap_bc
        if bitmap_bc is not None
        else train.sparkSession.sparkContext.broadcast(bitmap.tobytes())
    )
    id_type = train.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in batches:
            ids, hits = [], []
            for doc_id, text in zip(pdf["_id"], pdf["_text"]):
                n = 0
                for s in dict.fromkeys(_py_shingles(_py_tokens(text), shingle_n)):
                    h = hashlib.md5(s.encode()).hexdigest()
                    if all(
                        (bm[p >> 3] >> (p & 7)) & 1 for p in _bloom_positions(h)
                    ):
                        n += 1
                if n >= min_overlap:
                    ids.append(doc_id)
                    hits.append(n)
            yield pd.DataFrame(
                {"train_id": ids, "n_hits": pd.Series(hits, dtype="int32")}
            )

    return train.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).mapInPandas(kernel, f"train_id {id_type}, n_hits int")


def bloom_decontamination(
    train: DataFrame,
    eval_: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """Doc-level decontamination screen: build the eval bloom
    (:func:`eval_bloom_bitmap`) and flag train docs against it
    (:func:`bloom_flagged_train`). Flagged docs are dropped or handed
    to :func:`ngram_contamination` for exact pair-level verification —
    which now runs on the flagged slice, not the corpus."""
    bitmap = eval_bloom_bitmap(eval_, id_col, text_col, shingle_n)
    return bloom_flagged_train(
        train, bitmap, id_col, text_col, shingle_n, min_overlap
    )


def decontaminated_train_ids(
    train: DataFrame,
    eval_: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_overlap: int = 2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Train ids surviving decontamination: the anti-join of the train
    corpus against the contaminated train side of
    :func:`ngram_contamination` — the keep-list a pipeline feeds to the
    tokenizer."""
    pairs = ngram_contamination(
        train, eval_, id_col, text_col, shingle_n, min_overlap, max_shingle_df
    )
    dirty = pairs.select(F.col("train_id").alias(id_col)).distinct()
    return train.select(id_col).join(dirty, id_col, "left_anti")
