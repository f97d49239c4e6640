"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle → signature → band →
bucket-join), SimHash, and n-gram Jaccard. No reference analog — the
reference dedups nothing (its FULL JOIN is even duplicate-blind,
SURVEY.md §1.4); these are the training-data extensions.

Scale design (10^9+ documents):
- exact_duplicates: digest groupBy — one shuffle of (digest, id) pairs,
  map-side combined; identical to the uniqueness rule's shape.
- MinHash LSH: signatures are computed shuffle-free (higher-order
  functions over the token array — content never explodes). Candidate
  generation shuffles only (band_key, doc_id) pairs — bands × docs rows,
  NOT docs × shingles. Pair verification joins only within buckets.
  A band whose bucket collects B docs yields B(B-1)/2 pairs — near-dup
  *clusters* are the expected skew; cap with max_bucket_size (drop
  degenerate buckets, log them) like any production LSH.
- n-gram Jaccard is the exact (expensive) verifier: explode distinct
  shingles, self-join within shingle groups — use only downstream of
  LSH candidates or on small slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.functions.text import (
    minhash_signature,
    shingles,
    simhash16,
    tokens,
)


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical documents: (digest, n_docs, doc_ids)."""
    digests = df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("digest"))
    return (
        digests.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 8, shingle_n: int = 3
) -> DataFrame:
    """Per-doc MinHash signature columns mh0..mh{n-1} (shuffle-free).

    The shingle array is materialized in its own projection so the
    n_hashes min-scans share it — inlining it into each hash expression
    makes Catalyst recompute the concat_ws per hash (measured 6x slower).
    """
    with_sh = df.select(
        F.col(id_col), shingles(tokens(F.col(text_col)), shingle_n).alias("_sh")
    )
    sig = minhash_signature(F.col("_sh"), n_hashes)
    return with_sh.select(F.col(id_col), *[c.alias(f"mh{j}") for j, c in enumerate(sig)])


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    n_hashes: int = 8,
    band_size: int = 2,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Banding: docs sharing any full band are candidate near-dups.

    Output: (id_a, id_b) with id_a < id_b, distinct across bands.
    Buckets above max_bucket_size are dropped (degenerate content —
    e.g. empty docs all hash alike); production logs them for review.
    """
    n_bands = n_hashes // band_size
    # docs too short to shingle have NULL signatures; concat_ws would
    # collapse them all into one band key ("0#") and pair them spuriously
    signatures = signatures.filter(F.col("mh0").isNotNull())
    bands = signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "#",
                        F.lit(str(b)),
                        *[F.col(f"mh{b * band_size + k}") for k in range(band_size)],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band_key"),
    )
    # (id, band_key) is tiny (n_bands rows/doc, no content): cache it so
    # the bucket-size pass and both sides of the self-join reuse one
    # signature computation instead of three
    bands = bands.persist()
    # bucket sizes via aggregation (windowless, one shuffle on band_key)
    bucket_sizes = bands.groupBy("band_key").agg(F.count(F.lit(1)).alias("bsz"))
    bands = bands.join(
        bucket_sizes.filter(
            (F.col("bsz") > 1) & (F.col("bsz") <= max_bucket_size)
        ),
        "band_key",
    )
    a = bands.select(F.col("band_key"), F.col(id_col).alias("id_a"))
    b = bands.select(F.col("band_key"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash LSH near-dup candidate pairs end-to-end."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n)
    return lsh_candidate_pairs(sigs, id_col, n_hashes, band_size)


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash int) — 16-bit portable SimHash."""
    return df.select(F.col(id_col), simhash16(tokens(F.col(text_col))).alias("simhash"))


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 2) -> DataFrame:
    """Pairs within Hamming distance on the SimHash fingerprint.

    Joins on identical fingerprint first (the LSH trick for SimHash is
    bit-band rotation; at 16 bits an equality join + popcount filter on
    the small residual is enough). Scale path: split the fingerprint
    into 4-bit bands, equi-join per band, verify popcount.
    """
    fp = simhash_fingerprints(df, id_col, text_col)
    a = fp.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b = fp.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    # band on the high byte to avoid the full cross join
    a = a.withColumn("band", (F.col("sh_a") / 256).cast("int"))
    b = b.withColumn("band", (F.col("sh_b") / 256).cast("int"))
    pairs = a.join(b, "band").filter(F.col("id_a") < F.col("id_b"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity: (id_a, id_b, jaccard ≥ threshold).

    With ``candidates`` (e.g. LSH output) the self-join is replaced by a
    semi-joined verification — the production path.
    """
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles(tokens(F.col(text_col)), shingle_n))).alias("sh"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), "sh")
    b = sh.select(F.col("doc_id").alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    if candidates is not None:
        inter = inter.join(F.broadcast(candidates), ["id_a", "id_b"], "left_semi")
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
