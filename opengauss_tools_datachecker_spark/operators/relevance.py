"""Corpus-LM relevance / fluency scoring for training-data curation.

No reference analog; these are the corpus-statistics ops every LLM data
pipeline runs after dedup: a corpus unigram LM scored per document —
the cheap stand-in for CCNet's KenLM perplexity filter (Wenzek et al.
2019, arXiv:1911.00359 §4.3): docs whose tokens are rare under the
corpus LM are head/garbage outliers, docs of common tokens are
"fluent" — and TF-IDF top terms per document (keyword fingerprints for
topic binning and retrieval-style corpus analysis).

Scale shape (10^12 docs): both ops reduce to two combiner-friendly
shuffles over the exploded token frame — groupBy (doc, token) for term
frequencies, groupBy token for the vocabulary — plus one join of the
token frame back to the vocabulary. By Heaps' law the vocabulary is
sublinear in the corpus (~10^7-10^8 distinct tokens at web scale), so
AQE broadcasts it when it fits and degrades to a shuffle hash join on
``token`` otherwise; nothing is collected to the driver (the corpus
token total and doc count ride a broadcast cross-join of a 1-row
aggregate). Per-doc top-k rides Spark 4's WindowGroupLimit partial
limit below the exchange — hand-salting measured strictly worse
(docs/PLANS.md, round 3).

Determinism / oracle parity: scores are ln() of integer-count ratios,
rounded to 6 decimals — IEEE double log implementations agree to ~1
ulp, far inside the rounding grid, and the DuckDB twins replay the
identical formulas (tests/test_relevance.py; gate: q_unigram_lp,
q_tfidf).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opengauss_tools_datachecker_spark.functions.text import tokens


def doc_token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token, tf) with multiplicity — whitespace tokens, empty-token
    free (zero-token docs vanish; callers that must keep them re-join).
    One explode + one map-side-combined groupBy."""
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def vocab_counts(tok_counts: DataFrame, min_count: int = 1) -> DataFrame:
    """Corpus unigram counts (token, c) from a doc_token_counts frame —
    the trained "LM". Persist/write this once per corpus snapshot and
    pass it to :func:`unigram_logprob` for incremental scoring of new
    batches (the CCNet shape: LM trained on a reference corpus, applied
    to every new crawl).

    ``min_count`` prunes the hapax tail (the pruned-LM shape): tokens
    below it fall to :func:`unigram_logprob`'s smoothed OOV floor, and
    the vocab frame shrinks enough to BROADCAST at web scale (Zipf:
    min_count=2 typically halves the vocabulary). Note the floor
    ln(alpha/N) is slightly harsher than a kept hapax's ln(1/N) — the
    standard pruning bias, acceptable for filtering."""
    vocab = tok_counts.groupBy("token").agg(F.sum("tf").alias("c"))
    return vocab.filter(F.col("c") >= min_count) if min_count > 1 else vocab


def unigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame | None = None,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-doc cross-entropy under a corpus unigram LM — the perplexity
    proxy for fluency filtering. Output: (id, n_tok, xent) where

        xent = round( -(1/n_tok) * sum_t tf_t * ln(c_t / N), 6 )

    with c_t the corpus count of token t and N the vocab's token total
    (for a ``min_count``-pruned vocab, probabilities renormalize over
    the kept tokens — the standard pruned-LM convention).
    Low xent = common tokens (fluent/boilerplate), high xent = rare
    tokens (head noise / garbled bytes) — filter both tails, exactly
    like CCNet's per-language perplexity buckets. ``vocab`` is a
    (token, c) frame from :func:`vocab_counts`; omitted, the LM is
    trained on ``df`` itself (self-scoring — no OOV possible). Scoring
    a NEW batch against a trained vocab, out-of-vocabulary tokens get
    the smoothed floor ln(alpha / N). Docs with zero tokens are not
    emitted (no distribution to score)."""
    tok = doc_token_counts(df, id_col, text_col)
    if vocab is None:
        vocab = vocab_counts(tok)
    total = vocab.agg(F.sum("c").cast("double").alias("_N"))
    scored = (
        tok.join(vocab, "token", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.col("tf"),
            (
                F.col("tf")
                * -F.log(
                    F.coalesce(F.col("c").cast("double"), F.lit(alpha)) / F.col("_N")
                )
            ).alias("_nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_tok"),
        F.round(F.sum("_nll") / F.sum("tf"), 6).alias("xent"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Top-k TF-IDF terms per document. Output: (id, token, tfidf, rank),
    rank 1..k, ties broken by token ascending (engine-portable).

        idf   = ln((n_docs + 1) / (df_t + 1)) + 1   (smoothed, sklearn's
                                                     smooth_idf form)
        tfidf = round(tf_t * idf, 6)

    Document frequency counts each token once per doc (the tf frame
    re-aggregated, no second explode). The top-k window partitions by
    doc — bounded by doc token counts — and Spark 4 rewrites rank<=k to
    WindowGroupLimit (partial limit below the exchange)."""
    tok = doc_token_counts(df, id_col, text_col)
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tok.select(id_col).distinct().agg(
        F.count(F.lit(1)).cast("double").alias("_D")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        tok.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("token"),
            F.round(
                F.col("tf") * (F.log((F.col("_D") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
