"""Corpus-LM relevance scoring (operators/relevance.py): DuckDB twins
for the formulas, OOV handling against a trained vocab, and the plan
shapes (WindowGroupLimit top-k, no corpus collect)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.operators.relevance import (
    doc_token_counts,
    tfidf_top_terms,
    unigram_logprob,
    vocab_counts,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick quick fox"),
    (3, "pack my box with five dozen liquor jugs"),
    (4, "the the the the"),
    (5, "   "),  # whitespace-only: zero tokens after the empty filter
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_unigram_logprob_matches_duckdb(spark, docs):
    got = {
        r.doc_id: (r.n_tok, r.xent) for r in unigram_logprob(docs, "doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute("""
WITH tok AS (SELECT doc_id, t AS token FROM (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
      FROM documents) WHERE t <> ''),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
vocab AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS N FROM vocab)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tok,
       ROUND(SUM(tf * -ln(c / N)) / CAST(SUM(tf) AS BIGINT), 6) AS xent
FROM tf JOIN vocab USING (token), tot GROUP BY doc_id
""").fetchall()
    }
    assert got == want
    assert 5 not in got  # zero-token doc not emitted
    # all-common-token doc is the fluency floor of this corpus
    assert got[4][1] == min(x for _, x in got.values())


def test_unigram_logprob_trained_vocab_oov_floor(spark, docs):
    """CCNet shape: LM trained on a reference corpus, applied to a new
    batch — OOV tokens score the smoothed floor ln(alpha/N)."""
    vocab = vocab_counts(doc_token_counts(docs, "doc_id", "text"))
    n_total = vocab.agg(F.sum("c")).first()[0]
    new = spark.createDataFrame(
        [(10, "the fox"), (11, "zzzunseen zzzunseen")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_tok, r.xent)
        for r in unigram_logprob(new, "doc_id", "text", vocab=vocab, alpha=0.5).collect()
    }
    c = {r.token: r.c for r in vocab.collect()}
    exp_10 = round(-(math.log(c["the"] / n_total) + math.log(c["fox"] / n_total)) / 2, 6)
    exp_11 = round(-math.log(0.5 / n_total), 6)
    assert got == {10: (2, exp_10), 11: (2, exp_11)}
    assert got[11][1] > got[10][1]  # OOV batch reads as the rare tail


def test_tfidf_matches_duckdb_and_tie_break(spark, docs):
    got = {
        (r.doc_id, r.rank): (r.token, r.tfidf)
        for r in tfidf_top_terms(docs, "doc_id", "text", k=3).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    want = {
        (r[0], r[3]): (r[1], r[2])
        for r in con.execute("""
WITH tok AS (SELECT doc_id, t AS token FROM (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
      FROM documents) WHERE t <> ''),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS D FROM tf),
scored AS (SELECT doc_id, token,
                  ROUND(tf * (ln((D + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
           FROM tf JOIN dfreq USING (token), nd)
SELECT doc_id, token, tfidf,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, token ASC) AS INT) AS rnk
FROM scored QUALIFY rnk <= 3
""").fetchall()
    }
    assert got == want
    # doc 4 has one distinct token -> exactly one row, rank 1
    assert (4, 1) in got and (4, 2) not in got


def test_tfidf_topk_uses_window_group_limit(spark, docs):
    """Spark 4 rewrites the rank<=k filter to WindowGroupLimit (partial
    group limit BELOW the exchange) — the reason we don't hand-salt the
    per-doc top-k (docs/PLANS.md round 3)."""
    plan = tfidf_top_terms(docs, "doc_id", "text", k=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_no_driver_collect_in_scoring(spark, docs):
    """Both scorers are pure DataFrame plans — building them triggers no
    job (nothing is collected corpus-side at plan time)."""
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    unigram_logprob(docs, "doc_id", "text")
    tfidf_top_terms(docs, "doc_id", "text")
    assert len(tracker.getJobIdsForGroup() or []) == before


def test_vocab_min_count_prunes_to_oov_floor(spark, docs):
    """min_count prunes hapaxes; pruned tokens score the OOV floor and
    N renormalizes over the kept vocab."""
    tok = doc_token_counts(docs, "doc_id", "text")
    full = vocab_counts(tok)
    pruned = vocab_counts(tok, min_count=2)
    kept = {r.token for r in pruned.collect()}
    assert kept == {r.token for r in full.collect() if r.c >= 2}
    assert "jumps" not in kept and "the" in kept
    n_kept = pruned.agg(F.sum("c")).first()[0]
    got = {
        r.doc_id: r.xent
        for r in unigram_logprob(
            docs, "doc_id", "text", vocab=pruned, alpha=0.5
        ).collect()
    }
    # doc 4 = 4x'the': xent is exactly -ln(c_the / N_kept)
    c_the = dict((r.token, r.c) for r in pruned.collect())["the"]
    assert got[4] == round(-math.log(c_the / n_kept), 6)
    # doc 3 is all hapaxes -> every token at the OOV floor
    assert got[3] == round(-math.log(0.5 / n_kept), 6)
