from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    base = " ".join(f"token{i} word{i * 7 % 13}" for i in range(25))
    rows = [
        (0, base),
        (1, base),                                          # exact dup of 0
        (2, base.replace("token12", "CHANGED")),            # near dup (1 of 50 words)
        (3, "completely different text about spark shuffle partitions and joins here"),
        (4, "another unrelated document mentioning query plans and catalyst rules"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicates(docs):
    groups = dedup.exact_duplicates(docs, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [0, 1] and groups[0]["n_docs"] == 2


def test_exact_duplicates_bounded_exemplars(spark):
    # one degenerate hot digest (10k byte-identical docs): the output row
    # must carry the exact count but only max_exemplars ids — the window
    # pre-prune bounds group state, never the full roster
    hot = spark.range(10_000).select(
        F.col("id").alias("doc_id"), F.lit("same boilerplate text").alias("text")
    )
    row = dedup.exact_duplicates(hot, "doc_id", "text", max_exemplars=16).collect()[0]
    assert row["n_docs"] == 10_000
    assert row["doc_ids"] == list(range(16))

    # explicit small-data opt-in keeps the full roster
    full = dedup.exact_duplicates(hot.limit(50), "doc_id", "text", max_exemplars=None)
    assert len(full.collect()[0]["doc_ids"]) == 50


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r.id_a, r.id_b) for r in dedup.minhash_dedup(docs, "doc_id", "text").collect()}
    assert (0, 1) in pairs          # exact dup always collides
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup shares most shingles
    assert (3, 4) not in pairs      # unrelated docs don't collide on a full band


def test_simhash_near_dups(docs):
    fps = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(docs, "doc_id", "text").collect()}
    assert fps[0] == fps[1]
    assert 0 <= fps[0] < 2**16
    pairs = {(r.id_a, r.id_b) for r in dedup.simhash_near_dups(docs, "doc_id", "text", 3).collect()}
    assert (0, 1) in pairs


def test_ngram_jaccard(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    by_pair = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert by_pair[(0, 1)] == 1.0
    assert 0.5 <= by_pair[(0, 2)] < 1.0
    assert (3, 4) not in by_pair


def test_jaccard_with_candidate_filter(spark, docs):
    cands = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.1, candidates=cands).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1)}


def test_lsh_bucket_cap_drops_degenerate(spark):
    # 50 identical docs -> one giant bucket; cap excludes it entirely
    rows = [(i, "same same same same same") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup.minhash_signatures(df, "doc_id", "text")
    pairs = dedup.lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=10)
    assert pairs.count() == 0


def test_simhash_near_dups_finds_identical_text(spark):
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [("a", "the quick brown fox jumps over the lazy dog again and again"),
         ("b", "the quick brown fox jumps over the lazy dog again and again"),
         ("c", "completely different words about database validation engines here")],
        "doc_id string, text string",
    )
    pairs = dedup.simhash_near_dups(docs, "doc_id", "text", max_hamming=0)
    found = {(r.id_a, r.id_b, r.hamming) for r in pairs.collect()}
    assert ("a", "b", 0) in found
    assert all(h == 0 for (_, _, h) in found)


def test_simhash_pigeonhole_guaranteed_recall(spark):
    """Property (VERDICT r01 #5): every pair within Hamming h is found,
    INCLUDING flips confined to the high byte (which the r01 high-byte
    banding silently missed) — the band output equals the exact
    unbanded Hamming-ball pair set."""
    import itertools
    import random

    rng = random.Random(7)
    rows = [
        (0, 0x5A5A),
        (1, 0x5A5A ^ 0xE000),  # 3 high-byte bits flipped
        (2, 0x5A5A ^ 0x0007),  # 3 low-byte bits
        (3, 0x5A5A ^ 0x8001),  # 1 high + 1 low
        (4, 0x5A5A ^ 0xF00F),  # 8 bits - outside h=3
    ]
    rows += [(i, rng.randrange(65536)) for i in range(5, 40)]
    fp = spark.createDataFrame(rows, "doc_id long, simhash int")
    got = {
        (r.id_a, r.id_b)
        for r in dedup.simhash_pairs_from_fingerprints(fp, "doc_id", 3).collect()
    }
    exact = {
        (a, b)
        for (a, va), (b, vb) in itertools.combinations(rows, 2)
        if bin(va ^ vb).count("1") <= 3
    }
    assert (0, 1) in exact  # the high-byte case is genuinely exercised
    assert (0, 4) not in got
    assert got == exact


def test_null_text_kernels_match_catalyst_spec(spark):
    """ADVICE r01: NULL documents must not be coalesced to '' — kernel
    outputs mirror the Catalyst HOF spec (split(trim(NULL)) = NULL)."""
    from opengauss_tools_datachecker_spark.functions import text as tx

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c d")], "doc_id long, text string"
    )
    kern = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(df, "doc_id", "text").collect()}
    spec = {
        r.doc_id: r.sh
        for r in df.select("doc_id", tx.simhash16(tx.tokens("text")).alias("sh")).collect()
    }
    assert kern == spec

    sig = dedup.minhash_signatures(df, "doc_id", "text", n_hashes=2, shingle_n=1)
    spec_sig = df.select(
        "doc_id",
        *[
            c.alias(f"mh{j}")
            for j, c in enumerate(tx.minhash_signature(tx.shingles(tx.tokens("text"), 1), 2))
        ],
    )
    assert sorted(map(tuple, sig.collect())) == sorted(map(tuple, spec_sig.collect()))


def test_verified_mode_prunes_before_shingle_join(spark, docs):
    """VERDICT r01 #4: with candidates given, the shingle self-join must
    only see candidate docs' shingle rows (the semi-join sits BELOW the
    join, not above the aggregate)."""
    cands = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    plan = dedup.ngram_jaccard_pairs(
        df=docs, id_col="doc_id", text_col="text", threshold=0.1, candidates=cands
    )._jdf.queryExecution().optimizedPlan().toString()
    # the optimized plan keeps LeftSemi joins below the shingle equi-join:
    # both self-join inputs are semi-filtered by the candidate doc-ids
    assert plan.count("LeftSemi") >= 2


def test_dedup_clusters_connected_components(spark):
    """Chain 1-2-3-4 collapses to one cluster labelled by its min id;
    separate component {10,11} keeps its own; diameter > 1 exercises
    the multi-round propagation."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (6, 5)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.cluster for r in dedup.dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 5: 5, 6: 5}


def test_dedup_clusters_long_chain_converges(spark):
    n = 40  # diameter 40 ≫ one round — the fixpoint loop must iterate
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.cluster for r in dedup.dedup_clusters(pairs).collect()}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_simhash60_pigeonhole_recall(spark):
    """60-bit sketch: seeded flips anywhere in the 60 bits (incl. the
    top band) within h=3 are always found; > h excluded."""
    import itertools
    import random

    rng = random.Random(11)
    base = 0x0123_4567_89AB_CDE
    rows = [
        (0, base),
        (1, base ^ (0b111 << 57)),  # 3 bits in the TOP band
        (2, base ^ 0b101),          # 2 low bits
        (3, base ^ ((1 << 59) | 1)),  # extreme bits, hamming 2
        (4, base ^ 0xFF),           # 8 bits - outside h=3
    ]
    rows += [(i, rng.randrange(1 << 60)) for i in range(5, 30)]
    fp = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r.id_a, r.id_b)
        for r in dedup.simhash_pairs_from_fingerprints(fp, "doc_id", 3, n_bits=60).collect()
    }
    exact = {
        (a, b)
        for (a, va), (b, vb) in itertools.combinations(rows, 2)
        if bin(va ^ vb).count("1") <= 3
    }
    assert (0, 1) in exact and (0, 3) in exact
    assert got == exact


def test_simhash60_matches_spec_and_identical_text(spark):
    docs = spark.createDataFrame(
        [("a", "the quick brown fox"), ("b", "the quick brown fox"), ("c", None)],
        "doc_id string, text string",
    )
    fps = {r.doc_id: r.simhash for r in dedup.simhash60_fingerprints(docs, "doc_id", "text").collect()}
    assert fps["a"] == fps["b"]
    assert 0 <= fps["a"] < 2**60
    assert fps["c"] == 0  # NULL text -> zero votes, matching the SQL twin


def test_minhash_estimate_bounds_and_identity(spark):
    from opengauss_tools_datachecker_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_estimate_pairs,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, base), (2, base), (3, base + " with a small tail change"),
            (4, "completely different text about database validation engines")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(df, "doc_id", "text", n_hashes=8)
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_hashes=8, band_size=2)
    est = {(r["id_a"], r["id_b"]): r["n_agree"]
           for r in minhash_estimate_pairs(sigs, pairs, "doc_id").collect()}
    # identical docs agree on every position; all estimates in [0, 8]
    assert est[(1, 2)] == 8
    assert all(0 <= v <= 8 for v in est.values())
    # near-dup pair (if banded) agrees on more positions than it disagrees
    if (1, 3) in est:
        assert est[(1, 3)] >= 4


def test_containment_catches_snippet_inclusion(spark):
    # a short doc fully embedded in a long doc: containment 1.0 while
    # Jaccard is far below any dedup threshold
    snippet = " ".join(f"tok{i}" for i in range(10))
    long_doc = snippet + " " + " ".join(f"filler{i} pad{i} more{i}" for i in range(60))
    df = spark.createDataFrame(
        [(0, long_doc), (1, snippet)], "doc_id long, text string"
    )
    cont = dedup.ngram_containment_pairs(df, "doc_id", "text", threshold=0.9).collect()
    assert len(cont) == 1 and cont[0]["containment"] == 1.0
    jac = dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    assert jac == []  # Jaccard blind to the inclusion


def test_probe_band_index_incremental_near_dup(spark):
    """Daily-ingest path: new docs probe the persisted (id, band_key)
    index — old-vs-old pairs never re-emitted, old corpus never
    re-hashed, new-new pairs found among the batch itself."""
    base = " ".join(f"token{i} word{i * 7 % 13}" for i in range(25))
    other = " ".join(f"alpha{i} beta{i * 5 % 11}" for i in range(25))
    old = spark.createDataFrame(
        [(0, base), (1, base), (2, other)], "doc_id long, text string"
    )
    old_sigs = dedup.minhash_signatures(old, "doc_id", "text")
    index = dedup.band_rows(old_sigs, "doc_id").cache()  # the persisted index

    new = spark.createDataFrame(
        [
            (10, base.replace("token12", "CHANGED")),  # near-dup of old 0/1
            (11, "totally unrelated content about spark catalyst planning"),
            (12, "totally unrelated content about spark catalyst planning"),  # dup of 11
        ],
        "doc_id long, text string",
    )
    new_sigs = dedup.minhash_signatures(new, "doc_id", "text")
    got = {
        (r.new_id, r.match_id, r.origin)
        for r in dedup.probe_band_index(new_sigs, index, "doc_id").collect()
    }
    assert (10, 0, "new_old") in got and (10, 1, "new_old") in got
    assert (11, 12, "new_new") in got
    assert not any(o == "new_old" and m == 2 for (_, m, o) in got)  # unrelated old
    assert not any(n == 11 and o == "new_old" for (n, _, o) in got)


def test_probe_band_index_caps_degenerate_bucket(spark):
    """A boilerplate band bucket above the cap is excluded via the
    maintained (band_key, bsz) stats table — no index scan needed."""
    boiler = "same same same same same"
    old = spark.createDataFrame(
        [(i, boiler) for i in range(30)], "doc_id long, text string"
    )
    old_sigs = dedup.minhash_signatures(old, "doc_id", "text")
    index = dedup.band_rows(old_sigs, "doc_id").cache()
    sizes = index.groupBy("band_key").agg(F.count(F.lit(1)).alias("bsz"))

    new = spark.createDataFrame([(100, boiler)], "doc_id long, text string")
    new_sigs = dedup.minhash_signatures(new, "doc_id", "text")
    capped = dedup.probe_band_index(
        new_sigs, index, "doc_id", max_bucket_size=10, index_band_sizes=sizes
    )
    assert capped.filter("origin = 'new_old'").count() == 0
    uncapped = dedup.probe_band_index(new_sigs, index, "doc_id", max_bucket_size=1000)
    assert uncapped.filter("origin = 'new_old'").count() == 30


def test_probe_band_index_partial_stats_still_caps(spark):
    """A stale/partial stats table must not exempt a band from the cap:
    batch band keys missing from the stats are recounted from the index
    itself (unknown != zero)."""
    boiler = "same same same same same"
    old = spark.createDataFrame(
        [(i, boiler) for i in range(30)], "doc_id long, text string"
    )
    old_sigs = dedup.minhash_signatures(old, "doc_id", "text")
    index = dedup.band_rows(old_sigs, "doc_id").cache()
    # stats covering NONE of the batch's band keys — the old behavior
    # silently exempted them and restored the unbounded fan-out
    empty_stats = spark.createDataFrame([], "band_key string, bsz long")

    new = spark.createDataFrame([(100, boiler)], "doc_id long, text string")
    new_sigs = dedup.minhash_signatures(new, "doc_id", "text")
    capped = dedup.probe_band_index(
        new_sigs, index, "doc_id", max_bucket_size=10, index_band_sizes=empty_stats
    )
    assert capped.filter("origin = 'new_old'").count() == 0
    # and a complete stats table still behaves identically
    sizes = index.groupBy("band_key").agg(F.count(F.lit(1)).alias("bsz"))
    full = dedup.probe_band_index(
        new_sigs, index, "doc_id", max_bucket_size=10, index_band_sizes=sizes
    )
    assert full.filter("origin = 'new_old'").count() == 0


def test_verifier_candidates_unforced_broadcast_completes(spark):
    """Scale property: the exact verifiers' candidate semi-joins carry
    no forced broadcast hint, so with broadcast disabled (the stand-in
    for 'candidate frame outgrew broadcast capacity') the plan degrades
    to a shuffle semi-join and still returns the same pairs."""
    base = " ".join(f"token{i} word{i * 7 % 13}" for i in range(25))
    df = spark.createDataFrame(
        [(0, base), (1, base.replace("token12", "CHANGED")), (2, "spark " * 30)],
        "doc_id long, text string",
    )
    cand = dedup.minhash_dedup(df, "doc_id", "text")
    want = sorted(
        map(tuple, dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.5, candidates=cand
        ).collect())
    )
    assert want  # the fixture does produce a verified pair
    conf = spark.conf
    old_static = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        q = dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.5, candidates=cand
        )
        assert sorted(map(tuple, q.collect())) == want
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan  # degraded, not failed
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_static)
        conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_probe_band_index_broadcasts_small_sides(spark):
    """Scale property: the per-batch band-count frames (``new_sizes``,
    ``uncovered``) carry NO forced broadcast hint — they are
    batch-cardinality at daily-ingest scale, so with broadcast disabled
    (the stand-in for 'batch outgrew broadcast capacity') the probe
    degrades to shuffle joins and still returns the same matches.
    Only ``bad_keys`` (cap violators, small by construction) keeps a
    forced hint."""
    old = spark.createDataFrame(
        [(i, f"doc body {i} unique words") for i in range(20)]
        + [(90 + i, "same same same same same") for i in range(30)],
        "doc_id long, text string",
    )
    index = dedup.band_rows(
        dedup.minhash_signatures(old, "doc_id", "text"), "doc_id"
    ).cache()
    # partial stats: force the uncovered-key recount path too
    stats = (
        index.filter("substring(band_key, 1, 1) < 'd'")
        .groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("bsz"))
    )
    new = spark.createDataFrame(
        [(200, "doc body 3 unique words"), (201, "same same same same same")],
        "doc_id long, text string",
    )
    new_sigs = dedup.minhash_signatures(new, "doc_id", "text")
    want = sorted(map(tuple, dedup.probe_band_index(
        new_sigs, index, "doc_id", max_bucket_size=10, index_band_sizes=stats
    ).collect()))
    assert any(o == "new_old" for _, _, o in want)  # non-degenerate fixture
    conf = spark.conf
    old_static = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        q = dedup.probe_band_index(
            new_sigs, index, "doc_id", max_bucket_size=10, index_band_sizes=stats
        )
        assert sorted(map(tuple, q.collect())) == want
        plan = q._jdf.queryExecution().executedPlan().toString()
        # bad_keys keeps its hint; with thresholds at -1 any broadcast
        # in the plan can only come from an explicit hint — assert the
        # only broadcast join is the bad-key LeftAnti exclusion (the
        # adaptive plan string prints each join twice: final + initial)
        bcast_lines = [l for l in plan.splitlines() if "BroadcastHashJoin" in l]
        assert bcast_lines and all("LeftAnti" in l for l in bcast_lines)
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_static)
        conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
