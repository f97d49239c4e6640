"""Incremental LSH band index: CLI e2e (index N batches -> probe) plus
stats-vs-recount consistency and idempotent batch retries."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.operators import dedup

REPO = Path(__file__).resolve().parent.parent

BASE = " ".join(f"token{i} word{i * 7 % 13}" for i in range(25))
OTHER = " ".join(f"alpha{i} beta{i * 5 % 11}" for i in range(25))


@pytest.fixture(scope="module")
def batches(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bandidx")
    day1 = [(0, BASE), (1, BASE), (2, OTHER)]
    day2 = [(10, OTHER), (11, "completely different prose about catalyst")]
    day3 = [
        (100, BASE.replace("token12", "CHANGED")),  # near-dup of 0/1 (day1)
        (101, OTHER),                               # dup of 2 (day1) and 10 (day2)
        (102, "fresh unseen content entirely"),
    ]
    for name, rows in (("day1", day1), ("day2", day2), ("day3", day3)):
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "overwrite"
        ).parquet(str(root / name))
    return root


def _run(*args) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable,
         str(REPO / "opengauss_tools_datachecker_spark" / "dedup_index.py"),
         *map(str, args), "--master", "local[4]"],
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
    )


def test_index_then_probe_cli_e2e(spark, batches):
    idx = batches / "index"
    for day in ("day1", "day2"):
        r = _run("index", "--docs", batches / day, "--index", idx, "--batch-id", day)
        assert r.returncode == 0, r.stderr[-2000:]

    # maintained stats == a full recount over the index (the invariant
    # that lets probe_band_index cap buckets without an index scan)
    stats = {
        (r.band_key, r.bsz)
        for r in dedup.read_band_stats(spark, str(idx)).collect()
    }
    recount = {
        (r.band_key, r.bsz)
        for r in dedup.read_band_index(spark, str(idx))
        .groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .collect()
    }
    assert stats == recount

    out = batches / "hits"
    r = _run("probe", "--docs", batches / "day3", "--index", idx, "--out", out)
    assert r.returncode == 0, r.stderr[-2000:]
    got = {
        (row.new_id, row.match_id, row.origin)
        for row in spark.read.parquet(str(out)).collect()
    }
    assert (100, 0, "new_old") in got and (100, 1, "new_old") in got
    assert (101, 2, "new_old") in got and (101, 10, "new_old") in got
    assert not any(n == 102 for (n, _, _) in got)

    # CLI probe (stats-fed) == in-session probe with counts recomputed
    # from the index itself
    sigs = dedup.minhash_signatures(
        spark.read.parquet(str(batches / "day3")), "doc_id", "text"
    )
    want = {
        (row.new_id, row.match_id, row.origin)
        for row in dedup.probe_band_index(
            sigs, dedup.read_band_index(spark, str(idx)), "doc_id"
        ).collect()
    }
    assert got == want


def test_index_batch_retry_is_idempotent(spark, batches, tmp_path):
    idx = str(tmp_path / "idx")
    docs = spark.read.parquet(str(batches / "day1"))
    bands = dedup.band_rows(dedup.minhash_signatures(docs, "doc_id", "text"), "doc_id")
    dedup.index_batch(bands, idx, "day1")
    dedup.index_batch(bands, idx, "day1")  # crashed-and-retried batch
    assert dedup.read_band_index(spark, idx).count() == bands.count()
    stats = {
        (r.band_key, r.bsz) for r in dedup.read_band_stats(spark, idx).collect()
    }
    recount = {
        (r.band_key, r.bsz)
        for r in bands.groupBy("band_key").agg(F.count(F.lit(1)).alias("bsz")).collect()
    }
    assert stats == recount


def test_index_meta_rejects_mismatched_banding(spark, batches, tmp_path):
    """Banding parameters are a property of the index: a batch indexed
    with different (n_hashes, band_size) would produce band keys that
    never match any probe — reject it instead of silently diverging."""
    idx = str(tmp_path / "idx")
    docs = spark.read.parquet(str(batches / "day1"))
    sigs = dedup.minhash_signatures(docs, "doc_id", "text")
    bands = dedup.band_rows(sigs, "doc_id")
    dedup.index_batch(bands, idx, "day1", n_hashes=8, band_size=2)
    assert dedup.read_index_meta(spark, idx) == (8, 2)
    with pytest.raises(ValueError, match="parameter mismatch"):
        dedup.index_batch(bands, idx, "day2", n_hashes=8, band_size=4)
    # same parameters keep appending fine
    dedup.index_batch(bands, idx, "day2", n_hashes=8, band_size=2)
    assert dedup.read_index_meta(spark, str(tmp_path / "nope")) is None


def test_index_batch_stats_written_before_bands(spark, batches, tmp_path):
    """The crash-safety invariant: a batch's stats land before its
    bands, so an interrupted batch can only OVER-count (conservative
    capping), never under-count. Asserted by failing the bands write
    and checking stats already exist."""
    idx = str(tmp_path / "idx")
    docs = spark.read.parquet(str(batches / "day1"))
    bands = dedup.band_rows(
        dedup.minhash_signatures(docs, "doc_id", "text"), "doc_id"
    )
    # make the bands directory unwritable by pre-creating a FILE there
    import os
    os.makedirs(idx, exist_ok=True)
    with open(f"{idx}/bands", "w") as fh:
        fh.write("not a directory")
    with pytest.raises(Exception):
        dedup.index_batch(bands, idx, "day1")
    # the stats increment survived the crash -> over-count, never under
    stats = {r.band_key: r.bsz for r in dedup.read_band_stats(spark, idx).collect()}
    recount = {
        r.band_key: r.bsz
        for r in bands.groupBy("band_key").agg(F.count(F.lit(1)).alias("bsz")).collect()
    }
    assert stats == recount


def test_index_batch_id_validated(spark, batches, tmp_path):
    docs = spark.read.parquet(str(batches / "day1"))
    bands = dedup.band_rows(dedup.minhash_signatures(docs, "doc_id", "text"), "doc_id")
    for bad in ("a/b", "a=b", "..", ""):
        with pytest.raises(ValueError):
            dedup.index_batch(bands, str(tmp_path / "idx"), bad)


def test_compact_index_preserves_probes_and_stats(spark, batches, tmp_path):
    """Compaction folds every batch partition into one, keeps the probe
    answer and the stats totals identical, and the index stays
    appendable afterwards."""
    idx = str(tmp_path / "idx")
    for day in ("day1", "day2"):
        docs = spark.read.parquet(str(batches / day))
        bands = dedup.band_rows(dedup.minhash_signatures(docs, "doc_id", "text"), "doc_id")
        dedup.index_batch(bands, idx, day, n_hashes=8, band_size=2)

    sigs = dedup.minhash_signatures(
        spark.read.parquet(str(batches / "day3")), "doc_id", "text"
    )

    def probe():
        return {
            (r.new_id, r.match_id, r.origin)
            for r in dedup.probe_band_index(
                sigs, dedup.read_band_index(spark, idx), "doc_id",
                index_band_sizes=dedup.read_band_stats(spark, idx),
            ).collect()
        }

    def stats():
        return {(r.band_key, r.bsz) for r in dedup.read_band_stats(spark, idx).collect()}

    before_probe, before_stats = probe(), stats()
    n_rows_before = dedup.read_band_index(spark, idx).count()

    res = dedup.compact_index(spark, idx, n_partitions=2)
    assert res["n_batches"] == 2 and res["n_rows"] == n_rows_before

    import os
    assert sorted(os.listdir(f"{idx}/bands")) == ["batch_id=compacted"]
    assert probe() == before_probe
    assert stats() == before_stats
    assert dedup.read_index_meta(spark, idx) == (8, 2)  # meta untouched

    # still appendable: a post-compaction batch folds into the stats
    docs3 = spark.read.parquet(str(batches / "day3"))
    bands3 = dedup.band_rows(dedup.minhash_signatures(docs3, "doc_id", "text"), "doc_id")
    dedup.index_batch(bands3, idx, "day3", n_hashes=8, band_size=2)
    recount = {
        (r.band_key, r.bsz)
        for r in dedup.read_band_index(spark, idx)
        .groupBy("band_key").agg(F.count(F.lit(1)).alias("bsz")).collect()
    }
    assert stats() == recount

    # idempotent no-op on a single-partition index... except day3 joined
    res2 = dedup.compact_index(spark, idx)
    assert res2["n_batches"] == 2  # compacted + day3 fold again
    assert stats() == recount
    # manifest accumulates across re-compactions (compact_id never in it)
    assert dedup.compacted_batch_ids(spark, idx) == {"day1", "day2", "day3"}


def test_compact_index_preserves_replay_contracts(spark, batches, tmp_path):
    """The replay hooks survive compaction: exclude_batch_id still drops
    a folded batch's rows/stats exactly (src_batch tag), and a retried
    index_batch of a folded batch is a no-op instead of a duplication."""
    idx = str(tmp_path / "idx")
    day_bands = {}
    for day in ("day1", "day2"):
        docs = spark.read.parquet(str(batches / day))
        bands = dedup.band_rows(dedup.minhash_signatures(docs, "doc_id", "text"), "doc_id")
        day_bands[day] = bands
        assert dedup.index_batch(bands, idx, day) is True

    def excl(day):
        rows = {
            (r.doc_id, r.band_key)
            for r in dedup.read_band_index(spark, idx, exclude_batch_id=day).collect()
        }
        st = {
            (r.band_key, r.bsz)
            for r in dedup.read_band_stats(spark, idx, exclude_batch_id=day).collect()
        }
        return rows, st

    before = {d: excl(d) for d in ("day1", "day2")}
    dedup.compact_index(spark, idx)
    assert {d: excl(d) for d in ("day1", "day2")} == before

    # retried folded batch: no-op — no per-batch partition reappears,
    # rows and stats unchanged (no double counting)
    n_before = dedup.read_band_index(spark, idx).count()
    assert dedup.index_batch(day_bands["day1"], idx, "day1") is False
    import os
    assert sorted(os.listdir(f"{idx}/bands")) == ["batch_id=compacted"]
    assert dedup.read_band_index(spark, idx).count() == n_before
    # the streaming replay shape: the retried batch probes against
    # everyone else, never its own folded rows (zero self-matches)
    sigs1 = dedup.minhash_signatures(
        spark.read.parquet(str(batches / "day1")), "doc_id", "text"
    )
    hits = dedup.probe_band_index(
        sigs1,
        dedup.read_band_index(spark, idx, exclude_batch_id="day1"),
        "doc_id",
        index_band_sizes=dedup.read_band_stats(spark, idx, exclude_batch_id="day1"),
    )
    assert hits.filter(F.col("new_id") == F.col("match_id")).count() == 0


def test_compact_index_self_heals_crashed_swap(spark, batches, tmp_path):
    """Every crash window recovers on rerun: leftover staging discarded,
    a missing live dir rolled back from .compact_old, a completed swap's
    .compact_old dropped."""
    import os
    import shutil

    idx = str(tmp_path / "idx")
    for day in ("day1", "day2"):
        docs = spark.read.parquet(str(batches / day))
        bands = dedup.band_rows(dedup.minhash_signatures(docs, "doc_id", "text"), "doc_id")
        dedup.index_batch(bands, idx, day)
    truth = {(r.band_key, r.bsz) for r in dedup.read_band_stats(spark, idx).collect()}

    # window 1: crash before swap — staging exists, live untouched
    os.makedirs(f"{idx}/.compact_staging/bands/batch_id=junk", exist_ok=True)
    res = dedup.compact_index(spark, idx)
    assert res["n_batches"] == 2
    assert {(r.band_key, r.bsz) for r in dedup.read_band_stats(spark, idx).collect()} == truth

    # window 2: crash mid-swap — live bands moved aside, staging swapped
    # for bands but NOT stats; simulate by moving live bands to old
    os.makedirs(f"{idx}/.compact_old", exist_ok=True)
    shutil.move(f"{idx}/bands", f"{idx}/.compact_old/bands")
    res = dedup.compact_index(spark, idx)  # rolls back, then no-op (1 batch)
    assert res["n_batches"] == 1
    assert {(r.band_key, r.bsz) for r in dedup.read_band_stats(spark, idx).collect()} == truth


def test_compact_cli_e2e(spark, batches):
    idx = batches / "index_cli_compact"
    for day in ("day1", "day2"):
        r = _run("index", "--docs", batches / day, "--index", idx, "--batch-id", day)
        assert r.returncode == 0, r.stderr[-2000:]
    r = _run("compact", "--index", idx, "--n-partitions", 2)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "compacted 2 batches" in r.stdout
    import os
    assert sorted(os.listdir(str(idx / "bands"))) == ["batch_id=compacted"]
    # probe still answers over the compacted base
    out = batches / "hits_compacted"
    r = _run("probe", "--docs", batches / "day3", "--index", idx, "--out", out)
    assert r.returncode == 0, r.stderr[-2000:]
    got = {
        (row.new_id, row.match_id, row.origin)
        for row in spark.read.parquet(str(out)).collect()
    }
    assert (100, 0, "new_old") in got and (101, 2, "new_old") in got


def test_compact_index_drops_uncommitted_partitions(spark, batches, tmp_path):
    """A half-written partition (no _SUCCESS — crashed index_batch) is
    never folded: compaction drops it and leaves it out of the manifest,
    so the batch's retry writes normally instead of no-opping on rows
    that were never fully indexed."""
    import os

    idx = str(tmp_path / "idx")
    day_bands = {}
    for day in ("day1", "day2", "day3"):
        docs = spark.read.parquet(str(batches / day))
        bands = dedup.band_rows(dedup.minhash_signatures(docs, "doc_id", "text"), "doc_id")
        day_bands[day] = bands
        dedup.index_batch(bands, idx, day)
    # simulate day3's crash: committed marker never landed
    os.remove(f"{idx}/bands/batch_id=day3/_SUCCESS")
    day3_rows = day_bands["day3"].count()
    total_before = dedup.read_band_index(spark, idx).count()

    res = dedup.compact_index(spark, idx)
    assert res["n_batches"] == 2  # day3 not folded
    assert res["n_rows"] == total_before - day3_rows
    assert sorted(os.listdir(f"{idx}/bands")) == ["batch_id=compacted"]
    assert dedup.compacted_batch_ids(spark, idx) == {"day1", "day2"}
    # the retry is NOT a no-op — it indexes day3 for real
    assert dedup.index_batch(day_bands["day3"], idx, "day3") is True
    assert dedup.read_band_index(spark, idx).count() == total_before
    # stats consistent with a full recount after the retry
    recount = {
        (r.band_key, r.bsz)
        for r in dedup.read_band_index(spark, idx)
        .groupBy("band_key").agg(F.count(F.lit(1)).alias("bsz")).collect()
    }
    stats = {
        (r.band_key, r.bsz)
        for r in dedup.read_band_stats(spark, idx).collect()
    }
    assert stats == recount


def test_compact_index_cleans_orphan_stats(spark, batches, tmp_path):
    """A stats increment whose batch never committed its bands (the
    index_batch stats-before-bands crash window) is deleted at
    compaction, so a never-retried batch can't over-count its band keys
    forever. Stats of manifest-listed (folded) batches are NOT touched."""
    import os
    import shutil

    idx = str(tmp_path / "idx")
    for day in ("day1", "day2"):
        docs = spark.read.parquet(str(batches / day))
        bands = dedup.band_rows(dedup.minhash_signatures(docs, "doc_id", "text"), "doc_id")
        dedup.index_batch(bands, idx, day)
    # simulate the crash window: stats landed, bands never did
    shutil.copytree(f"{idx}/stats/batch_id=day1", f"{idx}/stats/batch_id=ghost")
    res = dedup.compact_index(spark, idx)
    assert res["n_batches"] == 2
    assert sorted(os.listdir(f"{idx}/stats")) == ["batch_id=compacted"]
    recount = {
        (r.band_key, r.bsz)
        for r in dedup.read_band_index(spark, idx)
        .groupBy("band_key").agg(F.count(F.lit(1)).alias("bsz")).collect()
    }
    assert {
        (r.band_key, r.bsz) for r in dedup.read_band_stats(spark, idx).collect()
    } == recount


def test_compact_index_refuses_markerless_index(spark, batches, tmp_path):
    """Every partition missing _SUCCESS means the committer's markers are
    disabled, not N simultaneous crashes — refuse loudly instead of
    silently deleting a committed index."""
    import os

    idx = str(tmp_path / "idx")
    for day in ("day1", "day2"):
        docs = spark.read.parquet(str(batches / day))
        bands = dedup.band_rows(dedup.minhash_signatures(docs, "doc_id", "text"), "doc_id")
        dedup.index_batch(bands, idx, day)
        os.remove(f"{idx}/bands/batch_id={day}/_SUCCESS")
    before = dedup.read_band_index(spark, idx).count()
    with pytest.raises(ValueError, match="_SUCCESS"):
        dedup.compact_index(spark, idx)
    assert dedup.read_band_index(spark, idx).count() == before  # untouched


def _stats_match_recount(spark, idx) -> bool:
    stats = {
        (r.band_key, r.bsz)
        for r in dedup.read_band_stats(spark, str(idx)).collect()
    }
    recount = {
        (r.band_key, r.bsz)
        for r in dedup.read_band_index(spark, str(idx))
        .groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .collect()
    }
    return stats == recount


def _bands_of(spark, batches, day):
    docs = spark.read.parquet(str(batches / day))
    return dedup.band_rows(
        dedup.minhash_signatures(docs, "doc_id", "text"), "doc_id"
    )


def test_changed_batch_reingest_after_compaction_raises(spark, batches, tmp_path):
    """The compaction manifest records each folded batch's content
    signature: an identical crashed-batch replay stays a no-op, but a
    batch whose CONTENT changed re-ingested under the folded id fails
    LOUDLY naming the remedy — never silently dropped while the index
    serves its stale rows."""
    idx = str(tmp_path / "idx")
    for day in ("day1", "day2"):
        dedup.index_batch(_bands_of(spark, batches, day), idx, day)
    dedup.compact_index(spark, idx)

    # identical replay: still the documented no-op
    assert dedup.index_batch(_bands_of(spark, batches, "day1"), idx, "day1") is False

    # changed content under the folded id: loud error, index untouched
    changed = spark.createDataFrame(
        [(0, BASE + " now modified"), (1, BASE), (2, OTHER)],
        "doc_id long, text string",
    )
    cbands = dedup.band_rows(
        dedup.minhash_signatures(changed, "doc_id", "text"), "doc_id"
    )
    n_before = dedup.read_band_index(spark, idx).count()
    with pytest.raises(ValueError, match="reindex_batch"):
        dedup.index_batch(cbands, idx, "day1")
    assert dedup.read_band_index(spark, idx).count() == n_before
    assert _stats_match_recount(spark, idx)


def test_delete_batch_live_partition(spark, batches, tmp_path):
    """Pre-compaction delete removes the batch's partition directories;
    its docs stop matching, stats stay exact, and the id is reusable."""
    idx = str(tmp_path / "idx")
    for day in ("day1", "day2"):
        dedup.index_batch(_bands_of(spark, batches, day), idx, day)

    res = dedup.delete_batch(spark, idx, "day2")
    assert res["live_partition_removed"] and not res["tombstoned"]
    ids = {r.doc_id for r in dedup.read_band_index(spark, idx).collect()}
    assert ids == {0, 1, 2}  # day2 docs (10, 11) gone
    assert _stats_match_recount(spark, idx)

    # a probe that would have matched day2's doc 10 finds only day1's 2
    sigs = dedup.minhash_signatures(
        spark.createDataFrame([(500, OTHER)], "doc_id long, text string"),
        "doc_id", "text",
    )
    got = {
        (r.new_id, r.match_id)
        for r in dedup.probe_band_index(
            sigs, dedup.read_band_index(spark, idx), "doc_id",
            index_band_sizes=dedup.read_band_stats(spark, idx),
        ).collect()
    }
    assert got == {(500, 2)}
    # the id is free again (no tombstone pre-compaction)
    assert dedup.index_batch(_bands_of(spark, batches, "day2"), idx, "day2") is True
    assert _stats_match_recount(spark, idx)
    with pytest.raises(ValueError, match="nothing to delete"):
        dedup.delete_batch(spark, idx, "never_indexed")


def test_delete_batch_tombstone_after_compaction(spark, batches, tmp_path):
    """Post-compaction delete tombstones the folded rows: readers drop
    them immediately, the next compaction drops them physically and
    clears the markers, and the id can never be silently resurrected."""
    import os

    idx = str(tmp_path / "idx")
    for day in ("day1", "day2"):
        dedup.index_batch(_bands_of(spark, batches, day), idx, day)
    dedup.compact_index(spark, idx)

    res = dedup.delete_batch(spark, idx, "day1")
    assert res["tombstoned"] and not res["live_partition_removed"]
    ids = {r.doc_id for r in dedup.read_band_index(spark, idx).collect()}
    assert ids == {10, 11}  # day1 docs gone from reads
    assert _stats_match_recount(spark, idx)
    # idempotent re-delete
    assert dedup.delete_batch(spark, idx, "day1")["newly_tombstoned"] is False

    # the deleted id cannot be resurrected by a plain index_batch
    with pytest.raises(ValueError, match="deleted"):
        dedup.index_batch(_bands_of(spark, batches, "day1"), idx, "day1")

    # next compaction physically drops the rows and clears the markers
    dedup.index_batch(_bands_of(spark, batches, "day3"), idx, "day3")
    dedup.compact_index(spark, idx)
    assert not os.path.exists(f"{idx}/tombstones")
    ids = {r.doc_id for r in dedup.read_band_index(spark, idx).collect()}
    assert ids == {10, 11, 100, 101, 102}
    assert _stats_match_recount(spark, idx)


def test_reindex_batch_e2e(spark, batches, tmp_path):
    """The registry-driven update path end-to-end: ingest day1+day2 ->
    compact -> day1's documents change -> reindex -> probes match the
    NEW content and never the stale folded rows, across a further
    compaction."""
    idx = str(tmp_path / "idx")
    for day in ("day1", "day2"):
        dedup.index_batch(_bands_of(spark, batches, day), idx, day)
    dedup.compact_index(spark, idx)

    # day1 revalidated: docs 0/1 rewritten to NEW near-dup content
    newtext = " ".join(f"rework{i} fresh{i * 3 % 7}" for i in range(25))
    day1v2 = spark.createDataFrame(
        [(0, newtext), (1, newtext.replace("rework12", "EDITED")), (2, OTHER)],
        "doc_id long, text string",
    )
    v2bands = dedup.band_rows(
        dedup.minhash_signatures(day1v2, "doc_id", "text"), "doc_id"
    )
    effective = dedup.reindex_batch(v2bands, idx, "day1")
    assert effective == "day1.g1"  # folded -> fresh generation id
    assert _stats_match_recount(spark, idx)

    def probe(text):
        sigs = dedup.minhash_signatures(
            spark.createDataFrame([(900, text)], "doc_id long, text string"),
            "doc_id", "text",
        )
        return {
            r.match_id
            for r in dedup.probe_band_index(
                sigs, dedup.read_band_index(spark, idx), "doc_id",
                index_band_sizes=dedup.read_band_stats(spark, idx),
            ).collect()
        }

    assert probe(newtext) == {0, 1}      # new content matches
    assert probe(BASE) == set()           # stale day1 rows never match
    assert 10 in probe(OTHER)             # day2 untouched

    # the update survives another compaction (stale rows now physically
    # gone) and a SECOND reindex advances the generation
    dedup.compact_index(spark, idx)
    assert probe(newtext) == {0, 1} and probe(BASE) == set()
    assert _stats_match_recount(spark, idx)
    assert dedup.reindex_batch(v2bands, idx, "day1") == "day1.g2"
    assert probe(newtext) == {0, 1} and probe(BASE) == set()
    assert _stats_match_recount(spark, idx)

    # pre-compaction reindex is the plain in-place overwrite
    idx2 = str(tmp_path / "idx2")
    dedup.index_batch(_bands_of(spark, batches, "day1"), idx2, "day1")
    assert dedup.reindex_batch(v2bands, idx2, "day1") == "day1"
    assert _stats_match_recount(spark, idx2)
    with pytest.raises(ValueError, match="generation suffix"):
        dedup.reindex_batch(v2bands, idx2, "day1.g1")


def test_reindex_delete_cli_e2e(spark, batches, tmp_path):
    """CLI faces of the update path: reindex a changed folded batch,
    then delete one."""
    idx = batches / "index_cli_update"
    for day in ("day1", "day2"):
        r = _run("index", "--docs", batches / day, "--index", idx, "--batch-id", day)
        assert r.returncode == 0, r.stderr[-2000:]
    r = _run("compact", "--index", idx)
    assert r.returncode == 0, r.stderr[-2000:]

    day1v2 = str(tmp_path / "day1v2")
    spark.createDataFrame(
        [(0, "totally new content after revalidation"), (1, BASE), (2, OTHER)],
        "doc_id long, text string",
    ).write.parquet(day1v2)
    r = _run("reindex", "--docs", day1v2, "--index", idx, "--batch-id", "day1")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "day1.g1" in r.stdout

    r = _run("delete", "--index", idx, "--batch-id", "day2")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "tombstoned" in r.stdout
    ids = {r2.doc_id for r2 in dedup.read_band_index(spark, str(idx)).collect()}
    assert ids == {0, 1, 2}
    assert _stats_match_recount(spark, idx)
