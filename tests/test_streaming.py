from __future__ import annotations

from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark import fixtures as fx
from opengauss_tools_datachecker_spark.streaming.incremental import (
    incremental_sha256_check,
    windowed_event_rates,
)


def test_incremental_sha256(spark, small_files, tmp_path):
    inp = str(tmp_path / "incoming")
    out = str(tmp_path / "violations")
    ckpt = str(tmp_path / "ckpt")
    manifest = fx.manifest(small_files)

    corrupted, expected = fx.flip_bytes(small_files, 0.01)
    corrupted.write.parquet(inp)

    q = incremental_sha256_check(spark, inp, manifest, out, ckpt)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out)
    exp_keys = {"|".join([r.repo, r.path, r.commit]) for r in expected.collect()}
    assert {r["key"] for r in got.collect()} == exp_keys

    # second micro-batch: append clean rows -> no new violations
    small_files.limit(0).write.mode("append").parquet(inp)
    q2 = incremental_sha256_check(spark, inp, manifest, out, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out).count() == len(exp_keys)


def test_windowed_event_rates(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_rates(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rates")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("select sum(n) as total from rates").collect()[0]["total"]
    assert got == events.count()


def test_running_repo_progress_stateful(spark, small_files, tmp_path):
    """applyInPandasWithState totals accumulate across micro-batches."""
    from opengauss_tools_datachecker_spark.streaming.incremental import (
        FILES_STREAM_SCHEMA,
        running_repo_progress,
    )

    inp = str(tmp_path / "incoming")
    manifest = fx.manifest(small_files)
    corrupted, expected = fx.flip_bytes(small_files, 0.02)
    corrupted.write.parquet(inp)

    stream = spark.readStream.schema(FILES_STREAM_SCHEMA).parquet(inp)
    progress = running_repo_progress(stream, manifest)
    q = (
        progress.writeStream.format("memory")
        .queryName("repo_progress")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()

    # latest state per repo after batch 1: totals match the static truth
    latest = {
        r.repo: (r.n_rows, r.n_bad)
        for r in spark.sql("select * from repo_progress").collect()
    }
    truth = {
        r.repo: r.n
        for r in corrupted.groupBy("repo").agg(F.count("*").alias("n")).collect()
    }
    bad_truth = {
        r.repo: r.n
        for r in expected.groupBy("repo").agg(F.count("*").alias("n")).collect()
    }
    assert {k: v[0] for k, v in latest.items()} == truth
    assert {k: v[1] for k, v in latest.items() if v[1]} == bad_truth

    # batch 2: append the same rows -> per-repo totals double (state kept)
    corrupted.write.mode("append").parquet(inp)
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from repo_progress").collect()
    latest2 = {}
    for r in rows:  # memory sink in update mode appends; last write wins
        if r.n_rows >= latest2.get(r.repo, (0, 0))[0]:
            latest2[r.repo] = (r.n_rows, r.n_bad)
    assert {k: v[0] for k, v in latest2.items()} == {k: 2 * v for k, v in truth.items()}


def test_incremental_replay_is_idempotent(spark, small_files, tmp_path):
    """VERDICT r01 #8: a replayed micro-batch (foreachBatch is
    at-least-once) must not duplicate violation rows — each epoch
    overwrites its own partition."""
    inp = str(tmp_path / "incoming")
    out = str(tmp_path / "violations")
    manifest = fx.manifest(small_files)
    corrupted, expected = fx.flip_bytes(small_files, 0.01)
    corrupted.write.parquet(inp)

    q = incremental_sha256_check(spark, inp, manifest, out, str(tmp_path / "ckpt1"))
    q.processAllAvailable()
    q.stop()
    n_first = spark.read.parquet(out).count()
    assert n_first == expected.count()

    # fresh checkpoint over the same input replays epoch 0 verbatim
    q2 = incremental_sha256_check(spark, inp, manifest, out, str(tmp_path / "ckpt2"))
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out).count() == n_first


def test_running_lang_histogram_matches_batch_and_feeds_drift(spark, small_files, tmp_path):
    """The streaming histogram's final state equals the batch groupBy,
    and feeding it to the batch drift operator yields identical
    verdicts — one statistics code path for both modes."""
    from opengauss_tools_datachecker_spark.operators.drift import (
        categorical_histogram,
        drift_verdicts,
    )
    from opengauss_tools_datachecker_spark.streaming.incremental import (
        running_lang_histogram,
    )

    src = str(tmp_path / "files")
    small_files.write.parquet(src)
    stream = spark.readStream.schema(small_files.schema).parquet(src)
    q = (
        running_lang_histogram(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("lang_hist")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # latest state per key (update mode may emit a key several times)
    got = {
        (r.bucket, r.value): r.n
        for r in spark.sql(
            "SELECT bucket, value, MAX(n) AS n FROM lang_hist GROUP BY 1, 2"
        ).collect()
    }
    batch_hist = categorical_histogram(small_files.withColumnRenamed("lang", "value"),
                                       "value")
    want = {(r.bucket, r.value): r.n for r in batch_hist.collect()}
    assert got == want

    stream_hist = spark.createDataFrame(
        [(b, v, n) for (b, v), n in got.items()], "bucket int, value string, n long"
    )
    v_stream = {
        (r.bucket, r.drifted)
        for r in drift_verdicts(stream_hist, test="chi2", alpha=0.01).collect()
    }
    v_batch = {
        (r.bucket, r.drifted)
        for r in drift_verdicts(batch_hist, test="chi2", alpha=0.01).collect()
    }
    assert v_stream == v_batch


def test_streaming_exact_dedup_first_occurrence(spark, small_files, tmp_path):
    from pyspark.sql import functions as F

    from opengauss_tools_datachecker_spark.streaming.incremental import (
        streaming_exact_dedup,
    )

    src = str(tmp_path / "docs")
    base = small_files.select("file_id", "content").limit(50)
    dup = base.select((F.col("file_id") + 1000).alias("file_id"), "content")
    base.unionByName(dup).write.parquet(src)

    stream = spark.readStream.schema("file_id long, content string").parquet(src)
    q = (
        streaming_exact_dedup(stream, "file_id", "content")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    q.processAllAvailable()
    # second batch: all duplicates of batch one -> emits nothing
    base.select((F.col("file_id") + 2000).alias("file_id"), "content").write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT * FROM dedup_out").collect()
    assert len(rows) == 50                         # one per distinct digest
    assert all(r.doc_id < 1000 for r in rows)      # smallest id won, batch 1


def _neardup_docs(spark, ids, texts):
    rows = [(i, t, "en", "web", len(t)) for i, t in zip(ids, texts)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_streaming_neardup_index_two_waves(spark, tmp_path):
    """Wave 2 docs match wave-1 near-dups via the index (origin new_old)
    without wave 1 being re-hashed; within-wave dups are new_new."""
    from opengauss_tools_datachecker_spark.streaming.incremental import (
        streaming_neardup_index,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today "
    other = "completely different content about database validation engines here "
    inp, idx = str(tmp_path / "in"), str(tmp_path / "idx")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    # wave 1: two near-identical docs (1, 2) + one unrelated (3)
    _neardup_docs(spark, [1, 2, 3], [base + "x", base + "y", other * 2]).write.parquet(inp)
    q = streaming_neardup_index(spark, inp, idx, out, ckpt)
    q.processAllAvailable()
    q.stop()

    got1 = {(r.new_id, r.match_id, r.origin) for r in spark.read.parquet(out).collect()}
    assert got1 == {(1, 2, "new_new")}  # within-batch pair, id-ordered

    # wave 2: doc 10 duplicates wave-1 doc 1; doc 11 is fresh
    _neardup_docs(spark, [10, 11], [base + "x", "nothing like anything seen before " * 3]).write.mode(
        "append"
    ).parquet(inp)
    q = streaming_neardup_index(spark, inp, idx, out, ckpt)
    q.processAllAvailable()
    q.stop()

    got = {(r.new_id, r.match_id, r.origin) for r in spark.read.parquet(out).collect()}
    assert (10, 1, "new_old") in got and (10, 2, "new_old") in got
    assert not any(r[0] == 11 for r in got - got1)  # fresh doc matches nothing
    # the index now holds both waves' band rows and consistent stats
    from opengauss_tools_datachecker_spark.operators.dedup import (
        read_band_index,
        read_band_stats,
    )

    bands = read_band_index(spark, idx)
    stats = read_band_stats(spark, idx)
    recount = bands.groupBy("band_key").count()
    joined = stats.join(recount, "band_key", "full")
    assert joined.filter("bsz IS NULL OR count IS NULL OR bsz <> count").count() == 0


def test_streaming_neardup_replay_idempotent(spark, tmp_path):
    """A replayed epoch (foreachBatch at-least-once) produces the SAME
    match set: the probe excludes the epoch's own index partition, so
    the half-indexed retry can't self-match."""
    from opengauss_tools_datachecker_spark.operators import dedup
    from opengauss_tools_datachecker_spark.streaming.incremental import (
        streaming_neardup_index,
    )

    base = "some repeated sentence for minhash shingles to latch onto firmly "
    inp, idx = str(tmp_path / "in"), str(tmp_path / "idx")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _neardup_docs(spark, [1, 2], [base + "a", base + "b"]).write.parquet(inp)

    q = streaming_neardup_index(spark, inp, idx, out, ckpt)
    q.processAllAvailable()
    q.stop()
    first = {(r.new_id, r.match_id, r.origin) for r in spark.read.parquet(out).collect()}

    # simulate the replay: run the SAME epoch's work again by hand —
    # index partition <run>.epoch_0 already exists from the first run
    from opengauss_tools_datachecker_spark.streaming.incremental import neardup_run_id

    bid = f"{neardup_run_id(spark, ckpt)}.epoch_0"
    batch = _neardup_docs(spark, [1, 2], [base + "a", base + "b"])
    sigs = dedup.minhash_signatures(batch, "doc_id", "text", 8)
    index = dedup.read_band_index(spark, idx, exclude_batch_id=bid)
    stats = dedup.read_band_stats(spark, idx, exclude_batch_id=bid)
    replayed = dedup.probe_band_index(
        sigs, index, "doc_id", index_band_sizes=stats
    )
    got = {(r.new_id, r.match_id, r.origin) for r in replayed.collect()}
    assert got == first  # no self-matches, no duplicates — same verdicts
    # WITHOUT the exclusion every doc would match itself in the index
    naive = dedup.probe_band_index(
        sigs, dedup.read_band_index(spark, idx), "doc_id",
        index_band_sizes=dedup.read_band_stats(spark, idx),
    )
    assert any(r.new_id == r.match_id for r in naive.collect())


def test_streaming_neardup_checkpoint_reset_accretes(spark, tmp_path):
    """A NEW query (reset checkpoint) pointed at an EXISTING index must
    not overwrite the prior run's epoch-0 partitions: run-scoped batch
    ids make epoch numbering collisions impossible, so the old corpus
    survives and the new batch matches against it."""
    import shutil

    from opengauss_tools_datachecker_spark.operators.dedup import read_band_index
    from opengauss_tools_datachecker_spark.streaming.incremental import (
        streaming_neardup_index,
    )

    base = "a stable sentence that produces plenty of shingle overlap here "
    inp, idx = str(tmp_path / "in"), str(tmp_path / "idx")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    _neardup_docs(spark, [1, 2], [base + "a", base + "b"]).write.parquet(inp)
    q = streaming_neardup_index(spark, inp, idx, out, ckpt)
    q.processAllAvailable()
    q.stop()
    indexed_before = read_band_index(spark, idx).select("doc_id").distinct().count()
    assert indexed_before == 2

    # ops move: checkpoint relocated/reset, index retained; the restarted
    # query's epoch ids begin again at 0
    shutil.rmtree(ckpt)
    inp2 = str(tmp_path / "in2")
    _neardup_docs(spark, [10], [base + "a"]).write.parquet(inp2)
    q = streaming_neardup_index(spark, inp2, idx, out, ckpt)
    q.processAllAvailable()
    q.stop()

    # old run's partitions intact (3 docs indexed), and the new doc
    # matched the OLD corpus — which an epoch_0 overwrite would have lost
    assert read_band_index(spark, idx).select("doc_id").distinct().count() == 3
    got = {(r.new_id, r.match_id, r.origin) for r in spark.read.parquet(out).collect()}
    assert (10, 1, "new_old") in got and (10, 2, "new_old") in got


def test_manifest_join_unforced_broadcast(spark, small_files, tmp_path):
    """Scale property: the per-epoch verification join carries NO forced
    broadcast hint on the corpus-sized manifest — with broadcast
    disabled (the stand-in for 'manifest outgrew broadcast capacity')
    it degrades to a shuffle join, completes, and the full streaming
    check still produces the right violations."""
    from opengauss_tools_datachecker_spark.streaming.incremental import (
        incremental_sha256_check,
        manifest_violations,
    )

    manifest = fx.manifest(small_files)
    corrupted, expected = fx.flip_bytes(small_files, 0.01)
    exp_keys = {"|".join([r.repo, r.path, r.commit]) for r in expected.collect()}
    batch = corrupted.select(
        "repo", "path", "commit", F.sha2("content", 256).alias("observed")
    )
    conf = spark.conf
    old_static = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        v = manifest_violations(batch, manifest)
        assert {r["key"] for r in v.collect()} == exp_keys
        plan = v._jdf.queryExecution().executedPlan().toString()
        # no hint anywhere in this join -> zero broadcast exchanges when
        # thresholds are off (an explicit hint would still force one)
        assert "BroadcastExchange" not in plan
        # and the real streaming path end-to-end under the same config
        inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
        corrupted.write.parquet(inp)
        q = incremental_sha256_check(spark, inp, manifest, out, ckpt)
        q.processAllAvailable()
        q.stop()
        assert {r["key"] for r in spark.read.parquet(out).collect()} == exp_keys
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_static)
        conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_streaming_neardup_missing_stats_probes_real_index(spark, tmp_path):
    """An index whose stats tree is lost/corrupt must NOT make the next
    epoch silently probe an EMPTY index (missed matches reported clean):
    the bands read succeeding while the stats read fails now passes
    stats=None, so the probe recounts occupancy from the index itself
    and wave-1 matches are still found."""
    import shutil

    from opengauss_tools_datachecker_spark.streaming.incremental import (
        streaming_neardup_index,
    )

    base = "a steady sentence giving minhash plenty of shingles to hold onto "
    inp, idx = str(tmp_path / "in"), str(tmp_path / "idx")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    _neardup_docs(spark, [1, 2], [base + "a", base + "b"]).write.parquet(inp)
    q = streaming_neardup_index(spark, inp, idx, out, ckpt)
    q.processAllAvailable()
    q.stop()

    shutil.rmtree(f"{idx}/stats")  # bands survive, stats tree lost

    _neardup_docs(spark, [10], [base + "a"]).write.mode("append").parquet(inp)
    q = streaming_neardup_index(spark, inp, idx, out, ckpt)
    q.processAllAvailable()
    q.stop()

    got = {(r.new_id, r.match_id, r.origin) for r in spark.read.parquet(out).collect()}
    # the old both-reads-in-one-try fallback reported doc 10 CLEAN here
    assert (10, 1, "new_old") in got and (10, 2, "new_old") in got
