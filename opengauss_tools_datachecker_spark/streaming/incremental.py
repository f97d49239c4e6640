"""Incremental (streaming) validation via Structured Streaming.

The reference's incremental mode is vestigial — ProgressStatus.INCING
and tablepks exist but no incremental extractor was ever wired
(/root/reference src/main/java/com/gauss/common/model/ProgressStatus.java;
GaussController.java:234-250 always chooses the once-full extractor).
This module supplies what the reference stubbed out: newly-arriving
file rows are checksummed and verified against the manifest as they
land, with exactly-once-effective violation output (foreachBatch is
at-least-once on failure/replay, so each batch overwrites its own
``epoch=<id>`` partition — replays are idempotent), plus a watermarked
windowed event-rate monitor (the streaming analog of the reference's
StatAggregation TPS printer, StatAggregation.java:45-126).

Scale notes: the per-batch join is stream-static and deliberately
carries NO forced broadcast hint — the manifest is corpus-sized (one
row per file), so a forced hint would attempt an impossible broadcast
every epoch at 10^12-file scale. Pass a manifest read from the
bucketed layout (``sources.layout.read_bucketed``) so the per-epoch
join prunes/co-locates instead of shuffling the corpus; AQE still
runtime-broadcasts genuinely small manifests. Watermark bounds state;
output is append-only violations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.fixtures import KEY_COLS

FILES_STREAM_SCHEMA = (
    "file_id long, repo string, path string, commit string, lang string, "
    "content string, bucket int"
)


def incremental_sha256_check(
    spark: SparkSession,
    input_dir: str,
    manifest: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
):
    """Stream parquet file-rows from input_dir; verify sha256 against the
    static manifest; write violations under output_dir. Returns the query.

    Idempotent-by-epoch output: foreachBatch gives at-least-once batch
    delivery on failure/replay, so each batch OVERWRITES its own
    ``epoch=<epoch_id>`` subdirectory — a replayed epoch rewrites the
    same partition instead of appending duplicates, making the overall
    sink exactly-once-effective. Read the violations with
    ``spark.read.parquet(output_dir)`` (partition discovery adds the
    ``epoch`` column).

    Use ``trigger(availableNow=True)`` semantics via processAllAvailable
    in tests; in production this runs continuously as files land.
    """
    stream = spark.readStream.schema(FILES_STREAM_SCHEMA).parquet(input_dir)
    observed = stream.select(*KEY_COLS, F.sha2("content", 256).alias("observed"))

    def verify_batch(batch_df: DataFrame, epoch_id: int) -> None:
        violations = manifest_violations(batch_df, manifest)
        violations.write.mode("overwrite").parquet(f"{output_dir}/epoch={epoch_id}")

    return (
        observed.writeStream.foreachBatch(verify_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def manifest_violations(batch_df: DataFrame, manifest: DataFrame) -> DataFrame:
    """The per-epoch verification join of :func:`incremental_sha256_check`,
    exposed so its plan shape is directly testable: an UNFORCED
    stream-static left join — the manifest is corpus-sized (one row per
    file), so a forced broadcast hint would attempt an impossible
    broadcast every epoch at 10^12-file scale. Pass a manifest read
    from the bucketed layout (``sources.layout.read_bucketed``) and the
    join co-locates without shuffling the corpus; AQE still
    runtime-broadcasts a genuinely small manifest."""
    joined = batch_df.join(manifest, KEY_COLS, "left")
    return joined.filter(
        ~F.col("observed").eqNullSafe(F.col("expected_sha256"))
    ).select(
        F.lit("sha256_incremental").alias("rule_id"),
        F.concat_ws("|", *KEY_COLS).alias("key"),
        "observed",
        F.col("expected_sha256").alias("expected"),
    )


def running_repo_progress(
    stream: DataFrame,
    manifest: DataFrame,
):
    """Custom stateful operator: per-repo cumulative validation progress.

    The streaming analog of the reference's ProgressTracer/StatAggregation
    counters (/root/reference src/main/java/com/gauss/common/stats/
    ProgressTracer.java:52-94, StatAggregation.java:45-126) — but exact
    and distributed: each micro-batch's rows are verified against the
    static manifest (UNFORCED stream-static join — the manifest is
    corpus-sized; see module docstring), then
    ``applyInPandasWithState`` folds (rows_seen, mismatches) into
    per-repo state that survives across batches. Output mode "update":
    one row per repo per batch with the running totals.

    State is bounded by #repos (keys), not rows — safe indefinitely.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    observed = stream.select(
        "repo", *[c for c in KEY_COLS if c != "repo"], F.sha2("content", 256).alias("observed")
    )
    flagged = observed.join(manifest, KEY_COLS, "left").select(
        "repo",
        (~F.col("observed").eqNullSafe(F.col("expected_sha256"))).cast("long").alias("bad"),
    )

    def fold(key, pdfs, state: GroupState):
        n, bad = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            bad += int(pdf["bad"].sum())
        state.update((n, bad))
        yield pd.DataFrame({"repo": [key[0]], "n_rows": [n], "n_bad": [bad]})

    return flagged.groupBy("repo").applyInPandasWithState(
        fold,
        outputStructType="repo string, n_rows long, n_bad long",
        stateStructType="n long, bad long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_lang_histogram(stream: DataFrame) -> DataFrame:
    """Custom stateful operator: per-(bucket, lang) cumulative counts as
    file rows stream in — the streaming half of the drift rule (N4).

    ``applyInPandasWithState`` keyed by (bucket, value): state is one
    running count per key (bounded by buckets x langs, safe
    indefinitely); output mode "update" emits the refreshed histogram
    rows each micro-batch in exactly the (bucket, value, n) shape
    ``operators.drift.drift_verdicts`` consumes, so the BATCH drift
    test runs unchanged over the live stream's latest state — one
    code path for the statistics, batch or streaming.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = stream.select("bucket", F.col("lang").alias("value"))

    def fold(key, pdfs, state: GroupState):
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"bucket": [key[0]], "value": [key[1]], "n": [n]})

    return keyed.groupBy("bucket", "value").applyInPandasWithState(
        fold,
        outputStructType="bucket int, value string, n long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_exact_dedup(stream: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """First-occurrence exact dedup over a document stream: emits
    (digest, doc_id) ONCE per distinct sha256(content), as it first
    arrives — the streaming counterpart of ``dedup.exact_duplicates``
    for ingest-time filtering.

    ``applyInPandasWithState`` keyed by digest: state is a single
    emitted flag + winner id; within the first batch that carries a
    digest the smallest id wins (deterministic), later batches emit
    nothing. State grows with DISTINCT digests — for an unbounded
    ingest, production bounds it with a state TTL
    (``GroupStateTimeout.ProcessingTimeTimeout``) after the dedup
    horizon, or pre-filters with a broadcast Bloom filter of the
    historical digest set; the operator shape is unchanged.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = stream.select(
        F.sha2(F.col(text_col), 256).alias("digest"), F.col(id_col).alias("_id")
    )

    def fold(key, pdfs, state: GroupState):
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = pdf["_id"].min()
                best = m if best is None else min(best, m)
        if best is None or state.exists:
            return
        state.update((int(best),))
        yield pd.DataFrame({"digest": [key[0]], "doc_id": [int(best)]})

    return keyed.groupBy("digest").applyInPandasWithState(
        fold,
        outputStructType="digest string, doc_id long",
        stateStructType="winner long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_rates(
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked windowed aggregation over an event stream:
    (window, event_type, n, sum_value). Late rows beyond the watermark
    are dropped; state is bounded."""
    # watermarks require TIMESTAMP (tz-aware); session tz is pinned UTC
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(w, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )


DOCS_STREAM_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def streaming_neardup_index(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    output_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    band_size: int = 2,
    max_bucket_size: int = 1000,
    schema: str = DOCS_STREAM_SCHEMA,
):
    """Continuous-ingest near-duplicate detection over the MAINTAINED
    LSH band index: each micro-batch of documents is MinHash-signed,
    probed against everything indexed by PRIOR batches (plus within
    itself), and then indexed — so a doc streaming in today matches the
    corpus ingested before it without a single old doc being
    re-tokenized, re-hashed, or re-paired. This is the streaming face
    of ``dedup.index_batch``/``probe_band_index`` (the batch CLI is
    ``dedup_index.py``); per-batch cost is O(new bands ⋈ index), the
    10^12-doc daily-ingest shape.

    Exactly-once-effective under foreachBatch's at-least-once replay:

    - matches land in a ``run=<run>/epoch=<id>`` OVERWRITE partition
      (the epoch convention of :func:`incremental_sha256_check`, scoped
      by run — see below);
    - the probe reads the index and its stats EXCLUDING the epoch's own
      batch partition (``exclude_batch_id`` on the readers), so a retry
      that already half-indexed itself cannot emit every doc as its own
      'new_old' match or double-count the occupancy cap;
    - the index/stats writes are themselves per-batch overwrite
      partitions (``index_batch``), so the retry replaces rather than
      appends.

    Index batch ids are ``<run>.epoch_<n>`` where ``<run>`` is a random
    id minted once per checkpoint (:func:`neardup_run_id`, persisted
    under ``checkpoint_dir``). Epoch numbering restarts at 0 whenever
    the checkpoint is reset, so an UNSCOPED id would make a fresh query
    pointed at an existing index silently overwrite the prior run's
    ``epoch_0`` partitions — invisible data loss, because the probe
    excludes the epoch's own partition. Run-scoping keeps a restarted
    SAME-checkpoint query replay-idempotent (same run id → same
    partition → overwrite replaces the half-written retry) while a
    reset checkpoint gets fresh partition names and ACCRETES onto the
    index instead of destroying it.

    The match output is (new_id, match_id, origin) + the discovered
    ``run``/``epoch`` partition columns; union across epochs of a run =
    the pair set an offline probe of the same batches in arrival order
    would produce.
    """
    from opengauss_tools_datachecker_spark.operators import dedup

    run = neardup_run_id(spark, checkpoint_dir)
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        bid = f"{run}.epoch_{epoch_id}"
        sigs = dedup.minhash_signatures(batch_df, id_col, text_col, n_hashes)
        # ONE band frame per epoch, shared by the probe and the index
        # write (probe_band_index's bands= / index_batch's is_cached
        # contract), released whatever happens — an unreleased persist
        # per epoch would grow executor storage for the query's lifetime
        bands = dedup.band_rows(sigs, id_col, n_hashes, band_size).persist()
        try:
            # independent index/stats reads with the lost-stats
            # false-clean guard — shared with the batch-CLI composition
            index, stats = dedup.read_index_or_empty(
                s, index_path, bid, id_col,
                batch_df.schema[id_col].dataType.simpleString(),
            )
            matches = dedup.probe_band_index(
                sigs,
                index,
                id_col,
                n_hashes=n_hashes,
                band_size=band_size,
                max_bucket_size=max_bucket_size,
                index_band_sizes=stats,
                bands=bands,
            )
            matches.write.mode("overwrite").parquet(
                f"{output_dir}/run={run}/epoch={epoch_id}"
            )
            dedup.index_batch(
                bands, index_path, bid, n_hashes=n_hashes, band_size=band_size
            )
        finally:
            bands.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def neardup_run_id(spark: SparkSession, checkpoint_dir: str) -> str:
    """The run id bound to a streaming checkpoint: read it if the
    checkpoint has one, else mint one and persist it FIRST (before any
    epoch runs), so every restart of the same checkpoint — including a
    crash between the marker write and epoch 0 — resolves the same id.
    Stored via Spark (filesystem-agnostic, same as the index itself)."""
    import uuid

    from pyspark.errors import AnalysisException

    path = f"{checkpoint_dir}/neardup_run"
    try:
        return spark.read.parquet(path).first()["run_id"]
    except AnalysisException:
        rid = f"r{uuid.uuid4().hex[:12]}"
        spark.createDataFrame([(rid,)], "run_id string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        return rid
