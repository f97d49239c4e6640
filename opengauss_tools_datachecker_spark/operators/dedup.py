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

import hashlib
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opengauss_tools_datachecker_spark.functions.text import (
    minhash_signature,
    shingles,
    simhash16,
    tokens,
)

# ---------------------------------------------------------------------------
# Arrow-batched kernels for the hash-per-shingle hot paths.
#
# The Catalyst higher-order-function forms in functions/text.py are the
# SQL-portable SPEC (each has a DuckDB oracle twin); but Spark evaluates
# HOF lambdas INTERPRETED per element — md5-per-shingle pipelines spend
# ~10µs/element on interpretation (measured: 5000 docs × 52 shingles × 8
# hashes = 20.8s). The kernels below produce BYTE-IDENTICAL strings
# (md5 hex — no floating point anywhere) via mapInPandas, so oracle
# parity is untouched while the hashing runs at C speed.
#
# Tokenization mirror: F.split(F.trim(c), r"\s+") — Spark trim strips
# ASCII SPACE only, and Java's \s is exactly [ \t\n\x0B\f\r].
# ---------------------------------------------------------------------------

_JAVA_WS = re.compile(r"[ \t\n\x0B\f\r]+")


def _py_tokens(text: str | None) -> list[str] | None:
    """NULL text mirrors split(trim(NULL)) = NULL — callers treat None as
    the null token array (shingles -> [], simhash votes -> all zero),
    matching the Catalyst spec instead of coalescing to [''] (which would
    hash md5('') and diverge for NULL documents)."""
    if text is None:
        return None
    return _JAVA_WS.split(text.strip(" "))


def _py_shingles(toks: list[str] | None, n: int) -> list[str]:
    if toks is None or len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str, max_exemplars: int | None = 16
) -> DataFrame:
    """Groups of byte-identical documents: (digest, n_docs, doc_ids).

    ``n_docs`` is always the exact group count; ``doc_ids`` holds at
    most ``max_exemplars`` (smallest ids) — one degenerate digest (empty
    docs, boilerplate headers) can have 10^8 members at corpus scale,
    and an unbounded ``collect_list`` would build a multi-GB array row
    on a single reducer. The exemplars come from a row_number window
    pre-prune, NOT ``slice(collect_list(...))``: WindowExec sort-streams
    the group and the post-filter collect_list buffers at most K ids,
    whereas slicing after collect_list still materializes the whole
    roster in the aggregation buffer first. The count agg and the
    window/collect hash-partition on the same key, so the final join
    adds no exchange. ``max_exemplars=None`` keeps the full roster — an
    explicit small-data opt-in, same contract as the LSH path's
    ``max_bucket_size``.
    """
    digests = df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("digest"))
    counts = digests.groupBy("digest").agg(F.count(F.lit(1)).alias("n_docs"))
    pruned = digests
    if max_exemplars is not None:
        w = Window.partitionBy("digest").orderBy(id_col)
        pruned = (
            digests.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_exemplars)
            .drop("_rn")
        )
    exemplars = pruned.groupBy("digest").agg(
        F.sort_array(F.collect_list(id_col)).alias("doc_ids")
    )
    return counts.join(exemplars, "digest").filter(F.col("n_docs") > 1)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 8, shingle_n: int = 3
) -> DataFrame:
    """Per-doc MinHash signature columns mh0..mh{n-1} (map-only kernel).

    Same strings as the Catalyst spec ``functions.text.minhash_signature``
    (md5-as-permutation, min over hex digests); docs too short to shingle
    get NULL signatures, matching array_min over an empty array.
    """
    id_type = df.schema[id_col].dataType.simpleString()
    prefixes = [f"mh{j}_" for j in range(n_hashes)]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {id_col: list(pdf["_id"])}
            cols: list[list] = [[] for _ in range(n_hashes)]
            for text in pdf["_text"]:
                sh = _py_shingles(_py_tokens(text), shingle_n)
                if not sh:
                    for c in cols:
                        c.append(None)
                    continue
                for j, pre in enumerate(prefixes):
                    cols[j].append(min(_md5(pre + s) for s in sh))
            for j in range(n_hashes):
                out[f"mh{j}"] = cols[j]
            yield pd.DataFrame(out)

    mh_schema = ", ".join(f"mh{j} string" for j in range(n_hashes))
    return df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).mapInPandas(kernel, schema=f"{id_col} {id_type}, {mh_schema}")


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, ngram_n: int = 3
) -> DataFrame:
    """Within-document repetition: (id, n_grams, n_distinct, dup_ratio).

    The Gopher-style repetitious-text quality signal: dup_ratio =
    1 - distinct/total word n-grams — boilerplate, template spam, and
    degenerate generations score high. Map-only Arrow kernel (same
    tokenizer mirror as the dedup sketches); docs too short to form a
    single n-gram are dropped, NULL text ⇒ NULL token array ⇒ dropped.
    The kernel emits only the integer counts; the ratio (and its
    rounding) is left to Catalyst so the float math runs through the
    same IEEE ops as the DuckDB twin (list_distinct over the same
    shingles) — hash-identical output.
    """
    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, total, uniq = [], [], []
            for i, text in zip(pdf["_id"], pdf["_text"]):
                sh = _py_shingles(_py_tokens(text), ngram_n)
                if not sh:
                    continue
                ids.append(i)
                total.append(len(sh))
                uniq.append(len(set(sh)))
            yield pd.DataFrame({id_col: ids, "n_grams": total, "n_distinct": uniq})

    counts = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text")).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, n_grams int, n_distinct int"
    )
    return counts.withColumn(
        "dup_ratio",
        F.round(F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_grams"), 6),
    )


def band_rows(
    signatures: DataFrame, id_col: str, n_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """(id, band_key) rows — the LSH index representation.

    This IS the persistable near-dup index: write it out partitioned/
    bucketed by ``band_key`` and new batches probe it with
    :func:`probe_band_index` without recomputing anything for the
    already-indexed corpus. Docs too short to shingle (NULL signatures)
    are excluded — concat_ws would collapse them all into one band key
    ("0#") and pair them spuriously.
    """
    n_bands = n_hashes // band_size
    signatures = signatures.filter(F.col("mh0").isNotNull())
    return signatures.select(
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


#: batch ids become partition directory names (same contract as the
#: snapshot registry's ids)
_SAFE_BATCH_ID = re.compile(r"[A-Za-z0-9._-]+")


def index_batch(
    bands: DataFrame,
    index_path: str,
    batch_id: str,
    n_hashes: int | None = None,
    band_size: int | None = None,
) -> bool:
    """Append one batch's (id, band_key) rows to the persistable LSH
    band index AND maintain its per-band stats — without ever rescanning
    the already-indexed corpus. Returns True if the batch was written,
    False for the already-compacted no-op below.

    Layout under ``index_path``:

    - ``stats/batch_id=<id>/`` — the batch's (band_key, bsz) counts
    - ``bands/batch_id=<id>/`` — the batch's :func:`band_rows` output
    - ``meta/`` — one (n_hashes, band_size) row, written on the first
      batch when the parameters are supplied; later batches with
      DIFFERENT parameters are rejected (mismatched banding would make
      probes silently miss everything)

    The stats table is the union of per-batch INCREMENTS, aggregated at
    read time by :func:`read_band_stats` (band vocabulary ≪ corpus, and
    the per-batch slice is tiny) — so maintaining the degenerate-bucket
    cap's input never costs an index scan, which is the point of
    :func:`probe_band_index`'s ``index_band_sizes`` fast path. Both
    writes are per-batch partition directories in overwrite mode, so a
    crashed-and-retried batch replaces its rows idempotently instead of
    double-counting. WRITE ORDER MATTERS: stats land BEFORE bands, so a
    crash between the two leaves stats claiming rows the index doesn't
    have yet — the cap then OVER-counts (safe, conservative) until the
    batch retry overwrites both; the reverse order would under-count
    and silently exempt an oversized bucket from the cap.

    Retry AFTER :func:`compact_index` folded the batch away: the rows
    are already in the compacted base (band rows are deterministic in
    the doc content, and only a COMMITTED partition gets folded), so
    re-writing the per-batch partition would duplicate them — the call
    is a NO-OP returning False instead. That no-op is gated by the
    manifest's per-batch content signature: a batch whose CONTENT
    changed since it was folded (a revalidated bucket re-ingested under
    the same id) raises loudly with the remedy
    (:func:`reindex_batch`) instead of silently discarding the new
    rows. A batch deleted via :func:`delete_batch` likewise raises —
    its id is tombstoned, never silently resurrected.
    """
    if not _SAFE_BATCH_ID.fullmatch(batch_id) or batch_id in (".", ".."):
        raise ValueError(
            f"batch_id {batch_id!r} is not a safe partition name "
            "(allowed: [A-Za-z0-9._-]+, not '.' or '..')"
        )
    spark = bands.sparkSession
    if n_hashes is not None and band_size is not None:
        recorded = read_index_meta(spark, index_path)
        if recorded is None:
            spark.createDataFrame(
                [(int(n_hashes), int(band_size))], "n_hashes int, band_size int"
            ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/meta")
        elif recorded != (n_hashes, band_size):
            raise ValueError(
                f"band-index parameter mismatch: index {index_path!r} was "
                f"built with (n_hashes, band_size)={recorded}, batch "
                f"{batch_id!r} uses ({n_hashes}, {band_size}); mismatched "
                "banding never matches any key — rebuild or fix the flags"
            )
    # AFTER the parameter validation (a misconfigured retry must still
    # raise loudly, not be masked by the no-op): a deleted batch must
    # not be resurrected under its old id, and an already-folded
    # batch's rows live in the compacted base — rewriting its partition
    # would duplicate them
    if batch_id in read_tombstones(spark, index_path):
        raise ValueError(
            f"batch {batch_id!r} was deleted from index {index_path!r} "
            "(tombstoned); re-ingest its current content via "
            "reindex_batch, which writes under a fresh generation id"
        )
    folded = read_index_manifest(spark, index_path)
    if batch_id in folded:
        recorded = folded[batch_id]
        if recorded is not None and recorded != _batch_signature(bands):
            # the manifest records each folded batch's content signature
            # exactly so a CHANGED batch re-ingested under a folded id
            # fails loudly instead of being silently dropped while the
            # index keeps serving its stale rows
            raise ValueError(
                f"batch {batch_id!r} was already folded into the "
                f"compacted base of {index_path!r} with DIFFERENT "
                "content (manifest signature mismatch) — an identical "
                "crashed-batch replay would no-op, but this batch's "
                "rows changed; re-ingest it via reindex_batch (which "
                "tombstones the stale folded rows and writes under a "
                "fresh generation id)"
            )
        return False
    # a caller that already persisted the band frame (the streaming
    # path shares ONE frame between probe and index) owns its lifecycle;
    # only persist-and-release frames this function created the cache
    # for. Checked BEFORE the src_batch projection below — the derived
    # frame always reports is_cached=False, and persisting it would
    # silently double every epoch's cached band rows.
    owned = not bands.is_cached
    # every row carries its origin so the schema stays UNIFORM with the
    # compacted partition's src_batch tag (readers then never need a
    # parquet footer-merge) and replay exclusion works either way
    bands = bands.withColumn("src_batch", F.lit(batch_id))
    if owned:
        bands = bands.persist()
    (
        bands.groupBy("band_key", "src_batch")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{index_path}/stats/batch_id={batch_id}")
    )
    bands.write.mode("overwrite").parquet(f"{index_path}/bands/batch_id={batch_id}")
    if owned:
        bands.unpersist()
    return True


def read_index_meta(spark, index_path: str) -> tuple[int, int] | None:
    """The index's recorded (n_hashes, band_size), or None for an index
    created before any metadata was supplied. Filesystem-agnostic: a
    missing meta directory is simply 'no metadata', not an error."""
    from pyspark.errors import AnalysisException

    try:
        row = spark.read.parquet(f"{index_path}/meta").first()
    except AnalysisException:
        return None
    return (int(row["n_hashes"]), int(row["band_size"])) if row else None


def _index_fs(spark, index_path: str):
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    return hpath, hpath(index_path).getFileSystem(spark._jsc.hadoopConfiguration())


def _manifest_exists(spark, index_path: str) -> bool:
    hpath, fs = _index_fs(spark, index_path)
    return fs.exists(hpath(f"{index_path}/manifest"))


def compacted_batch_ids(spark, index_path: str) -> set[str]:
    """Batch ids whose partitions were folded away by
    :func:`compact_index` (their rows now live in the compacted base
    partition, tagged by the ``src_batch`` column). Empty for an index
    never compacted — detected with one filesystem call, no read
    attempt, so the per-micro-batch :func:`index_batch` check costs
    nothing on the common never-compacted index."""
    return set(read_index_manifest(spark, index_path))


def read_index_manifest(spark, index_path: str) -> dict:
    """The compaction manifest as {batch_id: (n_rows, sig) | None}.

    ``sig`` is the batch's order-independent content signature — the
    decimal-sum combiner of ``sources.snapshots.bucket_signatures``
    applied to the batch's (id, band_key) rows (see
    :func:`_batch_signature`) — recorded at fold time so a folded
    batch_id re-ingested with CHANGED content can be detected and
    rejected instead of silently dropped. ``None`` marks an entry from
    a legacy manifest written before signatures existed (batch_id-only
    schema): those keep the original identical-replay no-op contract,
    with no mismatch detection possible. Manifest-sized collect
    (one row per folded batch)."""
    if not _manifest_exists(spark, index_path):
        return {}
    df = spark.read.parquet(f"{index_path}/manifest")
    has_sig = "sig" in df.columns and "n_rows" in df.columns
    return {
        r["batch_id"]: (
            (int(r["n_rows"]), int(r["sig"]))
            if has_sig and r["sig"] is not None
            else None
        )
        for r in df.collect()
    }


def _batch_signature(bands: DataFrame) -> tuple[int, int]:
    """(n_rows, sig) for one batch's band rows: the order- and
    partitioning-independent decimal-sum of xxhash64(id, band_key)
    (the multiset-sensitive combiner of sources/snapshots.py) — two
    frames holding the same (id, band_key) multiset always agree, any
    changed/added/dropped row changes the sum. One metadata-sized agg."""
    idc = [
        c for c in bands.columns if c not in ("band_key", "src_batch", "batch_id")
    ][0]
    row = bands.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(
            F.sum(
                F.xxhash64(F.col(idc), F.col("band_key")).cast("decimal(28,0)")
            ),
            F.lit(0).cast("decimal(28,0)"),
        ).alias("sig"),
    ).first()
    return int(row["n_rows"]), int(row["sig"])


def read_tombstones(spark, index_path: str) -> set[str]:
    """Batch ids deleted by :func:`delete_batch` AFTER they were folded
    into the compacted base: their rows still sit physically inside the
    compacted partition (tagged ``src_batch``) until the next
    :func:`compact_index` drops them, so every reader filters them out.
    Empty-set fast path is one filesystem call (like the manifest)."""
    hpath, fs = _index_fs(spark, index_path)
    if not fs.exists(hpath(f"{index_path}/tombstones")):
        return set()
    return {
        r["batch_id"]
        for r in spark.read.parquet(f"{index_path}/tombstones").collect()
    }


def _drop_tombstoned(df: DataFrame, tombstones: set[str]) -> DataFrame:
    """Filter out rows originating from tombstoned batches. NULL-safe:
    legacy pre-tag rows (src_batch NULL under a schema merge) are kept —
    they predate tombstones by construction. The tombstone set is
    metadata-sized (deletions since the last compaction), so an isin
    literal list folds into the scan filter."""
    if not tombstones or "src_batch" not in df.columns:
        return df
    return df.filter(
        F.col("src_batch").isNull()
        | ~F.col("src_batch").isin(sorted(tombstones))
    )


def _live_batch_ids(spark, index_path: str) -> set[str]:
    """Batch ids with a live per-batch bands partition directory."""
    hpath, fs = _index_fs(spark, index_path)
    bands_dir = hpath(f"{index_path}/bands")
    if not fs.exists(bands_dir):
        return set()
    return {
        st.getPath().getName().split("=", 1)[1]
        for st in fs.listStatus(bands_dir)
        if st.isDirectory() and st.getPath().getName().startswith("batch_id=")
    }


def delete_batch(spark, index_path: str, batch_id: str) -> dict:
    """Remove one batch's rows from the band index — the delete half of
    the update path the registry's dirty-bucket planning feeds
    (``sources.snapshots.changed_buckets`` names the buckets whose
    documents changed; this removes their stale band rows so they stop
    matching).

    Pre-compaction (live per-batch partition): the partition
    directories are deleted outright — bands FIRST, then stats, so the
    crash window between the two leaves an over-counting orphan stats
    increment (safe, conservative — same order argument as
    :func:`index_batch`'s write order) that the next
    :func:`compact_index` cleans up.

    Post-compaction (id in the manifest): the rows live inside the
    compacted base partition, so a directory delete is impossible —
    the id is TOMBSTONED instead: readers
    (:func:`read_band_index`/:func:`read_band_stats`) filter
    tombstoned ``src_batch`` rows from this call on, and the next
    :func:`compact_index` physically drops them and clears the
    tombstone. Idempotent: re-deleting an already-tombstoned id is a
    no-op. Run offline like compaction (plain-parquet layout, no
    snapshot protocol).

    Returns {"batch_id", "live_partition_removed", "tombstoned"};
    raises if the id is in neither the live layout nor the manifest.
    """
    if not _SAFE_BATCH_ID.fullmatch(batch_id) or batch_id in (".", ".."):
        raise ValueError(f"batch_id {batch_id!r} is not a safe partition name")
    hpath, fs = _index_fs(spark, index_path)
    removed_live = False
    bdir = hpath(f"{index_path}/bands/batch_id={batch_id}")
    sdir = hpath(f"{index_path}/stats/batch_id={batch_id}")
    if fs.exists(bdir):
        fs.delete(bdir, True)
        removed_live = True
    if fs.exists(sdir):
        fs.delete(sdir, True)
    folded = batch_id in read_index_manifest(spark, index_path)
    newly_tombstoned = False
    if folded and batch_id not in read_tombstones(spark, index_path):
        spark.createDataFrame([(batch_id,)], "batch_id string").coalesce(
            1
        ).write.mode("append").parquet(f"{index_path}/tombstones")
        newly_tombstoned = True
    if not removed_live and not folded:
        raise ValueError(
            f"batch {batch_id!r} not found in index {index_path!r}: no "
            "live partition and no manifest entry — nothing to delete"
        )
    return {
        "batch_id": batch_id,
        "live_partition_removed": removed_live,
        "tombstoned": folded,
        "newly_tombstoned": newly_tombstoned,
    }


_GEN_SUFFIX = re.compile(r"\.g(\d+)$")


def reindex_batch(
    bands: DataFrame,
    index_path: str,
    batch_id: str,
    n_hashes: int | None = None,
    band_size: int | None = None,
) -> str:
    """Re-ingest a batch whose documents CHANGED since they were
    indexed — the update half of the registry-driven incremental story
    (dirty buckets → recompute → reindex). Returns the EFFECTIVE batch
    id the rows were written under.

    Pre-compaction the per-batch partition overwrite already IS the
    update path, so the call reduces to :func:`index_batch` under the
    same id. Once the id (or a prior generation of it) was folded into
    the compacted base, its stale rows can't be overwritten in place:
    every existing generation is deleted (:func:`delete_batch` —
    directory removal for live partitions, tombstones for folded rows)
    and the new content is written under the next GENERATION id
    (``<batch_id>.g<n>``). Generation ids keep the tombstone exact —
    the stale rows' ``src_batch`` tag never collides with the new
    rows' — and survive any number of compaction/reindex cycles.
    Probe-side replay exclusion (``exclude_batch_id``) should use the
    returned effective id. Run offline like compaction.
    """
    if not _SAFE_BATCH_ID.fullmatch(batch_id) or batch_id in (".", ".."):
        raise ValueError(f"batch_id {batch_id!r} is not a safe partition name")
    if _GEN_SUFFIX.search(batch_id):
        raise ValueError(
            f"batch_id {batch_id!r} carries a generation suffix; pass the "
            "base id — reindex_batch assigns generations itself"
        )
    spark = bands.sparkSession
    manifest = read_index_manifest(spark, index_path)
    live = _live_batch_ids(spark, index_path)
    known = set(manifest) | live

    def _is_gen(b: str) -> bool:
        if b == batch_id:
            return True
        m = _GEN_SUFFIX.search(b)
        return m is not None and b[: m.start()] == batch_id

    gens = sorted(b for b in known if _is_gen(b))
    if not any(g in manifest for g in gens):
        # nothing folded: in-place overwrite replaces live rows exactly
        index_batch(bands, index_path, batch_id, n_hashes, band_size)
        return batch_id
    tombs = read_tombstones(spark, index_path)
    for g in gens:
        if g in live or (g in manifest and g not in tombs):
            delete_batch(spark, index_path, g)
    next_n = 1 + max(
        (int(m.group(1)) for g in gens if (m := _GEN_SUFFIX.search(g))),
        default=0,
    )
    effective = f"{batch_id}.g{next_n}"
    index_batch(bands, index_path, effective, n_hashes, band_size)
    return effective


def compact_index(
    spark,
    index_path: str,
    compact_id: str = "compacted",
    n_partitions: int | None = None,
) -> dict:
    """Fold ALL per-batch partitions of the band index into ONE base
    partition (``batch_id=<compact_id>``) — offline index maintenance
    for the daily-ingest shape, where thousands of small batch
    partitions accumulate into a small-files problem and the read-time
    stats fold grows linearly with file count. After compaction the
    index answers the same probes (same rows, same totals), reads one
    partition, and new batches keep appending incrementally.

    The replay/retry contracts SURVIVE compaction: every folded band
    row keeps its origin in a ``src_batch`` column, so
    ``read_band_index/read_band_stats(exclude_batch_id=...)`` still
    exclude a replayed batch exactly (compacted stats are folded per
    (band_key, src_batch) for the same reason); and the set of folded
    ids is recorded in an atomically-swapped ``manifest``, which makes
    a crashed-and-retried :func:`index_batch` of an already-folded
    batch a documented NO-OP instead of a silent row duplication.

    The compacted band rows are clustered (repartition + sort) by
    ``band_key``, so parquet row groups carry tight band_key min/max —
    better compression and pruning for any key-filtered maintenance
    scan.

    Only COMMITTED batch partitions are folded (those carrying the
    committer's ``_SUCCESS`` marker — the default Spark/Hadoop output
    committer writes it; do not disable it on indexed writes).
    Partitions WITHOUT the marker are half-written leftovers of a
    crashed :func:`index_batch`: compaction DROPS them (with their
    stats increments), keeping bands and stats exactly consistent, and
    leaves them out of the manifest — the batch's retry then writes
    normally instead of being silently no-opped on rows that were
    never fully indexed.

    Crash safety: band rows are staged under ``.compact_staging``, then
    swapped in with per-directory ATOMIC renames (live → ``.compact_old``,
    staging → live); stats are recomputed FROM the staged band rows, so
    compaction cannot change any (band_key, total) value — a reader
    racing the swap either fails loudly on a momentarily-missing
    directory or sees identical stats, never silently wrong ones. The
    directory swaps are not atomic as a GROUP, so their ORDER is the
    safety argument: the manifest is swapped FIRST — over-listing a
    batch whose live partition still exists is harmless (its rows are
    present exactly once; a retry no-ops against present rows), while
    the reverse order could leave folded rows live with an
    under-listing manifest, whose retry would then duplicate them. A
    crash between the bands and stats swaps leaves the old per-batch
    stats increments live against the compacted bands — same totals by
    construction (the fold is exact), re-foldable by the next run. A
    rerun self-heals every crash window: leftover staging is discarded
    (live directories were never touched before their own swap step),
    a missing live directory is rolled back from ``.compact_old``
    (failing LOUDLY if the rollback rename fails — never deleting the
    only surviving copy), and a completed-but-uncleaned swap's
    ``.compact_old`` is dropped. Run it OFFLINE (no concurrent
    index_batch/probe): the plain-parquet layout has no snapshot
    protocol — the production analog is Iceberg's rewrite_data_files
    under a snapshot commit (see sources/snapshots.py for the registry
    analog).

    Returns {"compact_id", "n_batches", "n_rows"}; no-ops (returns
    n_batches=0 or 1) when there is nothing to fold.
    """
    if not _SAFE_BATCH_ID.fullmatch(compact_id) or compact_id in (".", ".."):
        raise ValueError(f"compact_id {compact_id!r} is not a safe partition name")
    hpath, fs = _index_fs(spark, index_path)
    staging = hpath(f"{index_path}/.compact_staging")
    oldroot = hpath(f"{index_path}/.compact_old")
    # manifest FIRST — see the docstring's swap-order safety argument
    swap_dirs = ("manifest", "bands", "stats")

    # --- self-heal crashed runs (see docstring) ---
    if fs.exists(staging):
        fs.delete(staging, True)  # crashed before any swap: staging is scratch
    for d in swap_dirs:
        live, old = hpath(f"{index_path}/{d}"), hpath(f"{index_path}/.compact_old/{d}")
        if fs.exists(old) and not fs.exists(live):
            # crashed between the two renames: roll back — and verify it,
            # because .compact_old holds the ONLY copy at this point
            if not fs.rename(old, live):
                raise IOError(
                    f"compaction self-heal: failed to roll back {d} from "
                    ".compact_old; NOT deleting it (sole surviving copy)"
                )
    if fs.exists(oldroot):
        fs.delete(oldroot, True)  # swap completed earlier, cleanup didn't

    bands_dir = hpath(f"{index_path}/bands")
    all_ids = [
        st.getPath().getName().split("=", 1)[1]
        for st in fs.listStatus(bands_dir)
        if st.isDirectory() and st.getPath().getName().startswith("batch_id=")
    ] if fs.exists(bands_dir) else []
    batch_ids = [
        b for b in all_ids
        if fs.exists(hpath(f"{index_path}/bands/batch_id={b}/_SUCCESS"))
    ]
    if all_ids and not batch_ids:
        # NO partition carries the marker — that is a committer
        # configuration (marksuccessfuljobs=false), not N simultaneous
        # crashes; refusing beats silently deleting a committed index
        raise ValueError(
            f"no partition under {index_path}/bands carries a _SUCCESS "
            "marker; compact_index distinguishes crashed from committed "
            "writes by it — re-enable "
            "mapreduce.fileoutputcommitter.marksuccessfuljobs for indexed "
            "writes (or rebuild the index) before compacting"
        )
    dropped = sorted(set(all_ids) - set(batch_ids))
    if dropped:
        print(
            f"compact_index: dropping uncommitted partition(s) {dropped} "
            "(no _SUCCESS — crashed index_batch; retry the batch after "
            "compaction)"
        )
    # orphan-stats cleanup: a stats increment with NO bands partition
    # and NO manifest entry belongs to a batch that never committed
    # (index_batch writes stats BEFORE bands, so its crash window leaves
    # one; so does a partial partition dropped by an interrupted earlier
    # compaction) — left alone it would over-count its band keys FOREVER
    # if the batch is never retried. Manifest-listed ids are NOT orphans:
    # in the crash window between the bands and stats swaps, the folded
    # batches' old increments ARE the live totals for the compacted rows.
    stats_dir = hpath(f"{index_path}/stats")
    if fs.exists(stats_dir):
        accounted = set(all_ids) | compacted_batch_ids(spark, index_path)
        for st in fs.listStatus(stats_dir):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith("batch_id=")):
                continue
            sid = name.split("=", 1)[1]
            if sid not in accounted:
                print(f"compact_index: dropping orphan stats partition {sid!r}")
                fs.delete(st.getPath(), True)
    # a single (or no) committed partition has nothing to fold — UNLESS
    # tombstones are pending, in which case a 1-partition "fold" is how
    # deleted rows get physically dropped and the markers cleared
    tombstones = read_tombstones(spark, index_path)
    if not batch_ids or (len(batch_ids) == 1 and not tombstones):
        return {"compact_id": compact_id, "n_batches": len(batch_ids), "n_rows": 0}

    raw = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", f"{index_path}/bands")
        .parquet(*[f"{index_path}/bands/batch_id={b}" for b in batch_ids])
    )
    # origin of every row: the src_batch tag survives re-compaction,
    # fresh batch partitions carry only the batch_id partition value
    src = (
        F.coalesce(F.col("src_batch"), F.col("batch_id").cast("string"))
        if "src_batch" in raw.columns
        else F.col("batch_id").cast("string")
    )
    keep_cols = [c for c in raw.columns if c not in ("batch_id", "src_batch")]
    n_parts = n_partitions or max(
        1, int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 4
    )
    # tombstoned batches (deleted post-fold) are physically dropped
    # here — the fold excludes their rows, and the tombstones are
    # cleared after the swap completes (a lingering tombstone after a
    # crash is harmless: its src_batch values no longer exist)
    staged = _drop_tombstoned(
        raw.select(*keep_cols, src.alias("src_batch")), tombstones
    ).repartition(n_parts, "band_key").sortWithinPartitions("band_key")
    staged.write.mode("overwrite").parquet(
        f"{index_path}/.compact_staging/bands/batch_id={compact_id}"
    )
    # stats recomputed from the STAGED rows — an exact fold (identical
    # totals to read_band_stats' increment sum by construction), kept
    # per (band_key, src_batch) so exclude_batch_id stays exact
    staged_bands = spark.read.parquet(
        f"{index_path}/.compact_staging/bands/batch_id={compact_id}"
    )
    (
        staged_bands.groupBy("band_key", "src_batch")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .coalesce(max(1, n_parts // 4))
        .write.mode("overwrite")
        .parquet(f"{index_path}/.compact_staging/stats/batch_id={compact_id}")
    )
    n_rows = staged_bands.count()
    folded = sorted(
        (compacted_batch_ids(spark, index_path) | set(batch_ids)) - {compact_id}
    )
    # per-batch content signatures (the _batch_signature combiner,
    # grouped) recorded alongside each folded id: index_batch compares
    # a re-ingested folded batch against its signature and RAISES on
    # mismatch — without this a changed batch would be silently dropped
    idc = [c for c in staged_bands.columns if c not in ("band_key", "src_batch")][0]
    sigs = {
        r["src_batch"]: (int(r["n_rows"]), int(r["sig"]))
        for r in staged_bands.groupBy("src_batch")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.xxhash64(F.col(idc), F.col("band_key")).cast("decimal(28,0)")
            ).alias("sig"),
        )
        .collect()
    }
    from decimal import Decimal

    # folded ids absent from the staged rows (zero-row batches, or
    # tombstoned ids whose rows were just dropped) keep a (0, 0) entry:
    # a later NON-empty re-ingest under that id then mismatches loudly
    entries = []
    for b in folded:
        n, s = sigs.get(b, (0, 0))
        entries.append((b, n, Decimal(s)))
    spark.createDataFrame(
        entries, "batch_id string, n_rows long, sig decimal(28,0)"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{index_path}/.compact_staging/manifest"
    )

    fs.mkdirs(oldroot)
    for d in swap_dirs:
        live = hpath(f"{index_path}/{d}")
        if fs.exists(live) and not fs.rename(live, hpath(f"{index_path}/.compact_old/{d}")):
            raise IOError(f"compaction: failed to move live {d} aside")
        if not fs.rename(hpath(f"{index_path}/.compact_staging/{d}"), live):
            raise IOError(f"compaction: failed to swap staged {d} in")
    fs.delete(oldroot, True)
    fs.delete(staging, True)
    if tombstones:
        # the tombstoned rows are physically gone from the swapped-in
        # bands/stats — clear the markers LAST; a crash leaving them
        # behind is harmless (they filter src_batch values that no
        # longer exist) and the next compaction clears them again
        fs.delete(hpath(f"{index_path}/tombstones"), True)
    return {"compact_id": compact_id, "n_batches": len(batch_ids), "n_rows": n_rows}


def _read_index_dir(spark, index_path: str, sub: str) -> DataFrame:
    """Read one index directory. Plain read normally (index_batch keeps
    both layouts schema-uniform via the src_batch tag); a parquet
    footer-merge only for the legacy-mixed case — pre-tag batch
    partitions alongside a compacted one — which exactly the manifest's
    existence flags."""
    reader = spark.read
    if _manifest_exists(spark, index_path):
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(f"{index_path}/{sub}")


def _exclude_batch(df: DataFrame, batch_id: str) -> DataFrame:
    """Drop one batch's rows whether they still live in their own
    partition or were folded into the compacted base (tagged by
    ``src_batch``) — keeps the replay hook exact across compaction."""
    df = df.filter(F.col("batch_id") != F.lit(batch_id))
    if "src_batch" in df.columns:
        df = df.filter(
            F.col("src_batch").isNull() | (F.col("src_batch") != F.lit(batch_id))
        )
    return df


def read_band_index(
    spark, index_path: str, exclude_batch_id: str | None = None
) -> DataFrame:
    """All indexed (id, band_key) rows across batches.

    ``exclude_batch_id`` drops one batch's rows — the replay-
    idempotency hook: a RETRIED batch that already half-wrote its index
    partition must probe against everyone else, never against its own
    earlier attempt (which would emit every doc as a self-match).
    Exclusion stays exact after :func:`compact_index` via the
    ``src_batch`` origin tag. :func:`index_batch` writes the tag on
    every row, so the schema is uniform and the read needs NO parquet
    footer-merge; only an index holding pre-tag batch partitions next
    to a compacted one is mixed, and the manifest's existence flags
    exactly that case (one filesystem call, not a footer scan).

    Rows of batches deleted post-compaction (:func:`delete_batch`
    tombstones) are filtered out until the next compaction drops them
    physically — a deleted document must stop matching immediately."""
    df = _read_index_dir(spark, index_path, "bands")
    if exclude_batch_id is not None:
        df = _exclude_batch(df, exclude_batch_id)
    df = _drop_tombstoned(df, read_tombstones(spark, index_path))
    return df.drop("batch_id", "src_batch")


def read_band_stats(
    spark, index_path: str, exclude_batch_id: str | None = None
) -> DataFrame:
    """The maintained (band_key, bsz) totals — per-batch increments
    summed at read; stats-table-sized, never an index scan.
    ``exclude_batch_id`` mirrors :func:`read_band_index`'s replay hook
    (a retried batch's stale increment must not inflate the cap);
    compacted stats keep per-``src_batch`` granularity so the hook
    stays exact (schema-merge economics as in :func:`read_band_index`),
    and tombstoned batches' increments are dropped in lockstep with
    their band rows."""
    df = _read_index_dir(spark, index_path, "stats")
    if exclude_batch_id is not None:
        df = _exclude_batch(df, exclude_batch_id)
    df = _drop_tombstoned(df, read_tombstones(spark, index_path))
    return df.groupBy("band_key").agg(F.sum("bsz").alias("bsz"))


def _pairs_from_bands(
    bands: DataFrame, id_col: str, max_bucket_size: int
) -> DataFrame:
    """Self-join already-materialized (id, band_key) rows into distinct
    candidate pairs, dropping buckets above ``max_bucket_size``.
    ``bands`` should already be persisted by the caller (the size pass
    and both join sides read it)."""
    bucket_sizes = bands.groupBy("band_key").agg(F.count(F.lit(1)).alias("bsz"))
    kept = bands.join(
        bucket_sizes.filter(
            (F.col("bsz") > 1) & (F.col("bsz") <= max_bucket_size)
        ),
        "band_key",
    )
    a = kept.select(F.col("band_key"), F.col(id_col).alias("id_a"))
    b = kept.select(F.col("band_key"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


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
    # (id, band_key) is tiny (n_bands rows/doc, no content): cache it so
    # the bucket-size pass and both sides of the self-join reuse one
    # signature computation instead of three
    bands = band_rows(signatures, id_col, n_hashes, band_size).persist()
    return _pairs_from_bands(bands, id_col, max_bucket_size)


def minhash_estimate_pairs(
    signatures: DataFrame, pairs: DataFrame, id_col: str, n_hashes: int = 8
) -> DataFrame:
    """Standard MinHash Jaccard estimator over candidate pairs:
    ``(id_a, id_b, n_agree)`` where n_agree counts agreeing signature
    positions — E[n_agree/n_hashes] = Jaccard. Kept integral so the
    cross-engine comparison is exact; divide by ``n_hashes`` for the
    estimate.

    The cheap middle tier between LSH candidates and the exact
    verifier (:func:`ngram_jaccard_pairs`): two id-equi-joins against
    the fixed-width signature table and a codegen sum of equality
    flags — no shingles re-materialized, no quadratic work.
    """
    keep = [F.col(f"mh{j}") for j in range(n_hashes)]
    sig_a = signatures.select(
        F.col(id_col).alias("id_a"), *[c.alias(f"_a{j}") for j, c in enumerate(keep)]
    )
    sig_b = signatures.select(
        F.col(id_col).alias("id_b"), *[c.alias(f"_b{j}") for j, c in enumerate(keep)]
    )
    joined = pairs.join(sig_a, "id_a").join(sig_b, "id_b")
    agree = sum(
        (F.col(f"_a{j}") == F.col(f"_b{j}")).cast("int") for j in range(n_hashes)
    )
    return joined.select("id_a", "id_b", agree.alias("n_agree"))


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


def probe_band_index(
    new_signatures: DataFrame,
    index: DataFrame,
    id_col: str,
    n_hashes: int = 8,
    band_size: int = 2,
    max_bucket_size: int = 1000,
    index_band_sizes: DataFrame | None = None,
    bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup: candidates for a NEW batch against an
    already-indexed corpus plus among the new docs themselves.

    ``bands`` lets the caller supply the batch's PRE-PERSISTED
    :func:`band_rows` frame and own its cache lifecycle — the streaming
    path computes band rows once, shares the same frame with
    :func:`index_batch`, and unpersists after the epoch's writes
    materialize. When omitted, the frame is computed here and persisted
    for the session (it feeds three consumers in this plan); a
    long-running caller invoking this repeatedly should pass ``bands``
    to avoid accumulating cache entries.

    Output: (new_id, match_id, origin) with origin 'new_old' (match_id
    indexed) or 'new_new' (match_id a newer new doc, id-ordered).

    Scale shape — the daily-ingest path at 10^12 docs: the indexed
    corpus contributes ONLY its (id, band_key) rows (:func:`band_rows`,
    written once, partitioned/bucketed by band_key so the probe join is
    shuffle-free on the index side); nothing is re-tokenized, re-hashed
    or re-paired for old docs, and old×old pairs are never re-emitted.
    Cost per batch is O(new bands ⋈ index) — the corpus-size term only
    enters through matching buckets.

    ``index_band_sizes`` is the per-band count table ((band_key, bsz))
    maintained with the index (:func:`index_batch` updates it per
    indexed batch); passing it skips the full index scan the
    degenerate-bucket cap otherwise needs. Stats keys MISSING for a
    batch band key are treated as UNKNOWN, not zero: those keys'
    counts are recomputed from the index itself (a semi-joined recount
    over just the uncovered keys), so a stats table missing keys can
    never silently exempt a band from the cap and restore the
    unbounded new×index fan-out the cap exists to prevent. Keys
    PRESENT in the stats are trusted as-is — :func:`index_batch`
    guarantees they can only ever OVER-count (its stats write lands
    before its bands write, so a crashed batch over-caps until
    retried, never under-caps); a hand-maintained stats table must
    uphold the same never-undercount contract.

    The degenerate-bucket cap applies to the COMBINED occupancy
    (new-batch count + index count) per band: a boilerplate band with
    10^5 copies in the batch must not fan out against a sub-cap index
    bucket any more than an oversized index bucket may fan out against
    the batch. The combined check equi-joins index stats to the
    per-batch band counts WITHOUT a forced broadcast — the batch count
    frame is batch-cardinality (one row per distinct band key), so the
    hint would fail the job at real daily-ingest sizes; AQE
    runtime-broadcasts it when it measures small. Only ``bad_keys``
    (cap violators) keeps a forced hint — small by construction.
    """
    if bands is None:
        bands = band_rows(new_signatures, id_col, n_hashes, band_size).persist()
    new_bands = bands
    # read twice (covered/uncovered split + combined cap) but NOT
    # persisted: it's a tiny re-aggregation over the cached band rows,
    # and an un-releasable persist here would leak per call
    new_sizes = new_bands.groupBy("band_key").agg(F.count(F.lit(1)).alias("ncnt"))
    if index_band_sizes is None:
        index_band_sizes = index.groupBy("band_key").agg(F.count(F.lit(1)).alias("bsz"))
    else:
        # batch band keys the stats table doesn't cover are UNKNOWN —
        # recount them from the index (semi-join bounds the rescan to
        # the uncovered keys, a small set when stats are near-complete)
        uncovered = new_sizes.join(
            index_band_sizes, "band_key", "left_anti"
        ).select("band_key")
        # join deliberately UNFORCED: ``uncovered`` is batch-cardinality
        # in the worst case (fresh stats table → every batch band key),
        # far past broadcast capacity for a 10^8-doc daily batch. AQE
        # runtime-broadcasts it when it measures small; paired A/B on
        # the analogous verifier semi-joins showed the unforced plan is
        # also ~20% faster (BENCH/BASELINE.md round-4 A/B).
        recounted = (
            index.join(uncovered, "band_key")
            .groupBy("band_key")
            .agg(F.count(F.lit(1)).alias("bsz"))
        )
        index_band_sizes = index_band_sizes.select("band_key", "bsz").unionByName(
            recounted
        )
    # index stats pruned to the batch's band keys (UNFORCED equi-join:
    # ``new_sizes`` has one row per distinct band key in the batch —
    # ~4× the batch's doc count for the daily-ingest shape, so a forced
    # broadcast would fail the job exactly on the hot path; AQE picks
    # broadcast at runtime when the batch really is small), then the
    # combined cap names the bad keys — a small set by construction
    relevant = index_band_sizes.join(new_sizes, "band_key")
    bad_keys = relevant.filter(
        (F.col("ncnt") + F.col("bsz")) > max_bucket_size
    ).select("band_key")
    ok_new = new_bands.join(F.broadcast(bad_keys), "band_key", "left_anti")
    new_old = (
        ok_new.join(index.withColumnRenamed(id_col, "match_id"), "band_key")
        .select(F.col(id_col).alias("new_id"), "match_id")
        .distinct()
        .withColumn("origin", F.lit("new_old"))
    )
    # within-batch pairs reuse the SAME persisted band rows — the
    # minhash kernel runs once per batch, not once per arm
    new_new = (
        _pairs_from_bands(new_bands, id_col, max_bucket_size)
        .select(F.col("id_a").alias("new_id"), F.col("id_b").alias("match_id"))
        .withColumn("origin", F.lit("new_new"))
    )
    return new_old.unionByName(new_new)


def read_index_or_empty(
    spark, index_path: str, batch_id: str, id_col: str, id_type: str
) -> tuple[DataFrame, DataFrame | None]:
    """(index, stats) for a probe, excluding ``batch_id`` (replay
    idempotency), with the two reads failing INDEPENDENTLY: a missing
    index is the genuine first batch (both empty); an index whose stats
    tree is lost must NOT silently probe empty — stats=None makes the
    probe recount occupancy from the index itself (the
    streaming/incremental.py false-clean guard, shared here)."""
    from pyspark.errors import AnalysisException

    try:
        index = read_band_index(spark, index_path, exclude_batch_id=batch_id)
    except AnalysisException:
        return (
            spark.createDataFrame([], f"{id_col} {id_type}, band_key string"),
            spark.createDataFrame([], "band_key string, bsz long"),
        )
    try:
        stats = read_band_stats(spark, index_path, exclude_batch_id=batch_id)
    except AnalysisException:
        stats = None
    return index, stats


def ingest_probe_index(
    docs: DataFrame,
    index_path: str,
    batch_id: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    band_size: int = 2,
    max_bucket_size: int = 1000,
    matches_out: str | None = None,
    assume_new: bool = False,
) -> dict:
    """One daily-ingest near-dup step, batch-CLI face: probe a batch
    against the maintained band index, then index it — the composition
    run_check.py chains after registry-planned incremental validation
    (the day's dirty buckets ARE the day's batch).

    Because an incremental batch is a set of revalidated BUCKETS, it
    carries unchanged documents alongside new ones; indexing those
    again would double their band rows and every probe would echo them
    as their own matches. The batch is therefore anti-joined against
    the index's ids first — only NOT-YET-INDEXED documents are signed,
    probed and indexed (ids here are content-addressed: a changed
    document has a new id, so id-absence ⇔ genuinely new content).
    The anti-join is a narrow id-equi-join (the index side projects to
    its id column; no content moves) — callers whose input is already
    a pure delta skip it with ``assume_new=True``.

    Banding parameters defer to the index's recorded meta when present
    (mismatched banding never matches any key). Matches are written to
    ``matches_out`` (overwrite — a retried batch replaces its own
    output) BEFORE the index write, mirroring the streaming epoch
    order; the probe excludes this batch's own partition, so a
    crashed-and-retried batch never self-matches. Returns
    {"n_new", "n_matches", "indexed"}.
    """
    spark = docs.sparkSession
    meta = read_index_meta(spark, index_path)
    if meta is not None:
        n_hashes, band_size = meta
    id_type = docs.schema[id_col].dataType.simpleString()
    index, stats = read_index_or_empty(spark, index_path, batch_id, id_col, id_type)
    new_docs = (
        docs
        if assume_new
        else docs.join(index.select(id_col).distinct(), id_col, "left_anti")
    )
    sigs = minhash_signatures(new_docs, id_col, text_col, n_hashes)
    bands = band_rows(sigs, id_col, n_hashes, band_size).persist()
    try:
        matches = probe_band_index(
            sigs,
            index,
            id_col,
            n_hashes=n_hashes,
            band_size=band_size,
            max_bucket_size=max_bucket_size,
            index_band_sizes=stats,
            bands=bands,
        )
        if matches_out is not None:
            matches.write.mode("overwrite").parquet(matches_out)
            n_matches = spark.read.parquet(matches_out).count()
        else:
            n_matches = matches.count()
        n_new = bands.select(id_col).distinct().count()
        wrote = index_batch(
            bands, index_path, batch_id, n_hashes=n_hashes, band_size=band_size
        )
    finally:
        bands.unpersist()
    return {"n_new": n_new, "n_matches": n_matches, "indexed": wrote}


_HEX_HIGH = set("89abcdef")


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash int) — 16-bit portable SimHash (map-only kernel).

    Identical to the Catalyst spec ``functions.text.simhash16`` (bit k
    from md5 nibble k's high bit, per-doc majority vote) but each token
    is hashed ONCE for all 16 bits instead of once per bit.
    """
    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vals = list(pdf["_id"]), []
            for text in pdf["_text"]:
                votes = [0] * 16
                for t in _py_tokens(text) or []:
                    digest = _md5(t)
                    for k in range(16):
                        votes[k] += 1 if digest[k] in _HEX_HIGH else -1
                vals.append(sum(1 << k for k in range(16) if votes[k] > 0))
            yield pd.DataFrame({id_col: ids, "simhash": vals})

    return df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).mapInPandas(kernel, schema=f"{id_col} {id_type}, simhash int")


#: nibble value -> ±1 votes for its 4 bits (bit 0 first)
_NIB_VOTES = np.array(
    [[1 if (n >> b) & 1 else -1 for b in range(4)] for n in range(16)], dtype=np.int32
)


def simhash60_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash bigint) — 60-bit SimHash from ALL four bits of md5
    nibbles 1-15, per-doc majority vote per bit (map-only kernel).

    The SCALE sketch: at 60 bits the pigeonhole bands stay selective
    (max_hamming=3 -> four 15-bit bands -> ~2^15-fold bucket shrink)
    where the 16-bit portable sketch's bands degenerate to a few bits.
    60 (not 64) keeps the value positive in a signed BIGINT on every
    engine. Per-token digests are memoized per batch (token vocabulary
    ≪ token count), votes accumulate vectorized.
    """
    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, np.ndarray] = {}
        for pdf in batches:
            ids, vals = list(pdf["_id"]), []
            for text in pdf["_text"]:
                votes = np.zeros(60, dtype=np.int64)
                for t in _py_tokens(text) or []:
                    bits = memo.get(t)
                    if bits is None:
                        digest = _md5(t)
                        nibs = np.fromiter(
                            (int(c, 16) for c in digest[:15]), dtype=np.int64, count=15
                        )
                        bits = _NIB_VOTES[nibs].reshape(60)
                        memo[t] = bits
                    votes += bits
                vals.append(int(sum(1 << k for k in range(60) if votes[k] > 0)))
            yield pd.DataFrame({id_col: ids, "simhash": vals})

    return df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).mapInPandas(kernel, schema=f"{id_col} {id_type}, simhash long")


def simhash60_near_dups(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Hamming-ball near-dup pairs on the 60-bit SimHash — pigeonhole
    banding with guaranteed recall AND scale-grade selectivity
    (15-bit bands at the default h=3)."""
    fp = simhash60_fingerprints(df, id_col, text_col)
    return simhash_pairs_from_fingerprints(fp, id_col, max_hamming, n_bits=60)


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 2) -> DataFrame:
    """Pairs within Hamming distance ≤ max_hamming on the SimHash
    fingerprint — GUARANTEED recall via pigeonhole banding.

    The 16 bits are split into (max_hamming + 1) disjoint bands; a pair
    differing in at most max_hamming bits must agree EXACTLY on at least
    one band, so per-band equi-joins plus an exact popcount verify find
    every qualifying pair (including high-bit flips). Output is thus the
    true Hamming-ball pair set, band-pruned but lossless.

    Scale note: recall costs selectivity — band width is
    16 // (h + 1) bits, so at h near 8 the buckets approach N/4 and the
    join densifies. That is inherent to a 16-bit sketch; production
    uses a 64-bit SimHash (band width 64/(h+1)) with this exact shape.
    """
    fp = simhash_fingerprints(df, id_col, text_col)
    return simhash_pairs_from_fingerprints(fp, id_col, max_hamming)


def simhash_pairs_from_fingerprints(
    fp: DataFrame, id_col: str, max_hamming: int, n_bits: int = 16
) -> DataFrame:
    """Pigeonhole band join over a (id, simhash) fingerprint table —
    see :func:`simhash_near_dups` for the recall guarantee.

    A pair sharing several bands would surface once per shared band;
    instead of a pair-level dedup SHUFFLE, each pair is emitted only
    from its FIRST matching band — a pure codegen filter (the earlier
    bands' inequality is recomputed from the two fingerprints riding on
    the join output). One shuffle total (the band join itself).
    """
    n_bands = max_hamming + 1
    bounds = [round(n_bits * b / n_bands) for b in range(n_bands + 1)]

    def band_val(col, b: int):
        lo, width = bounds[b], bounds[b + 1] - bounds[b]
        return F.shiftright(col, lo).bitwiseAND(F.lit((1 << width) - 1))

    bands = fp.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"), band_val(F.col("simhash"), b).alias("v")
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.b").alias("b"), F.col("bk.v").alias("v"))
    # (id, simhash, band) is tiny; cache it so both sides of the
    # self-join reuse one fingerprint-kernel pass instead of two
    bands = bands.persist()
    a = bands.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "b", "v")
    b2 = bands.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "b", "v")
    pairs = a.join(b2, ["b", "v"]).filter(F.col("id_a") < F.col("id_b"))
    first_match = F.lit(True)
    for j in range(n_bands - 1):
        earlier_same = band_val(F.col("sh_a"), j) == band_val(F.col("sh_b"), j)
        first_match = first_match & F.when(F.col("b") > j, ~earlier_same).otherwise(
            F.lit(True)
        )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    return (
        pairs.filter(first_match)
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def distinct_shingle_rows(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3
) -> DataFrame:
    """(doc_id, sh) — one row per distinct shingle per doc (map-only
    kernel; same strings as explode(array_distinct(shingles(...))),
    first-occurrence order)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, shs = [], []
            for doc_id, text in zip(pdf["_id"], pdf["_text"]):
                for s in dict.fromkeys(_py_shingles(_py_tokens(text), shingle_n)):
                    ids.append(doc_id)
                    shs.append(s)
            yield pd.DataFrame({"doc_id": ids, "sh": shs})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).mapInPandas(kernel, schema=f"doc_id {id_type}, sh string")


def fingerprints(
    df: DataFrame, id_col: str, text_col: str, n: int = 5, keep: int = 3
) -> DataFrame:
    """(id, fp) — winnowing-style doc fingerprint (map-only kernel).

    Same strings as ``functions.text.doc_fingerprint``: the `keep`
    smallest md5 digests of word n-gram shingles, concatenated.
    """
    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = list(pdf["_id"]), []
            for text in pdf["_text"]:
                hashes = sorted(_md5(s) for s in _py_shingles(_py_tokens(text), n))
                fps.append("".join(hashes[:keep]))
            yield pd.DataFrame({id_col: ids, "fp": fps})

    return df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).mapInPandas(kernel, schema=f"{id_col} {id_type}, fp string")


def dedup_clusters(pairs: DataFrame, max_iterations: int = 50) -> DataFrame:
    """Connected components over near-dup candidate pairs:
    (doc_id, cluster) where cluster is the MINIMUM doc id reachable
    through the pair graph — the canonical representative each
    duplicate group keeps in a training-data dedup pipeline.

    Hash-min label propagation with POINTER JUMPING: each round every
    node takes the smallest label among itself and its neighbors (one
    shuffle over (node, label) pairs, map-side combined), then jumps
    through its own label's label (a labels-to-labels self-join) — the
    classic doubling step, so convergence is O(log diameter) rounds,
    not O(diameter). Each round is localCheckpoint'd: iterative
    DataFrame algorithms otherwise stack lineage linearly and blow the
    planner (on a cluster, use checkpoint() with a checkpoint dir —
    same call shape). Node count, not edge count, bounds per-round
    state, so this runs at 10^9-document scale. The driver loop only
    reads a per-round convergence count.

    Input: (id_a, id_b) pairs (any extra columns ignored). Output one
    row per distinct doc id appearing in any pair.
    """
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionByName(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .distinct()
        .persist()
    )
    # label(u) starts as min(u, min neighbor) — the first propagation round
    labels = edges.groupBy("u").agg(F.min("v").alias("lab"))
    labels = labels.select("u", F.least("u", "lab").alias("lab")).localCheckpoint()
    for _ in range(max_iterations):
        # u's next label: min over neighbors' current labels and its own
        neigh = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("lab").alias("nlab"))
        )
        nxt = labels.join(neigh, "u", "left").select(
            "u", F.least("lab", F.coalesce("nlab", "lab")).alias("lab")
        )
        # pointer jump: follow lab -> lab(lab) (labels self-join)
        jump = nxt.join(
            nxt.select(F.col("u").alias("lab"), F.col("lab").alias("lab2")),
            "lab",
            "left",
        ).select("u", F.least("lab", F.coalesce("lab2", "lab")).alias("lab"))
        jump = jump.localCheckpoint()
        changed = (
            jump.join(labels.withColumnRenamed("lab", "old"), "u")
            .filter(F.col("lab") != F.col("old"))
            .count()
        )
        labels = jump
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("u").alias("doc_id"), F.col("lab").alias("cluster"))


def _shingle_overlap_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int,
    candidates: DataFrame | None,
    shingle_rows: DataFrame | None = None,
) -> DataFrame:
    """Shared verifier core: (id_a, id_b, n_inter, n_a, n_b) over
    distinct shingle sets.

    With ``candidates`` (e.g. LSH output) verification touches ONLY the
    candidate docs' shingles: their doc-ids are semi-joined against the
    shingle rows BEFORE the self-join, so the quadratic within-shingle
    pair explosion is paid on the pruned set, not the full corpus — the
    production path. (A semi-join only on the aggregated pairs would
    land above the shingle join and prune nothing.) Keeping every
    shingle of each candidate doc means per-doc sizes and intersections
    stay exact for the surviving pairs.

    The candidate semi-joins carry NO forced broadcast hint: the
    candidate set is corpus-dependent LSH output, and in a heavy
    near-dup regime it can outgrow broadcast capacity — a forced hint
    would then FAIL the job, where a plain semi-join degrades to a
    shuffle join and AQE still runtime-broadcasts whenever the built
    side is actually small (the common case).

    ``shingle_rows`` reuses an already-materialized (and ideally
    persisted) :func:`distinct_shingle_rows` frame — a caller scoring
    the same corpus twice (e.g. a full arm and a candidates-pruned arm)
    pays the tokenize → shingle kernel once instead of per call.
    """
    sh = (
        shingle_rows
        if shingle_rows is not None
        else distinct_shingle_rows(df, id_col, text_col, shingle_n)
    )
    if candidates is not None:
        cand_ids = (
            candidates.select(F.explode(F.array("id_a", "id_b")).alias("doc_id")).distinct()
        )
        sh = sh.join(cand_ids, "doc_id", "left_semi")
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
        inter = inter.join(candidates, ["id_a", "id_b"], "left_semi")
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return inter.join(sa, "id_a").join(sb, "id_b")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
    shingle_rows: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity: (id_a, id_b, jaccard ≥ threshold).
    Plan shape, candidate pruning and shingle reuse:
    :func:`_shingle_overlap_counts`.
    """
    counts = _shingle_overlap_counts(
        df, id_col, text_col, shingle_n, candidates, shingle_rows
    )
    return counts.select(
        "id_a",
        "id_b",
        F.round(
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
    shingle_rows: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric n-gram containment: |A∩B| / min(|A|,|B|) ≥ threshold.

    The snippet-inclusion detector Jaccard is blind to: a 50-shingle
    doc fully embedded in a 5000-shingle doc has containment 1.0 but
    Jaccard ≈ 0.01 — exactly the quote/boilerplate/forked-file case a
    training-data dedup pass must catch. Same plan as
    :func:`ngram_jaccard_pairs` (see :func:`_shingle_overlap_counts`),
    only the score differs. Output: (id_a, id_b, containment).
    """
    counts = _shingle_overlap_counts(
        df, id_col, text_col, shingle_n, candidates, shingle_rows
    )
    return counts.select(
        "id_a",
        "id_b",
        F.round(
            F.col("n_inter") / F.least(F.col("n_a"), F.col("n_b")), 6
        ).alias("containment"),
    ).filter(F.col("containment") >= threshold)
