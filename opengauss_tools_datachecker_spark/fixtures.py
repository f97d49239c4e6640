"""Deterministic synthetic fixtures (SURVEY.md §5, FIXTURES.md).

The reference ships no tests; its implicit oracle — "inject a
difference, expect exactly those rows in check.log and that table in
summary.log" (/root/reference src/main/java/com/gauss/common/audit/
RecordDiffer.java:48-60, src/main/java/com/gauss/common/utils/
GaussUtils.java:174-180) — becomes explicit here: a seeded generator
for the BASELINE.json input table
``(repo, path, commit, lang, content)`` plus pure-DataFrame corruption
injectors that return the *expected violation set* alongside the
corrupted input.

Everything is a deterministic function of ``(seed, n_rows)`` built from
Catalyst expressions only (md5/xxhash64-derived uniforms, Box-Muller
log-normal lengths, higher-order-function word synthesis) — generation
itself is distributed and scales with the cluster; no driver-side loops,
no per-row Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "java", "c", "go", "js", "rs", "md", "txt"]
_WORDS = (
    "def class return import for while if else try except self value "
    "table row column scan filter join group order index hash merge "
    "stream batch commit branch buffer cache page block node edge "
    "query plan task stage shuffle spill key part file repo".split()
)
N_BUCKETS_DEFAULT = 32


def _u(seed: int, tag: str, *cols: Column) -> Column:
    """Uniform(0,1) deterministic in (seed, tag, cols) — md5-derived."""
    h = F.md5(F.concat_ws("_", F.lit(seed), F.lit(tag), *cols))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(4294967296.0)


def bucket_of(repo: Column | str, n_buckets: int = N_BUCKETS_DEFAULT) -> Column:
    """Stable partition id: hash-bucket of repo.

    Stable across runs AND cluster sizes (unlike spark_partition_id),
    which is what makes per-partition verdicts and checkpoint/resume
    well-defined — SURVEY.md §7 'Resume idempotence'.
    """
    c = F.col(repo) if isinstance(repo, str) else repo
    return F.pmod(F.xxhash64(c), F.lit(n_buckets)).cast("int")


def repo_files(
    spark: SparkSession,
    n_rows: int,
    n_repos: int = 100,
    n_commits_per_repo: int = 8,
    seed: int = 42,
    n_buckets: int = N_BUCKETS_DEFAULT,
    median_words: int = 120,
    sigma: float = 0.6,
) -> DataFrame:
    """The clean input table, BASELINE.json input_hint shape.

    Columns: ``file_id, repo, path, commit, lang, content, bucket``.
    ``(repo, path, commit)`` is unique (path embeds file_id). Repo sizes
    are Zipf-ish (repo_idx = floor(n_repos ** uniform) → log-skewed, a
    few hot repos) — the skew fixture for the salted uniqueness check.
    """
    parallelism = max(spark.sparkContext.defaultParallelism, 8)
    df = spark.range(0, n_rows, numPartitions=parallelism).withColumnRenamed("id", "file_id")
    fid = F.col("file_id")

    repo_idx = F.floor(F.pow(F.lit(float(n_repos)), _u(seed, "repo", fid))).cast("int") - 1
    repo_idx = F.greatest(F.lit(0), F.least(F.lit(n_repos - 1), repo_idx))
    df = df.withColumn("repo_idx", repo_idx)
    df = df.withColumn(
        "repo", F.concat(F.lit("org"), F.pmod(F.col("repo_idx"), F.lit(10)), F.lit("/repo"), F.col("repo_idx"))
    )

    commit_idx = (_u(seed, "commit", fid) * n_commits_per_repo).cast("int")
    df = df.withColumn(
        "commit",
        F.substring(F.sha2(F.concat_ws("@", F.col("repo"), commit_idx, F.lit(seed)), 256), 1, 40),
    )

    # repo-correlated language: each repo draws from 3 of the 8 langs
    lang_arr = F.array(*[F.lit(x) for x in LANGS])
    lang_idx = F.pmod(F.col("repo_idx") * 3 + (_u(seed, "lang", fid) * 3).cast("int"), F.lit(len(LANGS)))
    df = df.withColumn("lang", F.element_at(lang_arr, lang_idx.cast("int") + 1))
    df = df.withColumn(
        "path",
        F.format_string("src/%s/d%02d/f_%d.%s", F.col("lang"), F.pmod(fid, F.lit(97)), fid, F.col("lang")),
    )

    # log-normal word count via Box-Muller (content-length drift target)
    mu = math.log(median_words)
    u1 = _u(seed, "len1", fid)
    u2 = _u(seed, "len2", fid)
    z = F.sqrt(-2.0 * F.log(u1 + F.lit(1e-12))) * F.cos(F.lit(2 * math.pi) * u2)
    n_words = F.exp(F.lit(mu) + F.lit(sigma) * z).cast("int")
    n_words = F.greatest(F.lit(5), F.least(F.lit(2000), n_words))

    # seeded pseudo-source text: higher-order transform, JVM-side
    words_arr = F.array(*[F.lit(w) for w in _WORDS])
    df = df.withColumn(
        "content",
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), n_words),
                lambda i: F.element_at(
                    words_arr,
                    F.pmod(F.xxhash64(F.concat_ws("_", fid, i, F.lit(seed))), F.lit(len(_WORDS))).cast("int") + 1,
                ),
            ),
            " ",
        ),
    )
    df = df.withColumn("bucket", bucket_of("repo", n_buckets))
    return df.drop("repo_idx")


KEY_COLS = ["repo", "path", "commit"]


def manifest(files: DataFrame) -> DataFrame:
    """Reference manifest: clean keys + expected sha256(content)."""
    return files.select(*KEY_COLS, F.sha2(F.col("content"), 256).alias("expected_sha256"))


def repo_commits(files: DataFrame) -> DataFrame:
    """Parent table for the referential rule: valid (repo, commit) pairs."""
    return files.select("repo", "commit").distinct()


# ---------------------------------------------------------------------------
# Seeded corruption injectors — each returns (corrupted_df, expected_keys_df)
# where expected_keys_df carries the exact keys the named rule must flag.
# ---------------------------------------------------------------------------


def _select(frac: float, seed: int, tag: str) -> Column:
    return _u(seed, tag, F.col("file_id")) < frac


def flip_bytes(files: DataFrame, frac: float, seed: int = 7) -> tuple[DataFrame, DataFrame]:
    """Mutate content of ~frac rows → caught by the sha256 rule (N5)."""
    sel = _select(frac, seed, "flip")
    corrupted = files.withColumn(
        "content", F.when(sel, F.concat(F.lit("☠"), F.col("content"))).otherwise(F.col("content"))
    )
    return corrupted, files.filter(sel).select(*KEY_COLS)


def drop_rows(files: DataFrame, frac: float, seed: int = 7) -> tuple[DataFrame, DataFrame]:
    """Delete ~frac rows → N5 flags manifest keys with observed=NULL."""
    sel = _select(frac, seed, "drop")
    return files.filter(~sel), files.filter(sel).select(*KEY_COLS)


def extra_rows(files: DataFrame, frac: float, seed: int = 7) -> tuple[DataFrame, DataFrame]:
    """Rows present in files but absent from the manifest (expected=NULL)."""
    sel = _select(frac, seed, "extra")
    extras = files.filter(sel).withColumn("path", F.concat(F.col("path"), F.lit(".extra")))
    return files.unionByName(extras), extras.select(*KEY_COLS)


def dup_keys(files: DataFrame, frac: float, seed: int = 7) -> tuple[DataFrame, DataFrame]:
    """Duplicate ~frac rows (identical key AND content) → uniqueness (N2).

    This is exactly the case the reference's FULL JOIN is blind to
    (SURVEY.md §1.4 multiset blindness): equal checksums on both sides
    join cleanly, so datachecker reports PASS; our groupBy-count does not.
    """
    sel = _select(frac, seed, "dup")
    dupes = files.filter(sel)
    return files.unionByName(dupes), dupes.select(*KEY_COLS)


def orphan_commits(files: DataFrame, frac: float, seed: int = 7) -> tuple[DataFrame, DataFrame]:
    """Rewrite commit of ~frac rows to nonexistent digests → referential (N3)."""
    sel = _select(frac, seed, "orphan")
    bad_commit = F.substring(F.sha2(F.concat(F.lit("orphan"), F.col("file_id")), 256), 1, 40)
    corrupted = files.withColumn("commit", F.when(sel, bad_commit).otherwise(F.col("commit")))
    return corrupted, corrupted.filter(sel).select("repo", "commit").distinct()


def inflate_rows(
    files: DataFrame, frac: float, factor: int = 40, seed: int = 7
) -> tuple[DataFrame, DataFrame]:
    """Blow up content length of ~frac rows → numeric-outlier rule (N7).

    Too few rows to move the bucket's KS histogram (drift stays PASS),
    but each inflated row sits far outside the robust median±k·MAD band.
    """
    sel = _select(frac, seed, "inflate")
    inflated = F.concat_ws(" ", *[F.col("content")] * factor)
    corrupted = files.withColumn(
        "content", F.when(sel, inflated).otherwise(F.col("content"))
    )
    return corrupted, files.filter(sel).select(*KEY_COLS)


def skew_lang(files: DataFrame, bucket: int) -> DataFrame:
    """In one bucket, collapse the lang distribution → drift rule (N4, chi²)."""
    return files.withColumn(
        "lang", F.when(F.col("bucket") == bucket, F.lit("python")).otherwise(F.col("lang"))
    )


def stretch_len(files: DataFrame, bucket: int, factor: int = 3) -> DataFrame:
    """Multiply content length in one bucket → drift rule (N4, KS on length)."""
    stretched = F.concat_ws(" ", *[F.col("content")] * factor)
    return files.withColumn(
        "content", F.when(F.col("bucket") == bucket, stretched).otherwise(F.col("content"))
    )


def null_storm(files: DataFrame, column: str, frac: float, seed: int = 7) -> tuple[DataFrame, DataFrame]:
    """NULL out ~frac of a column → column-stats rule (N1 null-rate bound)."""
    sel = _select(frac, seed, f"null_{column}")
    corrupted = files.withColumn(
        column, F.when(sel, F.lit(None).cast("string")).otherwise(F.col(column))
    )
    return corrupted, corrupted.filter(sel).select(*KEY_COLS)


def leak_secrets(files: DataFrame, frac: float, seed: int = 7) -> tuple[DataFrame, DataFrame]:
    """Append a fake AWS access key to *frac* of rows' content.

    Returns (corrupted files, the injected rows) — the expectation set
    for SecretsRule, same contract as the other injectors. The key is
    derived deterministically from the row key (16 base-36-ish chars
    from its hash rendered into the AKIA alphabet via upper(hex));
    hex only covers [0-9A-F] which is inside [0-9A-Z], so the token
    always matches the aws_key pattern.
    """
    sel = _select(frac, seed, "leak_secrets")
    token = F.concat(
        F.lit("AKIA"),
        F.upper(F.substring(F.sha2(F.concat_ws("/", "repo", "path", "commit"), 256), 1, 16)),
    )
    corrupted = files.withColumn(
        "content",
        F.when(sel, F.concat(F.col("content"), F.lit("\naws_secret = "), token)).otherwise(
            F.col("content")
        ),
    )
    return corrupted, files.filter(sel)
