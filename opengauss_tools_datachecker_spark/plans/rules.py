"""The BASELINE rule suite (N1-N5) as Rule implementations.

Each rule is one lazy DataFrame program returning violations in the
standard schema (plans/rule.py). Rule N5 alone reproduces the
reference's ENTIRE pipeline semantics (Preparer+Extractor+Applier+
Comparer, SURVEY.md §3.2-3.3) in one join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opengauss_tools_datachecker_spark.fixtures import KEY_COLS, bucket_of
from opengauss_tools_datachecker_spark.operators.drift import (
    cube_marginal,
    drift_verdicts,
    histogram_cube,
)
from opengauss_tools_datachecker_spark.operators.referential import orphan_keys
from opengauss_tools_datachecker_spark.operators.stats import column_stats
from opengauss_tools_datachecker_spark.operators.uniqueness import duplicate_keys
from opengauss_tools_datachecker_spark.plans.rule import CheckContext, key_expr


def _observed_digests(ctx: CheckContext) -> DataFrame:
    """(keys, bucket[, key_hash], observed) — reuses prepared columns."""
    files = ctx.files_with_bucket()
    extra = ["key_hash"] if "key_hash" in files.columns else []
    if "content_sha256" in files.columns:
        return files.select(
            *KEY_COLS, "bucket", *extra, F.col("content_sha256").alias("observed")
        )
    return files.select(
        *KEY_COLS, "bucket", *extra, F.sha2(F.col("content"), 256).alias("observed")
    )


class ContentSha256Rule:
    """N5: per-row sha256(content) vs the reference manifest.

    The Spark form of the reference's md5 full-join comparison
    (/root/reference src/main/java/com/gauss/common/db/sql/
    OpenGaussUtil.java:118-122 executed at src/main/java/com/gauss/
    comparer/GaussRecordComparer.java:63-119), with three upgrades:
    keys ride along (no reverse lookup), mismatched-content rows are
    caught directly (not just missing digests), and the join keys on
    (repo,path,commit) so digest collisions can't mask row identity.

    Merkle-bucket fast path (the north_star's "Merkle-bucket checksum
    comparison"): before the row-level join, each side aggregates one
    order-independent signature per bucket — bit_xor(xxhash64(key ‖
    digest)) plus a row count. Buckets whose (signature, count) agree
    are PROVABLY equal as sets and are skipped; only dirty buckets
    enter the full-outer join. On mostly-clean 10^12-row tables this
    removes almost the entire shuffle (the signature pass is a pure
    map-side-combined agg producing #buckets rows). Disable with
    params={'merkle': False}.

    Scale: the dirty-bucket join shuffles on the composite key; with
    both sides stored bucketed-by-repo (Iceberg bucket transform) it
    becomes a storage-partitioned join with NO shuffle.
    """

    rule_id = "sha256"
    version = "2"

    def check(self, ctx: CheckContext) -> DataFrame:
        observed = _observed_digests(ctx)
        manifest_bucket = (
            F.col("bucket")
            if "bucket" in ctx.manifest.columns
            else bucket_of("repo", ctx.n_buckets)
        )
        expected = ctx.manifest.select(
            *KEY_COLS,
            manifest_bucket.alias("bucket"),
            *(["key_hash"] if "key_hash" in ctx.manifest.columns else []),
            F.col("expected_sha256").alias("expected"),
        )

        if ctx.params.get("merkle", True):
            # Two-level Merkle: signatures at (bucket, sub-bucket)
            # granularity, sub = pmod(key_hash, n_sub). With 32 buckets ×
            # 1024 subs, a corruption touching f of the rows dirties at
            # most f·n_rows sub-buckets — the row-level full-outer join
            # then processes only ~that fraction of the table instead of
            # every row in any dirty bucket. The signature pass itself is
            # a map-side-combined agg emitting ≤ buckets×n_sub rows.
            n_sub = int(ctx.params.get("merkle_subbuckets", 1024))

            def with_sub(df: DataFrame) -> DataFrame:
                kh = (
                    F.col("key_hash")
                    if "key_hash" in df.columns
                    else F.xxhash64(*KEY_COLS)
                )
                return df.withColumn("_sub", F.pmod(kh, F.lit(n_sub)).cast("int"))

            obs_s, exp_s = with_sub(observed), with_sub(expected)

            def sig(df: DataFrame, digest: str, suffix: str) -> DataFrame:
                return df.groupBy("bucket", "_sub").agg(
                    F.bit_xor(F.xxhash64(*KEY_COLS, digest)).alias(f"sig_{suffix}"),
                    F.count(F.lit(1)).alias(f"n_{suffix}"),
                )

            merged = sig(obs_s, "observed", "a").join(
                sig(exp_s, "expected", "b"), ["bucket", "_sub"], "full_outer"
            )
            dirty = merged.filter(
                ~F.col("sig_a").eqNullSafe(F.col("sig_b"))
                | ~F.col("n_a").eqNullSafe(F.col("n_b"))
            ).select("bucket", "_sub").collect()
            if not dirty:
                from opengauss_tools_datachecker_spark.plans.rule import empty_violations

                return empty_violations(ctx.spark)
            # Dirty set is bounded by buckets×n_sub (tiny): ship it back as
            # a literal broadcast semi-join — no recompute, no giant IN list.
            dirty_df = ctx.spark.createDataFrame(
                [(r["bucket"], r["_sub"]) for r in dirty], "bucket int, _sub int"
            )
            observed = obs_s.join(
                F.broadcast(dirty_df), ["bucket", "_sub"], "left_semi"
            ).drop("_sub")
            expected = exp_s.join(
                F.broadcast(dirty_df), ["bucket", "_sub"], "left_semi"
            ).drop("_sub")

        joined = observed.join(
            expected.withColumnRenamed("bucket", "bucket_exp"), KEY_COLS, "full_outer"
        )
        return joined.filter(~F.col("observed").eqNullSafe(F.col("expected"))).select(
            F.lit(self.rule_id).alias("rule_id"),
            F.coalesce(F.col("bucket"), F.col("bucket_exp")).alias("bucket"),
            key_expr(*KEY_COLS).alias("key"),
            "observed",
            "expected",
        )


class SchemaRule:
    """N0: the input table's schema must match the expected contract.

    The reference introspects schemas from JDBC metadata and trusts
    them (/root/reference src/main/java/com/gauss/common/db/meta/
    TableMetaGenerator.java:148-181 — a column added or retyped between
    source and target silently changes what gets checksummed). Here the
    contract is explicit: missing columns, unexpected columns, and type
    mismatches are violations. Table-granular (``granularity =
    'table'``): schema is catalog metadata, one verdict row at bucket 0,
    no data scanned at all.
    """

    rule_id = "schema"
    version = "1"
    granularity = "table"

    @staticmethod
    def applicable(ctx: CheckContext) -> bool:
        return ctx.expected_schema is not None

    def check(self, ctx: CheckContext) -> DataFrame:
        from pyspark.sql import types as T

        expected = ctx.expected_schema
        if expected is None:  # no contract -> nothing to check
            from opengauss_tools_datachecker_spark.plans.rule import empty_violations

            return empty_violations(ctx.spark)
        if isinstance(expected, str):
            expected = T._parse_datatype_string(expected)
        actual = ctx.raw_schema if ctx.raw_schema is not None else ctx.files.schema
        exp = {f.name: f.dataType.simpleString() for f in expected.fields}
        act = {f.name: f.dataType.simpleString() for f in actual.fields}
        rows = []
        for name, typ in exp.items():
            if name not in act:
                rows.append((self.rule_id, 0, name, None, typ))
            elif act[name] != typ:
                rows.append((self.rule_id, 0, name, act[name], typ))
        for name, typ in act.items():
            if name not in exp:
                rows.append((self.rule_id, 0, name, typ, None))
        from opengauss_tools_datachecker_spark.plans.rule import VIOLATION_COLS

        return ctx.spark.createDataFrame(
            rows, "rule_id string, bucket int, key string, observed string, expected string"
        ).select(*VIOLATION_COLS)


class UniquenessRule:
    """N2: (repo,path,commit) must be unique — salted two-phase count."""

    rule_id = "uniqueness"
    version = "1"

    def check(self, ctx: CheckContext) -> DataFrame:
        files = ctx.files_with_bucket()
        dupes = duplicate_keys(
            files,
            KEY_COLS,
            salt_buckets=int(ctx.params.get("salt_buckets", 64)),
            key_hash=F.col("key_hash") if "key_hash" in files.columns else None,
        )
        return dupes.select(
            F.lit(self.rule_id).alias("rule_id"),
            bucket_of("repo", ctx.n_buckets).alias("bucket"),
            key_expr(*KEY_COLS).alias("key"),
            F.col("n_rows").cast("string").alias("observed"),
            F.lit("1").alias("expected"),
        )


class ReferentialRule:
    """N3: every (repo,commit) in files must exist in the commits table."""

    rule_id = "referential"
    version = "1"

    def check(self, ctx: CheckContext) -> DataFrame:
        files = ctx.files_with_bucket()
        orphans = orphan_keys(
            files,
            ctx.commits,
            on=["repo", "commit"],
            parent_rows=ctx.params.get("parent_rows"),
            broadcast_threshold_rows=int(ctx.params.get("broadcast_threshold_rows", 5_000_000)),
        )
        return orphans.select(
            F.lit(self.rule_id).alias("rule_id"),
            bucket_of("repo", ctx.n_buckets).alias("bucket"),
            key_expr("repo", "commit").alias("key"),
            F.concat_ws("|", "repo", "commit").alias("observed"),
            F.lit(None).cast("string").alias("expected"),
        )


class ColumnStatsRule:
    """N1: per-bucket null rate / min / max / HLL distinct; violations
    when a column's null_rate exceeds the configured bound."""

    rule_id = "column_stats"
    version = "1"

    @staticmethod
    def _stat_cols(files: DataFrame) -> list[str]:
        # prepared inputs expose content as (content_len, content_sha256);
        # stats over the digest carry content's null rate, stats over the
        # length carry its magnitude profile — min/max over raw 100 TB
        # text would be the wrong plan at scale.
        wanted = ("repo", "path", "commit", "lang", "content",
                  "content_len", "content_sha256")
        return [c for c in wanted if c in files.columns]

    def check(self, ctx: CheckContext) -> DataFrame:
        files = ctx.files_with_bucket()
        cols = self._stat_cols(files)
        stats = column_stats(files.select("bucket", *cols), group_col="bucket", cols=cols)
        max_null_rate = float(ctx.params.get("max_null_rate", 0.0))
        return stats.filter(F.col("null_rate") > max_null_rate).select(
            F.lit(self.rule_id).alias("rule_id"),
            F.col("bucket"),
            F.concat_ws("|", F.col("bucket").cast("string"), F.col("column")).alias("key"),
            F.format_number(F.col("null_rate"), 6).alias("observed"),
            F.format_number(F.lit(max_null_rate), 6).alias("expected"),
        )

    def stats(self, ctx: CheckContext) -> DataFrame:
        files = ctx.files_with_bucket()
        cols = self._stat_cols(files)
        return column_stats(files.select("bucket", *cols), group_col="bucket", cols=cols)


class DriftRule:
    """N4: per-bucket lang (chi²) and content-length (KS) drift vs the
    pooled rest-of-table distribution."""

    rule_id = "drift"
    version = "1"

    @staticmethod
    def _len_expr(df: DataFrame):
        return F.col("content_len") if "content_len" in df.columns else F.length("content")

    @staticmethod
    def _cat_col(df: DataFrame) -> str | None:
        """'lang' when present; None degrades to length-only drift (the
        runner treats a missing optional column as a schema finding, not
        a crash — mirror that here instead of raising in plan build)."""
        return "lang" if "lang" in df.columns else None

    def check(self, ctx: CheckContext) -> DataFrame:
        files = ctx.files_with_bucket()
        alpha = float(ctx.params.get("alpha", 0.01))
        cat = self._cat_col(files)
        # one scan+shuffle per side: both histograms are marginals of the
        # joint cube, whose Exchange is computed once (ReuseExchange)
        if cat is not None:
            cube = histogram_cube(files, cat, self._len_expr(files), by="bucket")
            lang_hist = cube_marginal(cube, "cat")
            len_hist = cube_marginal(cube, "len")
        else:
            from opengauss_tools_datachecker_spark.operators.drift import length_histogram

            lang_hist = None
            len_hist = length_histogram(files, self._len_expr(files), by="bucket")
        ref_lang = ref_len = None
        ref_cube = ctx.baseline_cube
        if ref_cube is None and ctx.baseline is not None:
            base = ctx.baseline
            if "bucket" not in base.columns:
                base = base.withColumn("bucket", bucket_of("repo", ctx.n_buckets))
            if self._cat_col(base) is not None:
                ref_cube = histogram_cube(base, "lang", self._len_expr(base), by="bucket")
            else:
                from opengauss_tools_datachecker_spark.operators.drift import length_histogram

                ref_len = length_histogram(base, self._len_expr(base), by="bucket")
        if ref_cube is not None:
            ref_lang = cube_marginal(ref_cube, "cat")
            ref_len = cube_marginal(ref_cube, "len")
        ks = drift_verdicts(
            len_hist, ref_len, test="ks", alpha=alpha, numeric_order=True
        ).filter("drifted")

        def to_violations(v: DataFrame, which: str) -> DataFrame:
            return v.select(
                F.lit(self.rule_id).alias("rule_id"),
                F.col("bucket"),
                F.concat_ws("|", F.lit(which), F.col("bucket").cast("string")).alias("key"),
                F.format_number(F.col("statistic"), 4).alias("observed"),
                F.format_number(F.col("threshold"), 4).alias("expected"),
            )

        out = to_violations(ks, "len_ks")
        if lang_hist is not None:
            chi2 = drift_verdicts(lang_hist, ref_lang, test="chi2", alpha=alpha).filter(
                "drifted"
            )
            out = to_violations(chi2, "lang_chi2").unionByName(out)
        return out


class NumericOutlierRule:
    """N7 (extension): per-row robust outliers on content length.

    Drift (N4) flags a bucket whose whole histogram moved; this rule
    flags the individual rows whose length is outside a median ± k
    * 1.4826 * MAD band for their bucket — a truncated or inflated file
    that leaves the bucket distribution statistically intact. Opt-in:
    applicable only when ``params['outlier_k']`` is set, because a
    robust band on organic long-tailed data legitimately contains
    outliers — the operator is a screen, the user picks the bound.

    Stats aggregate to one row per bucket and broadcast back (two scans
    of the cached narrow projection, zero shuffles on the flagging
    side). ``params['outlier_approx']`` switches to the single-pass
    approx_percentile sketch for the 10^12-row scan.
    """

    rule_id = "numeric_outlier"
    version = "1"

    @staticmethod
    def applicable(ctx: CheckContext) -> bool:
        return ctx.params.get("outlier_k") is not None

    def check(self, ctx: CheckContext) -> DataFrame:
        from opengauss_tools_datachecker_spark.operators.outliers import (
            MAD_SIGMA,
            robust_outliers,
        )

        files = ctx.files_with_bucket()
        length = (
            F.col("content_len") if "content_len" in files.columns else F.length("content")
        )
        k = float(ctx.params["outlier_k"])
        flagged = robust_outliers(
            files.select(*KEY_COLS, "bucket", length.alias("_len")),
            "_len",
            by=["bucket"],
            k=k,
            approx=bool(ctx.params.get("outlier_approx", False)),
        )
        return flagged.select(
            F.lit(self.rule_id).alias("rule_id"),
            F.col("bucket"),
            key_expr(*KEY_COLS).alias("key"),
            F.col("_len").cast("string").alias("observed"),
            F.concat_ws(
                "..",
                F.round(F.col("med") - F.lit(k * MAD_SIGMA) * F.col("mad"), 2).cast("string"),
                F.round(F.col("med") + F.lit(k * MAD_SIGMA) * F.col("mad"), 2).cast("string"),
            ).alias("expected"),
        )


class SecretsRule:
    """N8 (extension): leaked-credential scan on file content.

    For a table of source-code repos the highest-value per-row content
    check after integrity is secret leakage: AWS access keys, private
    key headers, GitHub/Slack tokens (functions/text.SECRET_PATTERNS —
    fixed-prefix shapes with near-zero false-positive rates). The
    reference has no analog; a migration verifier that already scans
    every content byte gets this for one more codegen projection.

    Opt-in via ``params['secrets']=True`` (a policy scan, not an
    integrity invariant). Under ``run_suite`` the flag folds the
    pattern counts into prepare_files' single content pass (the bytes
    are in cache for the sha256 anyway — zero extra I/O); standalone
    the rule scans content itself. Pure map either way: one codegen
    ``regexp_count`` per pattern, filter any>0 — zero shuffle at any
    scale. ``observed`` summarizes matched patterns as
    ``name=count ...``; ``expected`` is the empty policy.
    """

    rule_id = "secrets"
    version = "1"

    @staticmethod
    def applicable(ctx: CheckContext) -> bool:
        if not ctx.params.get("secrets"):
            return False
        cols = set(ctx.files.columns)
        return "content" in cols or "n_aws_key" in cols

    def check(self, ctx: CheckContext) -> DataFrame:
        from opengauss_tools_datachecker_spark.functions.text import (
            SECRET_PATTERNS,
            secret_counts,
        )

        files = ctx.files_with_bucket()
        names = [f"n_{name}" for name, _ in SECRET_PATTERNS]
        if names[0] in files.columns:
            counted = files.select(*KEY_COLS, "bucket", *names)
        else:
            counted = files.select(*KEY_COLS, "bucket", *secret_counts("content"))
        hit = None
        for n in names:
            d = F.coalesce(F.col(n), F.lit(0)) > 0
            hit = d if hit is None else (hit | d)
        summary = F.concat_ws(
            " ",
            *[
                F.when(
                    F.coalesce(F.col(n), F.lit(0)) > 0,
                    F.concat(F.lit(n[2:] + "="), F.col(n).cast("string")),
                )
                for n in names
            ],
        )
        return counted.filter(hit).select(
            F.lit(self.rule_id).alias("rule_id"),
            F.col("bucket"),
            key_expr(*KEY_COLS).alias("key"),
            summary.alias("observed"),
            F.lit("no credential material").alias("expected"),
        )


ALL_RULES = [
    SchemaRule(),
    ContentSha256Rule(),
    UniquenessRule(),
    ReferentialRule(),
    ColumnStatsRule(),
    DriftRule(),
    NumericOutlierRule(),
    SecretsRule(),
]
