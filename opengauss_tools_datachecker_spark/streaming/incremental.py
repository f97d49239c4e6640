"""Incremental (streaming) validation via Structured Streaming.

The reference's incremental mode is vestigial — ProgressStatus.INCING
and tablepks exist but no incremental extractor was ever wired
(/root/reference src/main/java/com/gauss/common/model/ProgressStatus.java;
GaussController.java:234-250 always chooses the once-full extractor).
This module supplies what the reference stubbed out: newly-arriving
file rows are checksummed and verified against the manifest as they
land, with exactly-once violation output via foreachBatch, plus a
watermarked windowed event-rate monitor (the streaming analog of the
reference's StatAggregation TPS printer, StatAggregation.java:45-126).

Scale notes: the per-batch join is stream-static; keep the manifest in
a broadcast-able or bucketed store. Watermark bounds state; output is
append-only violations.
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
    static manifest; append violations to output_dir. Returns the query.

    Use ``trigger(availableNow=True)`` semantics via processAllAvailable
    in tests; in production this runs continuously as files land.
    """
    stream = spark.readStream.schema(FILES_STREAM_SCHEMA).parquet(input_dir)
    observed = stream.select(*KEY_COLS, F.sha2("content", 256).alias("observed"))

    def verify_batch(batch_df: DataFrame, epoch_id: int) -> None:
        joined = batch_df.join(F.broadcast(manifest), KEY_COLS, "left")
        violations = joined.filter(
            ~F.col("observed").eqNullSafe(F.col("expected_sha256"))
        ).select(
            F.lit("sha256_incremental").alias("rule_id"),
            F.concat_ws("|", *KEY_COLS).alias("key"),
            "observed",
            F.col("expected_sha256").alias("expected"),
        )
        violations.write.mode("append").parquet(output_dir)

    return (
        observed.writeStream.foreachBatch(verify_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
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
