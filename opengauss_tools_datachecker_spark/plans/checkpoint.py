"""Checkpoint / resume / lineage — the control table (N6).

The reference restarts from scratch every run (scratch checksum tables
dropped and recreated, /root/reference src/main/java/com/gauss/preparer/
GaussRecordPreparer.java:58-59). Here each (bucket, rule) completion is
recorded with lineage — input snapshot id and rule version — so a
killed job re-plans only the partitions whose (snapshot, rule_version)
completion is missing (BASELINE.json north_star "resumable").

Storage: an append-only parquet directory (latest row per key wins by
``updated_at``); on an Iceberg deployment this becomes an Iceberg table
with the identical schema — the reader below is storage-agnostic. The
control table is metadata-sized (buckets × rules rows per run), never
data-sized.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

CONTROL_SCHEMA = (
    "run_id string, bucket int, rule_id string, rule_version string, "
    "snapshot_id string, status string, n_violations long, updated_at double, "
    # per-partition run metrics (north-star: "check status, lineage ...
    # and metrics are checkpointed"): rows the rule saw in this bucket,
    # and the wall seconds of the rule's materialization action (rule-
    # level — concurrent actions share the wall clock, so this is the
    # action's span, not an exclusive-CPU figure). NULL on rows written
    # by older code (the explicit read schema backfills them) and on
    # carried-forward verdicts (their metrics belong to the run that
    # computed them, joinable via run_id).
    "n_rows long, elapsed_sec double"
)


class ControlTable:
    def __init__(self, path: str):
        self.path = path

    def read(self, spark: SparkSession) -> DataFrame:
        try:
            raw = spark.read.schema(CONTROL_SCHEMA).parquet(self.path)
        except Exception:
            return spark.createDataFrame([], CONTROL_SCHEMA)
        w = Window.partitionBy("bucket", "rule_id", "snapshot_id", "rule_version").orderBy(
            F.col("updated_at").desc()
        )
        return raw.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")

    def completed_pairs(
        self, spark: SparkSession, snapshot_id: str, rule_versions: dict[str, str]
    ) -> set[tuple[int, str]]:
        """(bucket, rule_id) pairs already SUCCESS for this exact lineage."""
        ctl = self.read(spark).filter(
            (F.col("snapshot_id") == snapshot_id) & (F.col("status").isin("PASS", "FAIL"))
        )
        rows = ctl.select("bucket", "rule_id", "rule_version").collect()
        return {
            (r.bucket, r.rule_id)
            for r in rows
            if rule_versions.get(r.rule_id) == r.rule_version
        }

    def record(
        self,
        spark: SparkSession,
        verdict_rows: list[tuple[int, str, int, str]],
        snapshot_id: str,
        rule_versions: dict[str, str],
        run_id: str | None = None,
        metrics: dict[tuple[int, str], tuple[int | None, float | None]] | None = None,
    ) -> None:
        """Append (bucket, rule_id, n_violations, status) verdicts.
        ``metrics`` maps (bucket, rule_id) → (n_rows, elapsed_sec);
        missing keys (and carried-forward verdicts) record NULLs."""
        run_id = run_id or uuid.uuid4().hex[:12]
        now = time.time()
        metrics = metrics or {}
        rows = []
        for (b, rid, n, status) in verdict_rows:
            n_rows, elapsed = metrics.get((b, rid), (None, None))
            rows.append(
                (run_id, b, rid, rule_versions.get(rid, "1"), snapshot_id,
                 status, int(n), now,
                 int(n_rows) if n_rows is not None else None,
                 float(elapsed) if elapsed is not None else None)
            )
        spark.createDataFrame(rows, CONTROL_SCHEMA).coalesce(1).write.mode("append").parquet(
            self.path
        )
