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
