"""Structured Streaming: the streaming tumbling-window agg must reproduce
the batch twin's counts (same logic, watermarked file source)."""

import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_triplets_spark.streaming.windows import stream_tumbling_agg, tumbling_agg

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def test_stream_matches_batch(spark):
    rows = [
        (i, (1_700_000_000 + i * 700) * 1_000_000_000, "click" if i % 2 else "view", float(i))
        for i in range(200)
    ]
    src = tempfile.mkdtemp(prefix="ev_src_")
    ckpt = tempfile.mkdtemp(prefix="ev_ckpt_")
    try:
        df = spark.createDataFrame(rows, SCHEMA)
        df.coalesce(2).write.mode("overwrite").parquet(src)

        stream_df = stream_tumbling_agg(spark, src, SCHEMA, window_seconds=3600)
        q = (
            stream_df.writeStream.format("memory")
            .queryName("win_counts")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        got = {
            (r["window_start"].timestamp(), r["event_type"]): r["n"]
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        q.stop()

        batch = tumbling_agg(df, window_seconds=3600)
        want = {
            (float(r["window_start_s"]), r["key"]): r["n"] for r in batch.collect()
        }
        assert got == want and len(want) > 10
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_watermark_present_in_plan(spark):
    src = tempfile.mkdtemp(prefix="ev_src2_")
    try:
        spark.createDataFrame([], SCHEMA).write.mode("overwrite").parquet(src)
        sdf = stream_tumbling_agg(spark, src, SCHEMA, watermark="30 minutes")
        assert sdf.isStreaming
        assert "EventTimeWatermark" in sdf._jdf.queryExecution().analyzed().toString()
    finally:
        shutil.rmtree(src, ignore_errors=True)
