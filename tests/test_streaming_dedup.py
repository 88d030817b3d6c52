"""Streaming exact dedup: the watermarked stream must keep one
representative per distinct normalized text, matching the batch twin's
group count."""

import shutil
import tempfile

from pyspark.sql import types as T

from rust_triplets_spark.streaming.dedup import stream_exact_dedup

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("text", T.StringType()),
])


def test_stream_dedup_keeps_one_per_distinct_text(spark):
    # 60 rows over 20 distinct texts (each text 3x, whitespace-varied so
    # normalization is load-bearing)
    rows = []
    for i in range(60):
        base = f"document body number {i % 20} with words"
        text = base if i % 3 == 0 else base.replace(" ", "  ")
        rows.append((i, (1_700_000_000 + i * 60) * 1_000_000_000, text))
    src = tempfile.mkdtemp(prefix="sd_src_")
    ckpt = tempfile.mkdtemp(prefix="sd_ckpt_")
    try:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(src)
        sdf = stream_exact_dedup(spark, src, SCHEMA, ts_col="ts", watermark="10 minutes")
        q = (
            sdf.writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM dedup_out").collect()
        q.stop()
        assert len(got) == 20
        # the streaming dedup is keyed on NORMALIZED text: every distinct
        # base text survives exactly once
        assert len({r["doc_id"] % 20 for r in got}) == 20
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_dedup_unkeyed_backfill(spark):
    rows = [(i, 0, f"text {i % 5}") for i in range(25)]
    src = tempfile.mkdtemp(prefix="sd_src2_")
    ckpt = tempfile.mkdtemp(prefix="sd_ckpt2_")
    try:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(src)
        sdf = stream_exact_dedup(spark, src, SCHEMA)  # no ts: finite backfill
        q = (
            sdf.writeStream.format("memory")
            .queryName("dedup_out2")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) AS n FROM dedup_out2").collect()[0]["n"]
        q.stop()
        assert n == 5
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
