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


import os

import pytest


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.isdir("/root/repo/.scale/sf1"),
    reason="sf1 scale data not generated (scripts/gen_scale_data.py)",
)
def test_stream_resume_equality_sf1(spark, tmp_path):
    """VERDICT r5 #7: kill/resume from checkpoint over sf1 events (1M rows)
    must equal an uninterrupted run AND the batch twin. The interruption is
    made deterministic by staging the file source: the first query sees 4
    of 8 files, stops, and the resumed query (same checkpoint) picks up the
    other 4 — exactly the production stop/restart-with-new-data path."""
    import glob as globmod
    import shutil

    events = spark.read.parquet("/root/repo/.scale/sf1/events.parquet")
    schema = events.schema
    staged = str(tmp_path / "staged")
    events.repartition(8).write.parquet(staged)
    files = sorted(globmod.glob(os.path.join(staged, "*.parquet")))
    assert len(files) == 8

    def run_stream(src, ckpt, qname):
        sdf = stream_tumbling_agg(spark, src, schema, window_seconds=3600)
        return (
            sdf.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .option("maxFilesPerTrigger", "2")
            .start()
        )

    def table(qname):
        return {
            (r["window_start"].timestamp(), r["event_type"]): r["n"]
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }

    # uninterrupted reference run: all 8 files visible from the start
    src_a = str(tmp_path / "src_a")
    os.makedirs(src_a)
    for f in files:
        shutil.copy(f, src_a)
    qa = run_stream(src_a, str(tmp_path / "ckpt_a"), "resume_ref")
    qa.processAllAvailable()
    want = table("resume_ref")
    qa.stop()

    # interrupted run: 4 files → stop → 4 more files → resume same checkpoint
    src_b = str(tmp_path / "src_b")
    ckpt_b = str(tmp_path / "ckpt_b")
    os.makedirs(src_b)
    for f in files[:4]:
        shutil.copy(f, src_b)
    qb1 = run_stream(src_b, ckpt_b, "resume_part1")
    qb1.processAllAvailable()
    partial = table("resume_part1")
    qb1.stop()
    for f in files[4:]:
        shutil.copy(f, src_b)
    qb2 = run_stream(src_b, ckpt_b, "resume_part2")
    qb2.processAllAvailable()
    got = table("resume_part2")
    qb2.stop()

    assert partial != want  # the kill really happened mid-corpus
    assert got == want

    # batch twin agreement (ground truth for the whole corpus)
    batch = {
        (float(r["window_start_s"]), r["key"]): r["n"]
        for r in tumbling_agg(events, window_seconds=3600).collect()
    }
    assert {(float(k[0]), k[1]): v for k, v in got.items()} == batch
    assert len(batch) > 100


def test_native_session_window_stream_matches_batch(spark, tmp_path):
    """session_agg_native is ONE expression for batch and streaming — the
    batch run is the streaming run's oracle. Append mode emits a session
    when the watermark passes its close; the test flushes with far-future
    sentinel rows (excluded from comparison)."""
    import shutil as _shutil

    from rust_triplets_spark.streaming.windows import (
        session_agg_native,
        sessionize,
        stream_session_agg_native,
    )

    base = 1_700_000_000
    rows = []
    eid = 0
    for u in range(5):
        t = base + u * 37
        for s in range(3):           # 3 sessions per user
            for k in range(4):       # 4 events per session, 300 s apart
                rows.append((eid, (t + k * 300) * 1_000_000_000, "c", 1.0, u))
                eid += 1
            t += 4 * 300 + 1800 + 61  # > gap, never exactly == gap
    SCHEMA_U = T.StructType(SCHEMA.fields + [T.StructField("user_id", T.LongType())])
    df = spark.createDataFrame(rows, SCHEMA_U)

    src = str(tmp_path / "src")
    df.coalesce(2).write.parquet(src)

    want = {
        (r["user_id"], r["start_us"], r["end_us"]): r["n_events"]
        for r in session_agg_native(df, gap_seconds=1800).collect()
    }
    assert len(want) == 15
    # gaps-and-islands twin agrees off the exact-gap boundary
    isl = {
        (r["user_id"], r["start_us"], r["end_us"]): r["n_events"]
        for r in sessionize(df, gap_seconds=1800).collect()
    }
    assert isl == want

    sdf = stream_session_agg_native(
        spark, src, SCHEMA_U, gap_seconds=1800, watermark="1 hour"
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("native_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    # two sentinel files, each later than everything + gap + watermark, so
    # the post-sentinel batch finds the watermark past every real session
    for i, off in enumerate((900_000, 950_000)):
        spark.createDataFrame(
            [(10_000 + i, (base + off) * 1_000_000_000, "c", 1.0, 999)], SCHEMA_U
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    got = {
        (r["user_id"], r["start_us"], r["end_us"]): r["n_events"]
        for r in spark.sql("SELECT * FROM native_sessions WHERE user_id < 999").collect()
    }
    q.stop()
    assert got == want
