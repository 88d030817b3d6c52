"""Streaming PSI parity: the stream's final per-slice PSI against a
frozen baseline must EQUAL the batch operator bit-for-bit when the
model is built over the same corpus, and must accumulate correctly
across micro-batches."""

import shutil
import tempfile

from pyspark.sql import types as T

from rust_triplets_spark.operators.drift import source_drift_psi
from rust_triplets_spark.streaming.drift import (
    psi_against_model,
    psi_baseline_model,
    stream_drift_psi,
)

SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def _rows():
    out = []
    for s in range(4):
        for i in range(60):
            out.append((f"src{s}", 48 + ((i * 37 + s * 111) % 500)))
    return out


def test_batch_apply_equals_batch_operator(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    model = psi_baseline_model(df, "n_chars")
    got = {
        r["slice"]: (r["n_rows"], r["psi_pico"])
        for r in psi_against_model(df, model, "source", "n_chars").collect()
    }
    exp = {
        r["slice"]: (r["n_rows"], r["psi_pico"])
        for r in source_drift_psi(df, "source", "n_chars").collect()
    }
    assert got == exp


def test_stream_final_state_equals_batch(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    model = psi_baseline_model(df, "n_chars")
    src = tempfile.mkdtemp(prefix="psi_src_")
    ckpt = tempfile.mkdtemp(prefix="psi_ckpt_")
    try:
        # three files -> up to three micro-batches
        df.repartition(3).write.mode("overwrite").parquet(src)
        sdf = stream_drift_psi(spark, src, SCHEMA, model, "source", "n_chars")
        q = (
            sdf.writeStream.format("memory")
            .queryName("psi_stream")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        got = {
            r["slice"]: (r["n_rows"], r["psi_pico"])
            for r in spark.sql("SELECT * FROM psi_stream").collect()
        }
        q.stop()
        exp = {
            r["slice"]: (r["n_rows"], r["psi_pico"])
            for r in source_drift_psi(df, "source", "n_chars").collect()
        }
        assert got == exp
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_drifted_stream_lights_up(spark):
    """A stream slice far from the frozen baseline crosses the 0.25
    threshold; a matching slice stays under 0.1."""
    base = spark.createDataFrame(
        [("b", 48 + (i * 7) % 200) for i in range(400)], SCHEMA
    )
    # grid matched to the value span (4 bins over [0, 256) + tail): on a
    # 16-bin grid the 12 empty bins' +1 smoothing bias alone reads ~0.1
    # for a 100-row slice — bin geometry is part of monitor tuning
    model = psi_baseline_model(base, "n_chars", n_bins=4, bin_width=64)
    probe = spark.createDataFrame(
        [("match", 48 + (i * 7) % 200) for i in range(100)]
        + [("drift", 800 + i % 50) for i in range(100)],
        SCHEMA,
    )
    got = {
        r["slice"]: r["psi_pico"]
        for r in psi_against_model(probe, model, "source", "n_chars")
        .collect()
    }
    assert got["drift"] > 250_000_000_000
    assert abs(got["match"]) < 100_000_000_000
