"""Streaming Count-Min gate parity: the closure-side numpy estimator
must equal the batch operator's estimates token-for-token, the per-doc
gate must match a hand computation, and the stream's rows must equal
the batch apply across micro-batches."""

import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_triplets_spark.operators.sketches import countmin_heavy_hitters
from rust_triplets_spark.streaming.countmin import (
    cm_estimate_tokens,
    countmin_model,
    frequency_gate_col,
    stream_frequency_gate,
)

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])

TEXTS = [
    (0, "spark spark spark shuffle join join scan agg window sort"),
    (1, "spark shuffle shuffle shuffle broadcast join scan scan"),
    (2, "spark join filter map reduce scan agg agg"),
    (3, ""),
]


def test_estimates_match_batch_operator(spark):
    df = spark.createDataFrame(TEXTS, SCHEMA)
    model = countmin_model(df, "text", depth=3, width=4)
    batch = {
        r["token"]: r["cm_est"]
        for r in countmin_heavy_hitters(
            df, "text", depth=3, width=4, phi_num=1, phi_den=10**9
        ).collect()
    }  # phi tiny -> every token reported
    toks = sorted(batch)
    est = cm_estimate_tokens(model, toks)
    for t, e in zip(toks, est):
        assert int(e) == batch[t], t


def test_gate_matches_hand_computation(spark):
    df = spark.createDataFrame(TEXTS, SCHEMA)
    model = countmin_model(df, "text", depth=3, width=4)
    got = {
        r["doc_id"]: (r["g"]["n_tokens"], r["g"]["n_common"],
                      r["g"]["common_ratio_micro"])
        for r in df.select(
            "doc_id",
            frequency_gate_col(
                model, F.col("text"), phi_num=1, phi_den=10
            ).alias("g"),
        ).collect()
    }
    for did, text in TEXTS:
        toks = text.split()
        est = cm_estimate_tokens(model, toks)
        common = sum(1 for e in est if e * 10 >= model.n_total)
        exp = (
            len(toks),
            common,
            (common * 1_000_000 // len(toks)) if toks else 0,
        )
        assert got[did] == exp, did


def test_stream_equals_batch_apply(spark):
    df = spark.createDataFrame(TEXTS, SCHEMA)
    model = countmin_model(df, "text", depth=3, width=4)
    src = tempfile.mkdtemp(prefix="cm_src_")
    ckpt = tempfile.mkdtemp(prefix="cm_ckpt_")
    try:
        df.repartition(2).write.mode("overwrite").parquet(src)
        sdf = stream_frequency_gate(
            spark, src, SCHEMA, model, "doc_id", "text", 1, 10
        )
        q = (
            sdf.writeStream.format("memory")
            .queryName("cm_stream")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        got = {
            r["id"]: (r["n_tokens"], r["n_common"], r["common_ratio_micro"])
            for r in spark.sql("SELECT * FROM cm_stream").collect()
        }
        q.stop()
        g = frequency_gate_col(model, F.col("text"), 1, 10)
        exp = {
            r["doc_id"]: (r["g"]["n_tokens"], r["g"]["n_common"],
                          r["g"]["common_ratio_micro"])
            for r in df.select("doc_id", g.alias("g")).collect()
        }
        assert got == exp
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
