"""Streaming DSIR scoring: the fitted-bucket-table scorer must equal the
batch operator exactly on the fitted corpus, handle novel buckets through
the default branch, and produce identical rows from a file stream."""

import shutil
import tempfile

from pyspark.sql import Row
from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])

RAW = [
    Row(doc_id=0, text="uno dos tres cuatro cinco seis"),
    Row(doc_id=1, text="alpha beta uno dos gamma delta"),
    Row(doc_id=2, text="alpha beta gamma delta alpha beta"),
    Row(doc_id=3, text=""),
    Row(doc_id=4, text="one"),
]
TARGET = [
    Row(doc_id=10, text="alpha beta gamma delta epsilon"),
    Row(doc_id=11, text="alpha beta gamma alpha beta gamma"),
]


def _rows(df):
    return {
        r.id: (r.n_feats, r.weight_q, r.avg_logratio) for r in df.collect()
    }


def test_stream_scorer_equals_batch_operator(spark):
    from rust_triplets_spark.operators.dsir import dsir_importance_weights
    from rust_triplets_spark.streaming.dsir import (
        dsir_model,
        score_with_dsir_model,
    )

    raw = spark.createDataFrame(RAW, SCHEMA)
    target = spark.createDataFrame(TARGET, SCHEMA)
    model = dsir_model(raw, target, "text")
    # bounded by construction: the table can never exceed the feature space
    assert len(model.buckets) <= model.n_buckets
    got = _rows(score_with_dsir_model(raw, model, "doc_id", "text"))
    expect = _rows(dsir_importance_weights(raw, target, "doc_id", "text"))
    assert got == expect
    # degenerate docs: empty -> no features/null weight; 1 token -> its
    # unigram feature still scores
    assert got[3] == (0, None, None)
    assert got[4][0] == 1 and got[4][1] is not None


def test_novel_buckets_take_default_branch(spark):
    from rust_triplets_spark.streaming.dsir import (
        dsir_model,
        score_with_dsir_model,
    )

    raw = spark.createDataFrame(RAW, SCHEMA)
    target = spark.createDataFrame(TARGET, SCHEMA)
    model = dsir_model(raw, target, "text")
    # a wholly-novel doc: with high probability its hashed buckets were
    # never observed — every feature must score default_lrq, never KeyError
    novel = spark.createDataFrame(
        [Row(doc_id=99, text="zzzz qqqq wwww rrrr")], SCHEMA
    )
    out = _rows(score_with_dsir_model(novel, model, "doc_id", "text"))
    n_feats, weight_q, _ = out[99]
    assert n_feats == 7  # 4 unigrams + 3 bigrams
    # every bucket is either in-table or default; the sum is finite
    assert isinstance(weight_q, int)


def test_stream_dsir_equals_batch_from_files(spark):
    from rust_triplets_spark.streaming.dsir import (
        dsir_model,
        score_with_dsir_model,
        stream_dsir_scores,
    )

    raw = spark.createDataFrame(RAW, SCHEMA)
    target = spark.createDataFrame(TARGET, SCHEMA)
    model = dsir_model(raw, target, "text")
    src = tempfile.mkdtemp(prefix="dsir_src_")
    ckpt = tempfile.mkdtemp(prefix="dsir_ckpt_")
    try:
        raw.coalesce(2).write.mode("overwrite").parquet(src)
        sdf = stream_dsir_scores(spark, src, SCHEMA, model)
        q = (
            sdf.writeStream.format("memory")
            .queryName("dsir_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        got = _rows(spark.sql("SELECT * FROM dsir_out"))
        q.stop()
        expect = _rows(score_with_dsir_model(raw, model, "doc_id", "text"))
        assert got == expect
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
