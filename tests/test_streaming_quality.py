"""Streaming bigram-LM quality scoring: the broadcast-model scorer must
equal the batch operator exactly (unpruned), back off sanely when pruned,
and produce identical rows from a file stream."""

import shutil
import tempfile

from pyspark.sql import Row
from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _corpus(spark):
    rows = [
        Row(doc_id=0, text="the cat sat on the mat"),
        Row(doc_id=1, text="the cat sat on the cat"),
        Row(doc_id=2, text="one"),
        Row(doc_id=3, text=""),
        Row(doc_id=4, text="zz yy xx ww vv uu"),
        Row(doc_id=5, text="the quick brown fox jumps over the lazy dog"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _scores(df):
    return {
        r.id: (r.n_transitions, r.nll_q, r.avg_nll) for r in df.collect()
    }


def test_unpruned_model_scorer_equals_batch_operator(spark):
    from rust_triplets_spark.operators.lm_quality import bigram_lm_scores
    from rust_triplets_spark.streaming.quality import (
        bigram_lm_model,
        score_with_model,
    )

    docs = _corpus(spark)
    model = bigram_lm_model(docs, "doc_id", "text")
    got = _scores(score_with_model(docs, model, "doc_id", "text"))
    expect = _scores(bigram_lm_scores(docs, "doc_id", "text"))
    assert got == expect


def test_pruned_model_backoff_is_pessimistic(spark):
    """Pruning drops a type's exact nll in favor of the smoothing floor,
    which is always >= the trained value — a pruned model can only score
    documents WORSE (higher nll), never better. Unseen docs vs the model
    corpus go through the same backoff branches."""
    from rust_triplets_spark.streaming.quality import (
        bigram_lm_model,
        score_with_model,
    )

    docs = _corpus(spark)
    full = bigram_lm_model(docs, "doc_id", "text")
    pruned = bigram_lm_model(docs, "doc_id", "text", max_types=3)
    assert len(pruned.types) == 3 and len(full.types) > 3
    assert pruned.ctx == full.ctx and pruned.v == full.v
    sf = _scores(score_with_model(docs, full, "doc_id", "text"))
    sp = _scores(score_with_model(docs, pruned, "doc_id", "text"))
    assert set(sf) == set(sp)
    for i in sf:
        if sf[i][1] is None:
            assert sp[i][1] is None
        else:
            assert sp[i][1] >= sf[i][1], i
    # a wholly-novel doc: every prev unseen → uniform -ln(1/V) per step
    import math

    novel = spark.createDataFrame([Row(doc_id=9, text="n1 n2 n3")], SCHEMA)
    out = _scores(score_with_model(novel, full, "doc_id", "text"))
    per_step = int(math.floor(math.log(float(full.v)) * 1e9 + 0.5))
    assert out[9] == (2, 2 * per_step, 2 * per_step / 2e9)


def test_stream_scores_equal_batch_scorer(spark):
    from rust_triplets_spark.streaming.quality import (
        bigram_lm_model,
        score_with_model,
        stream_quality_scores,
    )

    docs = _corpus(spark)
    model = bigram_lm_model(docs, "doc_id", "text")
    src = tempfile.mkdtemp(prefix="lmq_src_")
    ckpt = tempfile.mkdtemp(prefix="lmq_ckpt_")
    try:
        docs.coalesce(2).write.mode("overwrite").parquet(src)
        sdf = stream_quality_scores(spark, src, SCHEMA, model)
        q = (
            sdf.writeStream.format("memory")
            .queryName("lmq_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        got = _scores(spark.sql("SELECT * FROM lmq_out"))
        q.stop()
        expect = _scores(score_with_model(docs, model, "doc_id", "text"))
        assert got == expect
        assert any(v[1] is not None for v in got.values())
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_max_ctx_bounds_driver_collect_exactly(spark):
    """max_ctx caps the collected context map without touching kept-type
    nll values: (a) with max_ctx >= vocab the model is identical to the
    full build, (b) with a smaller cap the kept contexts keep their exact
    totals, kept types keep their exact trained nll (the join against the
    full ctx frame, NOT the pruned dict), and a dropped context scores
    through the unseen-prev uniform branch."""
    import math

    from rust_triplets_spark.streaming.quality import bigram_lm_model

    docs = _corpus(spark)
    full = bigram_lm_model(docs, "doc_id", "text")
    same = bigram_lm_model(docs, "doc_id", "text", max_ctx=len(full.ctx))
    assert same.types == full.types and same.ctx == full.ctx and same.v == full.v

    cap = 3
    pruned = bigram_lm_model(docs, "doc_id", "text", max_ctx=cap)
    assert len(pruned.ctx) == cap and len(full.ctx) > cap
    # kept contexts are the top-cap by mass, with exact totals
    top = sorted(full.ctx.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
    assert pruned.ctx == dict(top)
    # kept types keep EXACT trained nll — including types whose context
    # was dropped from the collected dict
    assert pruned.types == full.types
    dropped = [p for p in full.ctx if p not in pruned.ctx]
    assert dropped
    uniform = int(math.floor(math.log(float(full.v)) * 1e9 + 0.5))
    for prev in dropped:
        # a (dropped-prev, unseen-cur) lookup takes the uniform branch
        assert pruned.nll_q_for(prev, -1) == uniform
        # ...but a TRAINED type under that prev still scores exactly
        for (p, c), q in full.types.items():
            if p == prev:
                assert pruned.nll_q_for(p, c) == q


def test_gopher_signals_run_unchanged_on_a_stream(spark):
    """gopher_quality_signals is pure row-local column math — the SAME
    function gates batch corpora and ingest streams (map-only, append
    mode, no state). Pin stream == batch so a future regression that
    sneaks a window/aggregate into the signals breaks loudly."""
    import shutil
    import tempfile

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from rust_triplets_spark.operators.gopher import gopher_quality_signals

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    rows = [Row(doc_id=0, text="the quick brown fox jumps over the lazy dog "
                               "and then some more words with it to be sure"),
            Row(doc_id=1, text="• a\n• b\n• c"),
            Row(doc_id=2, text="")]
    docs = spark.createDataFrame(rows, schema)
    src = tempfile.mkdtemp(prefix="gq_src_")
    ckpt = tempfile.mkdtemp(prefix="gq_ckpt_")
    try:
        docs.coalesce(1).write.mode("overwrite").parquet(src)
        sdf = gopher_quality_signals(
            spark.readStream.schema(schema).parquet(src), "doc_id", "text"
        )
        q = (
            sdf.writeStream.format("memory").queryName("gq_out")
            .outputMode("append").option("checkpointLocation", ckpt).start()
        )
        q.processAllAvailable()
        got = {r.id: r.asDict() for r in spark.sql("SELECT * FROM gq_out").collect()}
        q.stop()
        want = {r.id: r.asDict()
                for r in gopher_quality_signals(docs, "doc_id", "text").collect()}
        assert got == want and len(got) == 3
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
