"""Streaming fuzzy decontamination: the row-local signature must equal the
batch aggregate bit-for-bit, and the stream-static band join must flag the
same candidates as the batch fuzzy decontaminator."""

import shutil
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _phrase(i: int, n: int = 40) -> str:
    return " ".join(f"d{i}w{j}" for j in range(n))


def _near_copy(text: str) -> str:
    toks = text.split()
    toks[len(toks) // 2] = "CHANGED"
    return " ".join(toks)


def _docs(spark):
    rows = [Row(doc_id=0, text=_phrase(500)),           # exact copy of eval 100
            Row(doc_id=1, text=_near_copy(_phrase(501))),  # near-copy of eval 101
            Row(doc_id=2, text="too short")]            # < shingle_n tokens → null sig
    rows += [Row(doc_id=i, text=_phrase(i)) for i in range(3, 12)]
    return spark.createDataFrame(rows, SCHEMA)


def _eval(spark):
    return spark.createDataFrame(
        [Row(doc_id=100, text=_phrase(500)),
         Row(doc_id=101, text=_phrase(501)),
         Row(doc_id=102, text=_phrase(502))], SCHEMA)


def test_rowlocal_signature_equals_batch_aggregate(spark):
    """minhash_signature_array_col (streaming path) and minhash_signatures
    (batch aggregate) are the SAME function of the text — k slots,
    bit-for-bit."""
    from rust_triplets_spark.operators.dedup import (
        minhash_signature_array_col,
        minhash_signatures,
    )

    docs = _docs(spark)
    k = 16
    agg = {
        r.id: [r[f"mh_{i}"] for i in range(k)]
        for r in minhash_signatures(docs, "doc_id", "text", num_hashes=k).collect()
    }
    row_local = {
        r.id: r.sig
        for r in docs.select(
            F.col("doc_id").alias("id"),
            minhash_signature_array_col(F.col("text"), num_hashes=k).alias("sig"),
        ).collect()
    }
    # aggregate: no row for shingle-less docs; row-local: null — same gap
    assert {i for i, s in row_local.items() if s is not None} == set(agg)
    for i, sig in agg.items():
        assert row_local[i] == sig, i


def test_batch_flags_match_fuzzy_decontaminate_candidates(spark):
    """fuzzy_decontam_flags applied to a BATCH frame finds exactly the
    candidate set the batch fuzzy decontaminator reports (n_candidates>0
    ids), with per-band rows collapsing to the same pairs."""
    from rust_triplets_spark.operators.decontam import fuzzy_decontaminate
    from rust_triplets_spark.streaming.decontam import (
        fuzzy_decontam_flags,
        fuzzy_eval_index,
    )

    docs, ev = _docs(spark), _eval(spark)
    idx = fuzzy_eval_index(ev, "doc_id", "text")
    flagged = {
        (r.id, r.eval_id)
        for r in fuzzy_decontam_flags(docs, idx, "doc_id", "text").collect()
    }
    batch_ids = {
        r.id
        for r in fuzzy_decontaminate(docs, ev, "doc_id", "text").collect()
        if r.n_candidates > 0
    }
    assert {i for i, _ in flagged} == batch_ids
    assert (0, 100) in flagged and (1, 101) in flagged


def test_stream_flags_equal_batch_flags(spark):
    """File-source streaming run == batch run of the same transformation
    (map-only + stream-static join ⇒ append mode, no state)."""
    from rust_triplets_spark.streaming.decontam import (
        fuzzy_decontam_flags,
        fuzzy_eval_index,
        stream_fuzzy_decontam,
    )

    docs, ev = _docs(spark), _eval(spark)
    src = tempfile.mkdtemp(prefix="fzd_src_")
    ckpt = tempfile.mkdtemp(prefix="fzd_ckpt_")
    try:
        docs.coalesce(2).write.mode("overwrite").parquet(src)
        sdf = stream_fuzzy_decontam(spark, src, SCHEMA, ev)
        q = (
            sdf.writeStream.format("memory")
            .queryName("fzd_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        got = {
            (r.id, r.eval_id, r.band)
            for r in spark.sql("SELECT * FROM fzd_out").collect()
        }
        q.stop()
        idx = fuzzy_eval_index(ev, "doc_id", "text")
        expect = {
            (r.id, r.eval_id, r.band)
            for r in fuzzy_decontam_flags(docs, idx, "doc_id", "text").collect()
        }
        assert got == expect
        assert got  # the planted leaks guarantee a non-vacuous check
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
