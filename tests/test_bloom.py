"""Bloom-filter membership — behavioral pins (cross-engine exactness is
pinned by the registered `bloom_ingest_probe` oracle twin)."""

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_triplets_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_probe,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("fp", T.LongType()),
])

M, K, SEED = 63 * 512, 4, 11


def _keys(spark, ids):
    # spread fingerprints over the hash31 domain like real ones
    return spark.createDataFrame(
        [Row(id=int(i), fp=int(i * 2654435761 % (2**31 - 1))) for i in ids],
        SCHEMA,
    )


def test_no_false_negatives(spark):
    hist = _keys(spark, range(0, 400))
    filt = bloom_build(hist, "fp", M, K, SEED)
    out = bloom_probe(filt, hist, "id", "fp", M, K, SEED).collect()
    assert len(out) == 400 and all(r.maybe_present for r in out)


def test_false_positive_rate_is_sane(spark):
    filt = bloom_build(_keys(spark, range(0, 400)), "fp", M, K, SEED)
    fresh = _keys(spark, range(10_000, 11_000))
    flagged = (
        bloom_probe(filt, fresh, "id", "fp", M, K, SEED)
        .where("maybe_present").count()
    )
    # 400 keys × 4 hashes in 32 256 bits → load ~4.8%, fp ≈ (1-e^-kn/m)^k
    # ≈ 5e-6; allow a generous margin for hash clumping
    assert flagged <= 5


def test_merge_equals_build_over_union(spark):
    a, b = _keys(spark, range(0, 200)), _keys(spark, range(200, 400))
    merged = bloom_merge([
        bloom_build(a, "fp", M, K, SEED),
        bloom_build(b, "fp", M, K, SEED),
    ])
    direct = bloom_build(a.unionByName(b), "fp", M, K, SEED)
    m = {r.word_idx: r.bits for r in merged.collect()}
    d = {r.word_idx: r.bits for r in direct.collect()}
    assert m == d


def test_probe_plan_broadcasts_filter_and_never_shuffles_probe(spark):
    filt = bloom_build(_keys(spark, range(0, 100)), "fp", M, K, SEED)
    plan = (
        bloom_probe(filt, _keys(spark, range(0, 100)), "id", "fp", M, K, SEED)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_model_probe_matches_batch_probe(spark):
    """The dense-model map-only probe (streaming path) answers exactly
    like the batch explode+join+aggregate probe — including any false
    positives (same bits, same hashes)."""
    from rust_triplets_spark.streaming.bloom import (
        bloom_filter_model,
        probe_with_model,
    )

    hist = _keys(spark, range(0, 400))
    probe = _keys(spark, range(0, 400)).unionByName(_keys(spark, range(10_000, 11_000)))
    filt = bloom_build(hist, "fp", M, K, SEED)
    model = bloom_filter_model(hist, "fp", M, K, SEED)
    batch = {r.id: r.maybe_present
             for r in bloom_probe(filt, probe, "id", "fp", M, K, SEED).collect()}
    dense = {r.id: r.maybe_present
             for r in probe_with_model(probe, model, "id", "fp").collect()}
    assert dense == batch
    assert all(batch[i] for i in range(400))  # no false negatives


def test_stream_probe_equals_batch(spark):
    import shutil
    import tempfile

    from rust_triplets_spark.streaming.bloom import (
        bloom_filter_model,
        probe_with_model,
        stream_bloom_probe,
    )

    hist = _keys(spark, range(0, 200))
    probe = _keys(spark, range(100, 300))  # half known, half fresh
    src = tempfile.mkdtemp(prefix="bloom_src_")
    ckpt = tempfile.mkdtemp(prefix="bloom_ckpt_")
    try:
        probe.coalesce(2).write.mode("overwrite").parquet(src)
        sdf = stream_bloom_probe(
            spark, src, SCHEMA, hist, id_col="id", key_col="fp",
            m_bits=M, k_hashes=K, seed=SEED,
        )
        q = (
            sdf.writeStream.format("memory")
            .queryName("bloom_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        got = {(r.id, r.maybe_present)
               for r in spark.sql("SELECT * FROM bloom_out").collect()}
        q.stop()
        model = bloom_filter_model(hist, "fp", M, K, SEED)
        expect = {(r.id, r.maybe_present)
                  for r in probe_with_model(probe, model, "id", "fp").collect()}
        assert got == expect
        assert all(p for i, p in got if i < 200)  # known half always flags
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_filter_frame_persists_and_merges_across_deliveries(spark, tmp_path):
    """The incremental-ingest lifecycle: persist delivery 1's filter as
    parquet, reload it cold, merge with delivery 2's filter, and probe —
    answers exactly like one filter built over both deliveries."""
    d1, d2 = _keys(spark, range(0, 150)), _keys(spark, range(150, 300))
    state = str(tmp_path / "bloom_state")
    bloom_build(d1, "fp", M, K, SEED).write.mode("overwrite").parquet(state)

    reloaded = spark.read.parquet(state)
    merged = bloom_merge([reloaded, bloom_build(d2, "fp", M, K, SEED)])
    direct = bloom_build(d1.unionByName(d2), "fp", M, K, SEED)
    assert {(r.word_idx, r.bits) for r in merged.collect()} == \
           {(r.word_idx, r.bits) for r in direct.collect()}

    probe = _keys(spark, range(0, 300))
    out = bloom_probe(merged, probe, "id", "fp", M, K, SEED).collect()
    assert all(r.maybe_present for r in out)  # both deliveries members


def test_model_probe_null_and_large_keys(spark):
    """Nulls probe False, and keys above 2^53 keep exact bit positions —
    a null in the same Arrow batch must not push the batch through
    float64 (regression: that rounding produced false negatives)."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from rust_triplets_spark.streaming.bloom import (
        bloom_filter_model,
        probe_with_model,
    )

    big = (1 << 60) + 1
    hist = spark.createDataFrame([Row(id=0, fp=big)], SCHEMA)
    model = bloom_filter_model(hist, "fp", M, K, SEED)
    probe = spark.createDataFrame(
        [Row(id=0, fp=big), Row(id=1, fp=None), Row(id=2, fp=(1 << 60))],
        SCHEMA,
    )
    out = {r.id: r.maybe_present
           for r in probe_with_model(probe, model, "id", "fp").collect()}
    assert out[0] is True    # exact member, even with a null in the batch
    assert out[1] is False   # null probes false
    assert out[2] is False   # 2^60 (what float rounding would produce) is NOT a member
