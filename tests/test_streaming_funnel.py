"""Streaming ingest funnel: batch == stream parity across two deliveries,
stage counts included, plus per-gate behavior checks."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rust_triplets_spark.streaming.funnel import (
    fit_ingest_models,
    ingest_funnel,
    stream_ingest_funnel,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs away to "
    "the forest where it finds a quiet place to rest for a while today"
)


def _doc(i, text):
    return (i, text)


@pytest.fixture(scope="module")
def fixtures(spark):
    # history: already-ingested docs (also the DSIR background)
    history = spark.createDataFrame(
        [_doc(i, f"{GOOD} history variant number {i}") for i in range(20)],
        "doc_id long, text string",
    )
    # benchmark eval set: one distinctive doc
    evaldf = spark.createDataFrame(
        [_doc(900, "alpha beta gamma delta epsilon zeta eta theta iota "
                   "kappa lambda mu nu xi omicron pi rho sigma tau")],
        "doc_id long, text string",
    )
    # target domain: forest-themed docs
    target = spark.createDataFrame(
        [_doc(i, f"{GOOD} forest forest forest {i}") for i in range(10)],
        "doc_id long, text string",
    )
    # num_hashes=8: the 32-hash MinHash signature expression compiles a
    # generated class big enough to cost ~15 s per new plan; 8 hashes
    # exercise identical semantics at a fraction of the codegen cost
    models = fit_ingest_models(
        history, evaldf, target, "text",
        m_bits=1 << 14, min_avg_logratio=-10.0, num_hashes=8, bands=4,
    )
    # the incoming deliveries: a dup of history, a contaminated doc, a
    # low-quality doc, and fresh good docs
    d1 = [
        _doc(0, f"{GOOD} history variant number 0"),      # dup -> not new
        _doc(101, "alpha beta gamma delta epsilon zeta eta theta iota "
                  "kappa lambda mu nu xi omicron pi rho sigma tau"),  # contaminated
        _doc(102, "### ### ###"),                          # fails gopher
        _doc(103, f"{GOOD} delivery one fresh"),           # admitted
    ]
    d2 = [
        _doc(201, f"{GOOD} delivery two fresh"),           # admitted
        _doc(1, f"{GOOD} history variant number 1"),       # dup -> not new
    ]
    return models, d1, d2


def test_batch_gate_decisions(spark, fixtures):
    models, d1, _ = fixtures
    batch = spark.createDataFrame(d1, "doc_id long, text string")
    rows = {r["id"]: r for r in
            ingest_funnel(batch, models, "doc_id", "text").collect()}
    assert not rows[0]["is_new"]
    assert rows[101]["is_new"] and not rows[101]["decontam_ok"]
    assert not rows[102]["quality_ok"]
    assert rows[103]["admitted"]
    assert not rows[0]["admitted"] and not rows[101]["admitted"]
    assert not rows[102]["admitted"]


def test_stream_equals_batch_across_two_deliveries(spark, fixtures):
    models, d1, d2 = fixtures
    src = tempfile.mkdtemp(prefix="funnel_src_")
    ckpt = tempfile.mkdtemp(prefix="funnel_ckpt_")
    try:
        b1 = spark.createDataFrame(d1, "doc_id long, text string")
        b2 = spark.createDataFrame(d2, "doc_id long, text string")
        b1.write.mode("append").parquet(src)
        sdf = stream_ingest_funnel(
            spark, src, "doc_id long, text string", models,
            "doc_id", "text",
        )
        q = (
            sdf.writeStream.format("memory").queryName("funnel_out")
            .outputMode("append").option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        # delivery 2 lands mid-stream
        b2.write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql("SELECT * FROM funnel_out").collect()}
        q.stop()
        expect = {tuple(r) for r in
                  ingest_funnel(b1.unionByName(b2), models,
                                "doc_id", "text").collect()}
        assert got == expect
        # stage counts agree with the batch run
        def counts(rows):
            agg = [0] * 5
            for r in rows:
                for i, flag in enumerate(r[1:5]):
                    agg[i] += bool(flag)
                agg[4] += bool(r[6])
            return agg
        assert counts(got) == counts(expect)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_plan_is_stateless_and_shuffle_free(spark, fixtures):
    """The whole funnel must stay map-only: no Exchange, no state store,
    no join operator in the plan (the three models ride closures)."""
    models, d1, _ = fixtures
    batch = spark.createDataFrame(d1, "doc_id long, text string")
    plan = ingest_funnel(batch, models, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "Join", "StateStore", "Aggregate"):
        assert bad not in plan, f"{bad} in plan:\n{plan}"


def test_dup_of_admitted_doc_blocked_after_refit(spark, fixtures):
    """Lifecycle: after delivery 1's admitted docs merge into history and
    the Bloom model refits, a delivery-2 dup of a delivery-1 doc is no
    longer new."""
    models, d1, _ = fixtures
    batch = spark.createDataFrame(d1, "doc_id long, text string")
    admitted = ingest_funnel(batch, models, "doc_id", "text",
                             admitted_only=True)
    adm_ids = [r["id"] for r in admitted.select("id").collect()]
    assert adm_ids == [103]
    history2 = spark.createDataFrame(
        [_doc(i, f"{GOOD} history variant number {i}") for i in range(20)]
        + [_doc(103, f"{GOOD} delivery one fresh")],
        "doc_id long, text string",
    )
    evaldf = spark.createDataFrame(
        [_doc(900, "alpha beta gamma")], "doc_id long, text string",
    )
    target = history2.limit(5)
    models2 = fit_ingest_models(
        history2, evaldf, target, "text",
        m_bits=1 << 14, min_avg_logratio=-10.0, num_hashes=8, bands=4,
    )
    redelivery = spark.createDataFrame(
        [_doc(301, f"{GOOD} delivery one fresh")],  # same text, new id
        "doc_id long, text string",
    )
    out = ingest_funnel(redelivery, models2, "doc_id", "text").collect()
    assert len(out) == 1 and not out[0]["is_new"] and not out[0]["admitted"]
