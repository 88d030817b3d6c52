"""Wave-5 operator tests: native sentence splitter parity with the Python
reference implementation, affine pager permutation bijection
(src/source/mod.rs:316-368 invariants), round-robin drain fairness
(src/ingestion.rs:583-604), sliding windows, simhash band candidates, and
bucketed ANN consistency with the brute-force baseline."""

from pyspark.sql import functions as F

from rust_triplets_spark.functions.text import (
    sentences_native_col,
    split_sentences_py,
)


SENT_CASES = [
    "First one. Second one! Third one?",
    "Pi is 3.14 exactly. Next sentence.",
    "Buy BRK.B shares now. They did.",
    "Well... maybe later. Done.",
    "Block one here.\n\nBlock two there. And more!",
    "   spaced   out.   trailing   ",
    "",
    "no terminator at all",
]


def test_native_sentences_match_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(SENT_CASES)], "i long, t string")
    got = {
        r["i"]: r["s"]
        for r in df.select("i", sentences_native_col("t").alias("s")).collect()
    }
    for i, t in enumerate(SENT_CASES):
        assert got[i] == split_sentences_py(t), f"case {i}: {t!r}"


def test_affine_permutation_is_bijection(spark):
    from rust_triplets_spark.plans.driver_queries import QUERIES

    out = QUERIES["affine_index_permutation"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    positions = sorted(r["position"] for r in rows)
    assert positions == list(range(len(rows)))  # a permutation, no gaps
    assert len({r["doc_id"] for r in rows}) == len(rows)
    # deterministically scrambled: identity order would mean no shuffle
    ids_in_pos_order = [r["doc_id"] for r in sorted(rows, key=lambda r: r["position"])]
    assert ids_in_pos_order != sorted(ids_in_pos_order)


def test_round_robin_cycles_sources(spark):
    from rust_triplets_spark.plans.driver_queries import QUERIES

    rows = (
        QUERIES["round_robin_interleave"](spark, "/root/testdata/sf0.001")
        .orderBy("position")
        .collect()
    )
    n_sources = len({r["source"] for r in rows})
    # every full first cycle visits each source exactly once
    first_cycle = [r["source"] for r in rows[:n_sources]]
    assert len(set(first_cycle)) == n_sources


def test_sliding_windows_cover_each_event_twice(spark):
    from rust_triplets_spark.plans.driver_queries import QUERIES

    out = QUERIES["sliding_window_counts"](spark, "/root/testdata/sf0.001")
    total_slots = out.agg(F.sum("n")).collect()[0][0]
    n_events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert total_slots == 2 * n_events  # window = 2 x slide


def test_simhash_band_pairs_have_low_hamming_tail(spark):
    from rust_triplets_spark.plans.driver_queries import QUERIES

    out = QUERIES["simhash_band_pairs"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows, "banding should yield candidates on the fixture"
    # sharing an 8-bit band bounds nothing per-pair, but candidates must be
    # closer on average than random 32-bit signatures (expected hamming 16)
    avg = sum(r["hamming"] for r in rows) / len(rows)
    assert avg < 16


def test_bucketed_ann_subset_of_bucket_and_agrees_with_brute_force(spark):
    from rust_triplets_spark.operators.similarity import (
        ann_bucketed_topk,
        cosine_topk,
        hyperplane_lsh_buckets,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    buckets = {
        r["id"]: r["bucket"]
        for r in hyperplane_lsh_buckets(emb, "vec_id", "embedding", n_planes=4).collect()
    }
    approx = ann_bucketed_topk(emb, "vec_id", "embedding", k=3, n_planes=4).collect()
    # neighbors come only from the query's own bucket
    for r in approx:
        assert buckets[r["qid"]] == buckets[r["nid"]]
    # and within a bucket the ranking equals the exact brute-force ranking
    n = emb.count()
    exact = cosine_topk(emb, "vec_id", "embedding", queries=emb, k=n).collect()
    exact_order = {}
    for r in sorted(exact, key=lambda r: (r["qid"], r["rank"])):
        exact_order.setdefault(r["qid"], []).append(r["nid"])
    for r in approx:
        in_bucket_exact = [
            nid for nid in exact_order[r["qid"]] if buckets[nid] == buckets[r["qid"]]
        ]
        assert in_bucket_exact[r["rank"] - 1] == r["nid"]
