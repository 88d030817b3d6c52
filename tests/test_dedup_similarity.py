"""Dedup + similarity operator semantics (driver north-star scope)."""

from pyspark.sql import functions as F

from rust_triplets_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from rust_triplets_spark.operators.similarity import cosine_topk


def test_exact_dedup_groups_whitespace_variants(spark):
    df = spark.createDataFrame(
        [(1, "hello  world"), (2, "hello world"), (3, " hello world "), (4, "other text")],
        "id long, text string",
    )
    out = {r["rep_id"]: r["n_dups"] for r in exact_dedup(df, "id", "text").collect()}
    assert out == {1: 3, 4: 1}


def test_minhash_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different content about spark engines and distributed joins"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "id long, text string"
    )
    pairs = {(r["a"], r["b"]) for r in minhash_lsh_pairs(df, "id", "text").collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_similar_docs_close(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base), (2, base + " lambda"), (3, "x y z entirely other words here")],
        "id long, text string",
    )
    sigs = {r["id"]: r["simhash"] for r in simhash(df, "id", "text").collect()}
    ham12 = bin(sigs[1] ^ sigs[2]).count("1")
    ham13 = bin(sigs[1] ^ sigs[3]).count("1")
    assert ham12 < ham13


def test_ngram_jaccard_exact_values(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x")], "id long, text string"
    )
    out = ngram_jaccard_pairs(df, "id", "text", threshold=0.0).collect()
    assert len(out) == 1
    r = out[0]
    # shingles(1) = {abc, bcd, cde}; shingles(2) = {abc, bcd, cdx}; inter=2 uni=4
    assert (r["a"], r["b"], r["inter"], r["uni"]) == (1, 2, 2, 4)
    assert abs(r["jaccard"] - 0.5) < 1e-12


def test_cosine_topk_orders_by_similarity(spark):
    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    qs = df.where(F.col("vec_id") == 1)
    out = cosine_topk(df, "vec_id", "embedding", queries=qs, k=3).orderBy("rank").collect()
    assert [r["nid"] for r in out] == [2, 3, 4]
    assert out[0]["cos_sim"] > 0.99
    assert out[2]["cos_sim"] < -0.99


def test_ann_bucketed_topk_recall_on_clustered_data(spark):
    """LSH-bucketed ANN recovers exact top-1 neighbors on clustered data
    (tight clusters land in one bucket). The driver's random embeddings are
    the LSH worst case — no structure ⇒ no recall — so the recall check
    uses synthetic clusters; the bucket mechanics are oracle-checked by the
    ann_lsh_buckets query."""
    import math
    import random

    from rust_triplets_spark.operators.similarity import ann_bucketed_topk

    rng = random.Random(7)
    rows = []
    vid = 0
    for c in range(12):
        center = [rng.gauss(0, 1) for _ in range(16)]
        norm = math.sqrt(sum(x * x for x in center))
        center = [x / norm for x in center]
        for _ in range(10):
            rows.append((vid, [x + rng.gauss(0, 0.02) for x in center]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r["qid"], r["nid"])
        for r in cosine_topk(df, "vec_id", "embedding", queries=df, k=1).collect()
    }
    approx = {
        (r["qid"], r["nid"])
        for r in ann_bucketed_topk(df, "vec_id", "embedding", k=1, n_planes=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall > 0.8, recall


def test_ivf_ann_full_probe_matches_brute_force(spark):
    """With nprobe == n_centroids every cell is searched: the IVF ranking
    must equal the exact brute-force neighbor order per query."""
    from rust_triplets_spark.operators.similarity import ann_ivf_topk, cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ivf = ann_ivf_topk(emb, "vec_id", "embedding", k=3, n_centroids=4, nprobe=4)
    exact = cosine_topk(emb, "vec_id", "embedding", queries=emb, k=3)
    got = {(r["qid"], r["rank"]): r["nid"] for r in ivf.collect()}
    want = {(r["qid"], r["rank"]): r["nid"] for r in exact.collect()}
    assert got == want


def test_ivf_ann_neighbors_come_from_probed_cells(spark):
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from rust_triplets_spark.operators.similarity import ann_ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    train = emb.select(
        F.col("vec_id").cast("long").alias("id"),
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    model = KMeans(k=4, seed=7000, maxIter=10).fit(train)
    cells = {r["id"]: r["prediction"] for r in model.transform(train).collect()}

    out = ann_ivf_topk(emb, "vec_id", "embedding", k=3, n_centroids=4, nprobe=1).collect()
    assert out, "ivf should return neighbors"
    # nprobe=1: every neighbor must live in the query's own nearest cell,
    # which for a corpus vector is its assigned cell
    for r in out:
        assert cells[r["nid"]] == cells[r["qid"]]


def test_cosine_topk_requires_explicit_queries(spark):
    import pytest

    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="explicit"):
        cosine_topk(df, "vec_id", "embedding", queries=None)


def test_exact_dedup_shuffle_key_is_fingerprint_not_text(spark):
    """The dedup exchange must hash-partition on the (hash31, length)
    fingerprint — never on the normalized document string (at 100 TB a
    string shuffle key IS the job cost)."""
    import re

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = exact_dedup(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    keys = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert keys, "expected a shuffle exchange in the dedup plan"
    for k in keys:
        assert "__norm" not in k and "text" not in k, k
        assert "__h#" in k and "__len#" in k, k


def test_ivf_seeded_full_probe_matches_brute_force(spark):
    from rust_triplets_spark.operators.similarity import ivf_seeded_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ivf = ivf_seeded_topk(emb, "vec_id", "embedding", k=3, n_centroids=4, nprobe=4)
    exact = cosine_topk(emb, "vec_id", "embedding", queries=emb, k=3)
    got = {(r["qid"], r["rank"]): r["nid"] for r in ivf.collect()}
    want = {(r["qid"], r["rank"]): r["nid"] for r in exact.collect()}
    assert got == want


def test_ivf_seeded_matches_duckdb_twin(spark):
    """Hash-exactness of the seeded-quantizer IVF: same rows, same ranks,
    same cosine bits as the DuckDB twin (the driver's correctness gate)."""
    import duckdb

    from rust_triplets_spark.operators.similarity import ivf_seeded_topk, ivf_seeded_topk_sql

    path = "/root/testdata/sf0.001/embeddings.parquet"
    emb = spark.read.parquet(path)
    got = {
        (r["qid"], r["rank"]): (r["nid"], r["cos_sim"])
        for r in ivf_seeded_topk(emb, "vec_id", "embedding", k=3, n_centroids=4, nprobe=2).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')")
    want = {
        (qid, rank): (nid, cos)
        for qid, rank, nid, cos in con.execute(
            ivf_seeded_topk_sql("embeddings", "vec_id", "embedding", k=3, n_centroids=4, nprobe=2)
        ).fetchall()
    }
    assert got == want


def test_ivf_kmeans_sample_fit_still_searches_whole_corpus(spark):
    """With the coarse quantizer fit on a hash sample (fit_sample_target
    below corpus size), every corpus vector is still assigned and
    searchable: each query returns a full top-k and repeated runs on the
    same input agree (the hash sample is id-stable — df.sample would not
    be)."""
    from collections import Counter

    from rust_triplets_spark.operators.similarity import ann_ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    a = ann_ivf_topk(emb, "vec_id", "embedding", k=3, n_centroids=4, nprobe=4,
                     fit_sample_target=100).collect()
    per_q = Counter(r["qid"] for r in a)
    assert len(per_q) == n  # every vector queries
    assert all(v == 3 for v in per_q.values())  # full top-k from probed cells
    b = ann_ivf_topk(emb, "vec_id", "embedding", k=3, n_centroids=4, nprobe=4,
                     fit_sample_target=100).collect()
    assert {(r["qid"], r["rank"], r["nid"]) for r in a} == {
        (r["qid"], r["rank"], r["nid"]) for r in b
    }


def test_neardup_clusters_components_and_singletons(spark):
    """Chained pairs must collapse into one cluster under the min-id rep
    (transitive closure, not just direct pairs), singletons stay alone."""
    from rust_triplets_spark.operators.dedup import neardup_clusters

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "a long, b long"  # chain 1-2-3; pair 5-6
    )
    out = {r["id"]: (r["rep"], r["cluster_size"])
           for r in neardup_clusters(docs, "id", "text", pairs=pairs).collect()}
    assert out[1] == (1, 3) and out[2] == (1, 3) and out[3] == (1, 3)
    assert out[5] == (5, 2) and out[6] == (5, 2)
    for s in (0, 4, 7):
        assert out[s] == (s, 1)


def test_neardup_clusters_long_chain_converges(spark):
    """Pointer jumping must collapse a long chain well inside max_iter
    (O(log diameter)): a 40-link chain with max_iter=8 ≥ log2(40)."""
    from rust_triplets_spark.operators.dedup import neardup_clusters

    n = 41
    docs = spark.createDataFrame([(i, "t") for i in range(n)], "id long, text string")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "a long, b long")
    out = neardup_clusters(docs, "id", "text", pairs=pairs, max_iter=8).collect()
    assert all(r["rep"] == 0 and r["cluster_size"] == n for r in out)


class TestIncrementalMinhashIndex:
    def test_refresh_equals_full_rebuild(self, spark):
        from rust_triplets_spark.operators.dedup import (
            minhash_signature_index,
            refresh_minhash_signature_index,
        )

        def corpus(version):
            rows = []
            for i in range(30):
                src = f"s{i % 3}"
                text = " ".join(f"tok{(i * 7 + j) % 13}" for j in range(12))
                if src == "s1" and version == 2:
                    text = text + " refreshed extra tokens here"
                rows.append((i, src, text))
            return spark.createDataFrame(rows, "id: long, source: string, text: string")

        v1, v2 = corpus(1), corpus(2)
        idx_v1 = minhash_signature_index(v1, "id", "source", "text", num_hashes=8)
        refreshed = refresh_minhash_signature_index(
            idx_v1, v2, ["s1"], "id", "source", "text", num_hashes=8
        )
        full_v2 = minhash_signature_index(v2, "id", "source", "text", num_hashes=8)
        a = sorted(map(tuple, refreshed.collect()))
        b = sorted(map(tuple, full_v2.collect()))
        assert a == b  # incremental == full rebuild
        # untouched sources' rows are literally v1's
        keep = sorted(map(tuple, idx_v1.where("source <> 's1'").collect()))
        kept = sorted(map(tuple, refreshed.where("source <> 's1'").collect()))
        assert keep == kept

    def test_empty_refresh_is_identity(self, spark):
        from rust_triplets_spark.operators.dedup import (
            minhash_signature_index,
            refresh_minhash_signature_index,
        )

        df = spark.createDataFrame(
            [(1, "a", "x y z w v u t s")], "id: long, source: string, text: string"
        )
        idx = minhash_signature_index(df, "id", "source", "text", num_hashes=4)
        assert refresh_minhash_signature_index(
            idx, df, [], "id", "source", "text", num_hashes=4
        ) is idx

    def test_index_matches_signatures(self, spark):
        from rust_triplets_spark.operators.dedup import (
            minhash_signature_index,
            minhash_signatures,
        )

        df = spark.createDataFrame(
            [(i, f"s{i%2}", " ".join(f"w{(i+j)%9}" for j in range(10))) for i in range(12)],
            "id: long, source: string, text: string",
        )
        idx = {r.id: tuple(r)[2:] for r in minhash_signature_index(
            df, "id", "source", "text", num_hashes=8).collect()}
        sig = {r.id: tuple(r)[1:] for r in minhash_signatures(
            df, "id", "text", num_hashes=8).collect()}
        assert idx == sig  # same values, just source-partitioned

    def test_null_source_rows_survive_refresh(self, spark):
        from rust_triplets_spark.operators.dedup import (
            minhash_signature_index,
            refresh_minhash_signature_index,
        )

        df = spark.createDataFrame(
            [(1, None, "a b c d e f"), (2, "s0", "g h i j k l"),
             (3, "s1", "m n o p q r")],
            "id: long, source: string, text: string",
        )
        idx = minhash_signature_index(df, "id", "source", "text", num_hashes=4)
        out = refresh_minhash_signature_index(
            idx, df, ["s1"], "id", "source", "text", num_hashes=4
        )
        # NOT isin(...) is NULL (not true) for a NULL key — the keep
        # filter must pass NULL-source rows through explicitly
        assert out.where("source IS NULL").count() == 1
        full = minhash_signature_index(df, "id", "source", "text", num_hashes=4)
        key = lambda r: (r[0] or "", *r[1:])  # noqa: E731 — None sorts as ""
        assert sorted(map(tuple, out.collect()), key=key) == sorted(
            map(tuple, full.collect()), key=key
        )


class TestRepeatedSpans:
    def test_coverage_interval_union(self, spark):
        from rust_triplets_spark.operators.dedup import repeated_ngram_spans

        # the shared phrase "a b c d" (n=3 grams: abc, bcd) appears in 3
        # docs; doc 1 embeds it once -> covered = union of [0,3) and [1,4)
        # = 4 tokens, not 6
        shared = "a b c d"
        rows = [(1, shared + " x y z"), (2, "p q " + shared), (3, shared)]
        df = spark.createDataFrame(rows, "id: long, text: string")
        out = {r.id: r for r in repeated_ngram_spans(
            df, "id", "text", n=3, min_docs=3).collect()}
        assert out[1].n_repeated == 2
        assert out[1].covered_tokens == 4  # overlap counted once
        assert out[3].covered_tokens == 4 and abs(out[3].covered_frac - 1.0) < 1e-12

    def test_no_repeats_zero_coverage(self, spark):
        from rust_triplets_spark.operators.dedup import repeated_ngram_spans

        rows = [(i, f"unique{i} tokens{i} here{i} now{i}") for i in range(4)]
        df = spark.createDataFrame(rows, "id: long, text: string")
        out = repeated_ngram_spans(df, "id", "text", n=2, min_docs=2).collect()
        assert all(r.covered_tokens == 0 and r.covered_frac == 0.0 for r in out)

    def test_validation(self, spark):
        import pytest as _pytest
        from rust_triplets_spark.operators.dedup import repeated_ngram_spans

        df = spark.createDataFrame([(1, "x")], "id: long, text: string")
        with _pytest.raises(ValueError):
            repeated_ngram_spans(df, "id", "text", n=0)
        with _pytest.raises(ValueError):
            repeated_ngram_spans(df, "id", "text", min_docs=1)


def test_semdedup_min_id_survivor_policy(spark):
    """Two tight groups of near-identical vectors + one outlier: within
    each same-cell group only the smallest id survives; the outlier and
    sub-threshold members keep."""
    from rust_triplets_spark.operators.similarity import semdedup_keep

    # IDENTICAL vectors are guaranteed to share a cell (identical d2 to
    # every centroid + same tie-break) regardless of which seeded ids win
    # the centroid pick — near-identical vectors could straddle a cell
    # boundary, which is the documented recall trade-off, not a bug.
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),      # duplicate of id 1
        (3, [1.0, 0.0, 0.0]),      # duplicate of ids 1,2
        (10, [0.0, 1.0, 0.0]),
        (11, [0.0, 1.0, 0.0]),     # duplicate of id 10
        (20, [0.0, 0.0, 1.0]),     # outlier, no neighbor
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["id"]: r["keep"] for r in
           semdedup_keep(df, "vec_id", "embedding", threshold=0.95,
                         n_centroids=2).collect()}
    assert len(out) == 6  # every document gets a row
    assert out[1] is True          # min id of its group
    assert out[2] is False and out[3] is False
    assert out[10] is True and out[11] is False
    assert out[20] is True         # no neighbor above threshold


def test_semdedup_threshold_one_keeps_everything(spark):
    from rust_triplets_spark.operators.similarity import semdedup_keep

    rows = [(i, [float(i), 1.0]) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup_keep(df, "vec_id", "embedding", threshold=1.01, n_centroids=3)
    assert all(r["keep"] for r in out.collect())


def test_minhash_dedup_keep_marks_cluster_reps(spark):
    from rust_triplets_spark.operators.dedup import minhash_dedup_keep

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different content about spark engines and distributed joins"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "id long, text string"
    )
    out = {r["id"]: (r["rep"], r["keep"], r["cluster_size"])
           for r in minhash_dedup_keep(df, "id", "text").collect()}
    assert out[1] == (1, True, 2)
    assert out[2] == (1, False, 2)
    assert out[3] == (3, True, 1)


def test_auto_cells_arithmetic_and_floor():
    from rust_triplets_spark.operators.similarity import auto_cells, recommended_planes

    assert auto_cells(500, 1000, floor=8) == 8       # floor wins
    assert auto_cells(20_000, 1000, floor=8) == 20
    assert auto_cells(20_001, 1000, floor=8) == 21   # exact ceil boundary
    assert auto_cells(10**9, 1000, floor=16) == 10**6
    assert recommended_planes(2_000, 1000) == 4      # floor
    assert recommended_planes(20_000, 1000) == 5     # ceil(log2(20))
    assert recommended_planes(10**9, 1000) == 20


def test_semdedup_auto_cells_equals_explicit_at_floor(spark):
    """At corpora below target_cell_rows x floor, auto mode must produce
    the exact frame the old fixed default produced (driver continuity)."""
    from rust_triplets_spark.operators.similarity import semdedup_keep

    rows = [(i, [float((i * 7) % 13), float((i * 5) % 11), 1.0]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    fixed = semdedup_keep(df, "vec_id", "embedding", threshold=0.8, n_centroids=8)
    auto = semdedup_keep(df, "vec_id", "embedding", threshold=0.8, n_centroids=None)
    key = lambda r: r["id"]
    assert sorted(fixed.collect(), key=key) == sorted(auto.collect(), key=key)


def test_simhash_stop_band_guard(spark):
    """max_bucket pulls over-populated (band, value) buckets out of the
    self-join (the quadratic heavy-hitter guard) and replaces their pairs
    with a min-id representative chain, so the heaviest duplicate families
    stay CONNECTED (bucket-1 pairs, not bucket² and not zero); None
    disables the guard."""
    from rust_triplets_spark.operators.dedup import simhash_band_pairs

    # identical docs: every band bucket holds all 3 ids
    df = spark.createDataFrame(
        [(i, "same words every time here") for i in range(1, 4)],
        "id long, text string",
    )
    unguarded = simhash_band_pairs(df, "id", "text", max_bucket=None).collect()
    assert {(r["a"], r["b"]) for r in unguarded} == {(1, 2), (1, 3), (2, 3)}
    # all buckets oversized -> representative chain only: every doc pairs
    # with the bucket min-id (1), NOT the full clique — and crucially not []
    # (zero pairs would let the mega-cluster escape dedup entirely)
    guarded = simhash_band_pairs(df, "id", "text", max_bucket=2).collect()
    assert {(r["a"], r["b"]) for r in guarded} == {(1, 2), (1, 3)}
    assert all(r["hamming"] == 0 for r in guarded)  # identical docs
    # bucket-size boundary: max_bucket == occupancy keeps the bucket
    boundary = simhash_band_pairs(df, "id", "text", max_bucket=3).collect()
    assert {(r["a"], r["b"]) for r in boundary} == {(1, 2), (1, 3), (2, 3)}


def test_simhash_stop_band_chain_connects_mega_cluster(spark):
    """Downstream connected-components over the guarded pairs must recover
    the FULL duplicate family through the hub (the r5 guard dropped the
    bucket outright: a family saturating every band produced zero pairs
    and escaped dedup — ADVICE r5)."""
    from rust_triplets_spark.operators.dedup import simhash_band_pairs

    rows = [(i, "boilerplate header repeated verbatim") for i in range(1, 8)]
    rows += [(100, "a completely different and unique document body")]
    df = spark.createDataFrame(rows, "id long, text string")
    pairs = simhash_band_pairs(df, "id", "text", max_bucket=3).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    # the 7-doc family is linear in size: hub (min id 1) chained to all
    assert got == {(1, i) for i in range(2, 8)}


def test_ivf_kernel_parity_pandas_vs_expr(spark):
    """The Arrow/numpy deploy kernel and the pure-expression float kernel
    must produce the same neighbor ranking (they differ only in float
    summation order — pairwise vs sequential fold)."""
    import pytest

    from rust_triplets_spark.operators.similarity import ann_ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = ann_ivf_topk(emb, "vec_id", "embedding", k=3, n_centroids=4,
                     nprobe=2, kernel="pandas").collect()
    b = ann_ivf_topk(emb, "vec_id", "embedding", k=3, n_centroids=4,
                     nprobe=2, kernel="expr").collect()
    assert {(r["qid"], r["rank"], r["nid"]) for r in a} == {
        (r["qid"], r["rank"], r["nid"]) for r in b
    }
    with pytest.raises(ValueError):
        ann_ivf_topk(emb, "vec_id", "embedding", kernel="numba")


def test_ivf_recall_floor_on_clustered_data(spark):
    """Deploy-configuration recall floor: MLlib-trained quantizer with
    auto-sized cells and nprobe=2 must recover >= 0.9 of exact top-1
    neighbors on clustered data (the IVF operating regime — real embedding
    corpora are clustered; uniform-random vectors are the degenerate case
    where any cell-probing index decays to random). VERDICT r5: this
    converts the production path's claimed quality from prose to a pinned
    floor."""
    import math
    import random

    from rust_triplets_spark.operators.similarity import ann_ivf_topk

    rng = random.Random(11)
    rows = []
    vid = 0
    for c in range(12):
        center = [rng.gauss(0, 1) for _ in range(16)]
        norm = math.sqrt(sum(x * x for x in center))
        center = [x / norm for x in center]
        for _ in range(10):
            rows.append((vid, [x + rng.gauss(0, 0.02) for x in center]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r["qid"], r["nid"])
        for r in cosine_topk(df, "vec_id", "embedding", queries=df, k=1).collect()
    }
    approx = {
        (r["qid"], r["nid"])
        for r in ann_ivf_topk(df, "vec_id", "embedding", k=1,
                              n_centroids=12, nprobe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_lsh_plane_sizing_guard(spark):
    """Fixed-plane-count loophole (VERDICT r5/r6): ann_bucketed_topk /
    embedding_neardup_pairs must warn when 2^n_planes × TARGET_CELL_ROWS <
    rows (citing recommended_planes), raise under strict_planes=True, and
    stay silent when the plane count is adequate."""
    import warnings

    import pytest

    from rust_triplets_spark.operators.similarity import (
        TARGET_CELL_ROWS,
        ann_bucketed_topk,
        embedding_neardup_pairs,
        recommended_planes,
    )

    # 2500 rows, 2-dim vectors: n_planes=1 gives 2 buckets × 1000 target
    # < 2500 rows (guard trips); n_planes=8 gives 256 buckets (silent)
    emb = spark.range(2500).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(7).cast("float"), F.rand(8).cast("float")).alias("embedding"),
    )
    assert (1 << 1) * TARGET_CELL_ROWS < 2500

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        ann_bucketed_topk(emb, "vec_id", "embedding", n_planes=8)
        embedding_neardup_pairs(emb, "vec_id", "embedding", n_planes=8)

    with pytest.warns(RuntimeWarning, match="recommended_planes"):
        ann_bucketed_topk(emb, "vec_id", "embedding", n_planes=1)
    with pytest.raises(ValueError, match="recommended_planes"):
        embedding_neardup_pairs(
            emb, "vec_id", "embedding", n_planes=1, strict_planes=True
        )
    assert recommended_planes(100_000) >= 7  # ceil(log2(100)) = 7


def test_float_cosine_kernel_rejects_malformed_vectors(spark):
    """ADVICE r6 (similarity.py:53): the Arrow/numpy kernel must fail
    LOUDLY (naming the cause) on null or ragged embeddings instead of an
    opaque np.stack shape error / silent object-array divergence from the
    expression kernel."""
    import pytest

    from rust_triplets_spark.operators.similarity import _cosine_batch_udf

    good = spark.createDataFrame(
        [(1, [1.0, 0.0], [0.5, 0.5])], "id long, q array<double>, n array<double>"
    )
    assert good.select(_cosine_batch_udf(F.col("q"), F.col("n"))).first()[0] > 0

    nulled = spark.createDataFrame(
        [(1, [1.0, 0.0], None)], "id long, q array<double>, n array<double>"
    )
    with pytest.raises(Exception, match="non-null"):
        nulled.select(_cosine_batch_udf(F.col("q"), F.col("n"))).collect()

    ragged = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0]), (2, [1.0], [1.0, 0.0])],
        "id long, q array<double>, n array<double>",
    ).coalesce(1)  # both rows must share one Arrow batch to be ragged
    with pytest.raises(Exception, match="ragged|dimension"):
        ragged.select(_cosine_batch_udf(F.col("q"), F.col("n"))).collect()


def test_simhash_dedup_keep_families_and_singletons(spark):
    """Planted family: 3 near-identical docs (one token appended) cluster
    under hamming<=3 with the min id as the sole survivor; the distinct
    doc stays a kept singleton."""
    from rust_triplets_spark.operators.dedup import simhash_dedup_keep

    base = " ".join(f"w{i}" for i in range(40))
    rows = [(10, base), (11, base + " extra"), (12, base + " other"),
            (99, " ".join(f"zz{i} qq{i}" for i in range(30)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in simhash_dedup_keep(
        df, "doc_id", "text", max_bucket=None
    ).collect()}
    assert out[10]["keep"] and out[10]["rep"] == 10
    assert not out[11]["keep"] and out[11]["rep"] == 10
    assert not out[12]["keep"] and out[12]["rep"] == 10
    assert out[99]["keep"] and out[99]["cluster_size"] == 1


def test_ivf_trained_cell_profile_fixture(spark):
    """The persisted-quantizer cell profile (the oracle-checkable
    projection of the float-IVF deploy path) agrees with a live MLlib
    model.transform on the corpus the fixture was trained on: same
    params/seed retrain reproduces the centroids, and the quantized
    integer argmin matches the float assignment except at (measure-zero)
    quantization boundaries."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from rust_triplets_spark.operators.similarity import (
        ivf_trained_cell_profile,
        load_ivf_centroid_fixture,
    )

    fx = load_ivf_centroid_fixture()
    assert fx["trained_on"].endswith("sf0.01")
    emb = spark.read.parquet(fx["trained_on"] + "/embeddings.parquet")
    prof = ivf_trained_cell_profile(
        emb, "vec_id", "embedding", fx["centroids"], nprobe=2
    )
    rows = {r["vec_id"]: r for r in prof.collect()}
    assert len(rows) == fx["rows"]
    k = fx["n_centroids"]
    for r in rows.values():
        assert 1 <= r["cell"] <= k
        assert 1 <= r["probe2_cell"] <= k and r["probe2_cell"] != r["cell"]
        assert r["d2_cell"] >= 0
        assert r["n_candidates"] >= 0
    # occupancy conservation: candidate counts are consistent with the
    # cell sizes implied by the assignment itself
    from collections import Counter

    sizes = Counter(r["cell"] for r in rows.values())
    for r in rows.values():
        assert r["n_candidates"] == sizes[r["cell"]] + sizes[r["probe2_cell"]] - 1

    # live retrain with the fixture's recorded params reproduces the
    # assignment: fixture centroids are the quantized image of this model
    train = emb.select(
        F.col("vec_id").cast("long").alias("id"),
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    model = KMeans(k=k, seed=fx["seed"], maxIter=fx["max_iter"]).fit(train)
    pred = {
        r["id"]: r["prediction"]
        for r in model.transform(train).select("id", "prediction").collect()
    }
    # MLlib cell ids are 0-based and unordered vs the fixture's 1-based
    # list order — compare via the partition they induce, allowing a tiny
    # disagreement band for quantization-boundary ties
    agree = 0
    label_map: dict[int, int] = {}
    for vid, r in rows.items():
        m = pred[vid]
        if m not in label_map:
            label_map[m] = r["cell"]
        if label_map[m] == r["cell"]:
            agree += 1
    assert agree / len(rows) >= 0.99


def test_sq8_codes_round_trip_error_bound(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from rust_triplets_spark.operators.similarity import (
        SQ8_ERR_SCALE,
        embedding_int8_codes,
    )

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    # dim 0 spans [-1, 1]; dim 1 is constant (degenerate); dim 2 spans [0, 10]
    rows = [Row(vec_id=i, embedding=[(-1.0 + 2.0 * i / 9), 3.5, i * 10.0 / 9])
            for i in range(10)]
    out = embedding_int8_codes(
        spark.createDataFrame(rows, schema), "vec_id", "embedding"
    ).collect()
    assert len(out) == 30
    by = {(r.id, r.d): r for r in out}
    for (i, d), r in by.items():
        assert 0 <= r.code <= 255
    # endpoints hit the code range exactly
    assert by[(0, 0)].code == 0 and by[(9, 0)].code == 255
    assert by[(0, 2)].code == 0 and by[(9, 2)].code == 255
    # degenerate dim: code 0, zero error
    assert all(by[(i, 1)].code == 0 and by[(i, 1)].err_q == 0 for i in range(10))
    # reconstruction error <= half a quantization step (+1 grid ulp)
    for (i, d), r in by.items():
        span = 2.0 if d == 0 else (10.0 if d == 2 else 0.0)
        bound = span / 510.0
        assert r.err_q <= int(bound * SQ8_ERR_SCALE) + 1, (i, d, r.err_q)


def test_ann_hard_negatives_exclude_same_label(spark):
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from rust_triplets_spark.operators.similarity import ivf_seeded_topk

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ])
    # two tight clusters; labels interleave WITHIN each cluster so the
    # nearest same-label and different-label vectors are both close
    rows = []
    for i in range(24):
        c = i % 2  # cluster
        base = [1.0, 0.0] if c == 0 else [0.0, 1.0]
        vec = [base[0] + i * 1e-3, base[1] + (23 - i) * 1e-3, 0.5]
        rows.append(Row(vec_id=i, embedding=vec, label=i % 4))
    df = spark.createDataFrame(rows, schema)
    out = ivf_seeded_topk(
        df, "vec_id", "embedding", k=3, n_centroids=4, nprobe=4,
        label_col="label", exclude_same_label=True,
    ).collect()
    labels = {i: i % 4 for i in range(24)}
    assert out, "must find negatives"
    for r in out:
        assert r.neg_label != labels[r.qid], (r.qid, r.nid)
        assert labels[r.nid] == r.neg_label
    # with label filtering OFF the same call returns plain neighbors
    # (contract: default path unchanged, no neg_label column)
    plain = ivf_seeded_topk(df, "vec_id", "embedding", k=3,
                            n_centroids=4, nprobe=4)
    assert "neg_label" not in plain.columns


def test_ivf_trained_profile_single_centroid_parity(spark):
    """With ONE centroid there is no second probe: Spark yields
    probe2_cell NULL for every row and the DuckDB twin must keep the rows
    too (regression: its cr=2 join was INNER and returned zero rows)."""
    import duckdb
    import pandas as pd
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from rust_triplets_spark.operators.similarity import (
        ivf_trained_cell_profile,
        ivf_trained_cell_profile_sql,
    )

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    rows = [(i, [float(i), 1.0]) for i in range(6)]
    df = spark.createDataFrame([Row(vec_id=i, embedding=v) for i, v in rows], schema)
    centroids = [[0, 1048576]]  # one quantized centroid
    got = ivf_trained_cell_profile(df, "vec_id", "embedding", centroids).toPandas()
    con = duckdb.connect()
    con.register("emb_pd", pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    con.execute("CREATE VIEW embeddings AS SELECT * FROM emb_pd")
    want = con.sql(
        ivf_trained_cell_profile_sql("embeddings", "vec_id", "embedding", centroids)
    ).df()
    assert len(got) == 6 and len(want) == 6
    assert got.probe2_cell.isna().all() and want.probe2_cell.isna().all()
    g = got.sort_values("vec_id").reset_index(drop=True)
    w = want.sort_values("vec_id").reset_index(drop=True)
    for c in sorted(got.columns):
        assert (g[c].astype(str) == w[c].astype(str)).all(), c


def test_ngram_containment_sizes_use_filtered_universe(spark):
    """A short doc quoted whole inside a long one must score
    containment_a = 1.0 even when some of its shingles are corpus-common
    stop-shingles: |A| is computed over the max_df-FILTERED shingle set,
    matching the filtered intersection (r10 fix — sizing from the
    unfiltered set biased containment toward 0 for exactly this class).
    The DuckDB twin agrees row-for-row."""
    import duckdb

    from rust_triplets_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_containment_pairs_sql,
    )

    rows = [
        (1, "a b c d e"),            # A: shingles {abc, bcd, cde}
        (2, "a b c d e f g h"),      # B quotes A whole
        (3, "a b c zz yy xx"),       # C..E make 'a b c' a stop-shingle
        (4, "a b c qq rr ss"),
        (5, "a b c tt uu vv"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r["a"], r["b"]): (r["inter"], r["containment_a"], r["containment_b"])
        for r in ngram_containment_pairs(
            df, "id", "text", threshold=0.9, max_df=3
        ).collect()
    }
    # 'a b c' appears in 5 docs > max_df=3 and is filtered; A's surviving
    # shingles {bcd, cde} are both in B → containment_a = 2/2 = 1.0
    assert (1, 2) in got
    inter, ca, cb = got[(1, 2)]
    assert inter == 2 and abs(ca - 1.0) < 1e-12
    # B's shingles: abc (df=5, dropped), bcd, cde, def, efg, fgh → 5 kept
    assert abs(cb - 2.0 / 5.0) < 1e-12
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    oracle = {
        (a, b): (i, ca_, cb_)
        for a, b, i, ca_, cb_ in con.execute(
            ngram_containment_pairs_sql("t", "t.id", "t.text", threshold=0.9, max_df=3)
        ).fetchall()
    }
    assert set(oracle) == set(got)
    for k in got:
        assert got[k][0] == oracle[k][0]
        assert abs(got[k][1] - oracle[k][1]) < 1e-12
        assert abs(got[k][2] - oracle[k][2]) < 1e-12


def test_random_projection_preserves_distances_and_is_exact(spark):
    """JL sketch: (a) the Spark frame equals a numpy recomputation of the
    same integer math bit-for-bit; (b) linearity holds exactly; (c) the
    JL property — cosine over the 16-dim sketch tracks cosine over the
    64-dim original (rank correlation over seeded random pairs)."""
    import numpy as np

    from rust_triplets_spark.operators.similarity import (
        QUANT,
        _rp_signs,
        random_projection,
    )

    rng = np.random.default_rng(13)
    n, d, k = 60, 64, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["id"]: [r[f"proj_{j}"] for j in range(k)]
        for r in random_projection(df, "vec_id", "embedding", d, k).collect()
    }
    signs = np.array(_rp_signs(d, k, 4_100_009), dtype=np.int64)
    # round-half-to-even matches Spark/DuckDB round() on doubles? No —
    # both engines round() HALF UP on doubles; emulate exactly
    q = np.floor(vecs.astype(np.float64) * QUANT + 0.5).astype(np.int64)
    q = np.where(
        vecs.astype(np.float64) * QUANT < 0,
        -np.floor(-vecs.astype(np.float64) * QUANT + 0.5).astype(np.int64),
        q,
    )
    expect = q @ signs
    for i in range(n):
        assert got[i] == list(expect[i]), i
    # linearity: proj(a) + proj(b) == proj computed from q_a + q_b
    ab = (q[0] + q[1]) @ signs
    assert list(ab) == [a + b for a, b in zip(expect[0], expect[1])]
    # JL preservation on STRUCTURED data (random unit vectors in 64-dim
    # are pairwise near-orthogonal — nothing to preserve): members of a
    # tight cluster must stay closer under the sketch than cross-cluster
    # pairs, with a clear margin
    cvecs = []
    for c in range(6):
        center = rng.normal(size=d)
        center /= np.linalg.norm(center)
        for _ in range(8):
            v = center + rng.normal(size=d) * 0.05
            cvecs.append(v / np.linalg.norm(v))
    cvecs = np.array(cvecs)
    qc = np.floor(np.abs(cvecs) * QUANT + 0.5).astype(np.int64) * np.sign(
        cvecs
    ).astype(np.int64)
    pc = qc @ signs
    pc = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    sk = pc @ pc.T
    labels = np.repeat(np.arange(6), 8)
    same = labels[:, None] == labels[None, :]
    iu = np.triu_indices(len(cvecs), 1)
    within = sk[iu][same[iu]]
    across = sk[iu][~same[iu]]
    assert within.mean() > across.mean() + 0.5, (within.mean(), across.mean())
    assert within.min() > across.max() - 0.2
