"""Round-7 additions: bigram-LM quality scoring (operators/lm_quality.py)
and IVF-PQ asymmetric-distance ANN (operators/similarity.py)."""

import math
import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------


def _lm_reference(texts: dict[int, str], alpha: float = 0.5):
    """Independent pure-python bigram LM (string tokens, no hashing) —
    the SEMANTIC oracle; the fingerprint engine must produce identical
    counts/scores because the synthetic vocab has no hash collisions."""
    occ = []
    for i, t in texts.items():
        toks = t.split()
        occ += [(i, a, b) for a, b in zip(toks, toks[1:])]
    c_bc: dict[tuple, int] = {}
    c_b: dict[str, int] = {}
    vocab = set()
    for _, a, b in occ:
        c_bc[(a, b)] = c_bc.get((a, b), 0) + 1
        c_b[a] = c_b.get(a, 0) + 1
        vocab |= {a, b}
    V = len(vocab)
    out = {}
    for i in texts:
        trans = [(a, b) for d, a, b in occ if d == i]
        if not trans:
            out[i] = (0, None)
            continue
        nllq = sum(
            round(
                (math.log(c_b[a] * 2.0 + V * 1.0) - math.log(c_bc[(a, b)] * 2.0 + 1.0))
                * 1e9
            )
            for a, b in trans
        )
        out[i] = (len(trans), nllq)
    return out


def test_bigram_lm_matches_pure_python_reference(spark):
    from rust_triplets_spark.operators.lm_quality import bigram_lm_scores

    texts = {
        0: "the cat sat on the mat",
        1: "the cat sat on the cat",
        2: "one",
        3: "",
        4: "zz yy xx ww vv uu",
        5: "the cat sat on the mat",  # exact dup of 0 — same score
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["id"]: (r["n_transitions"], r["nll_q"])
        for r in bigram_lm_scores(df, "doc_id", "text").collect()
    }
    assert got == _lm_reference(texts)


def test_bigram_lm_ranks_gibberish_above_template(spark):
    """The quality-gate semantics: repeated boilerplate scores LOWER
    avg_nll than one-off token soup."""
    from rust_triplets_spark.operators.lm_quality import bigram_lm_scores

    rows = [(i, "click here to subscribe to our newsletter") for i in range(10)]
    rows.append((99, "qqq www eee rrr ttt yyy uuu iii"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    nll = {
        r["id"]: r["avg_nll"]
        for r in bigram_lm_scores(df, "doc_id", "text").collect()
    }
    assert nll[99] > nll[0]


def test_bigram_lm_conditionals_sum_to_one(spark):
    """Add-α with c_b = Σ_cur c_bc: for any observed context prev,
    Σ_{cur ∈ V} P(cur|prev) = (c_b + α·V) / (c_b + α·V) = 1 — checked by
    reconstructing P from the quantized per-type scores for one context."""
    from rust_triplets_spark.operators.lm_quality import (
        LM_ALPHA_DEN,
        LM_ALPHA_NUM,
        bigram_lm_scores,
    )

    # 'a' is followed by b twice, c once → c_b=3; vocab {a,b,c} V=3
    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    alpha = LM_ALPHA_NUM / LM_ALPHA_DEN
    V, c_b = 3, 3
    p_obs = (2 + alpha) / (c_b + alpha * V) + (1 + alpha) / (c_b + alpha * V)
    p_unseen = (0 + alpha) / (c_b + alpha * V)  # cur = 'a'
    assert abs(p_obs + p_unseen - 1.0) < 1e-12
    # engine agrees on the observed masses (via exp of -nll)
    scores = bigram_lm_scores(df, "doc_id", "text").collect()
    got_ab = math.exp(-next(r["nll_q"] for r in scores if r["id"] == 0) / 1e9)
    got_ac = math.exp(-next(r["nll_q"] for r in scores if r["id"] == 2) / 1e9)
    assert abs(got_ab - (2 + alpha) / (c_b + alpha * V)) < 1e-6
    assert abs(got_ac - (1 + alpha) / (c_b + alpha * V)) < 1e-6


# ---------------------------------------------------------------------------
# IVF-PQ
# ---------------------------------------------------------------------------


def _clustered(spark, dim=16, n_clusters=12, per=10, sigma=0.02, seed=11):
    rng = random.Random(seed)
    rows, vid = [], 0
    for _ in range(n_clusters):
        center = [rng.gauss(0, 1) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in center))
        center = [x / norm for x in center]
        for _ in range(per):
            rows.append((vid, [x + rng.gauss(0, sigma) for x in center]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivfpq_full_codebook_collapses_to_ivf(spark):
    """n_codes >= corpus: every subspace reconstructs its own subvector
    (d2 = 0 self-match), so IVF-PQ must equal ivf_seeded_topk
    bit-for-bit — the degenerate-to-exact contract in the docstring."""
    from rust_triplets_spark.operators.similarity import (
        ivf_seeded_topk,
        ivfpq_seeded_topk,
    )

    df = _clustered(spark, n_clusters=6, per=8)
    kw = dict(k=3, n_centroids=6, nprobe=6)
    exact = ivf_seeded_topk(df, "vec_id", "embedding", **kw).collect()
    pq = ivfpq_seeded_topk(
        df, "vec_id", "embedding", m=4, n_codes=48, **kw
    ).collect()
    key = lambda r: (r["qid"], r["rank"])
    assert sorted(map(tuple, pq), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, exact), key=lambda t: (t[0], t[1])
    )


def test_ivfpq_adc_resolves_cluster_structure(spark):
    """Pure-ADC regime: reconstruction error is bounded by the codebook,
    not the data, so ADC alone cannot rank near-equal cluster siblings —
    but it MUST place the top-1 in the query's own cluster (the structure
    PQ is built to preserve). >= 0.9 of queries."""
    from rust_triplets_spark.operators.similarity import ivfpq_seeded_topk

    per = 10
    df = _clustered(spark, per=per)
    out = ivfpq_seeded_topk(
        df, "vec_id", "embedding", k=1, m=4, n_codes=16,
        n_centroids=12, nprobe=2,
    ).collect()
    same_cluster = sum(1 for r in out if r["nid"] // per == r["qid"] // per)
    assert same_cluster / len(out) >= 0.9, same_cluster / len(out)


def test_ivfpq_rerank_recall_floor_on_clustered_data(spark):
    """Deploy-configuration recall floor: ADC candidate generation +
    exact rerank of the top-20 must recover >= 0.85 of exact top-1
    neighbors on clustered data (same floor family as the IVF kernels)."""
    from rust_triplets_spark.operators.similarity import (
        cosine_topk,
        ivfpq_seeded_topk,
    )

    df = _clustered(spark)
    exact = {
        (r["qid"], r["nid"])
        for r in cosine_topk(df, "vec_id", "embedding", queries=df, k=1).collect()
    }
    approx = {
        (r["qid"], r["nid"])
        for r in ivfpq_seeded_topk(
            df, "vec_id", "embedding", k=1, m=4, n_codes=16,
            n_centroids=12, nprobe=2, rerank=20,
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, recall


def test_ivfpq_validates_dim_divisibility(spark):
    from rust_triplets_spark.operators.similarity import (
        ivfpq_seeded_topk,
        ivfpq_seeded_topk_sql,
    )

    df = _clustered(spark, dim=10)
    with pytest.raises(ValueError, match="not divisible"):
        ivfpq_seeded_topk(df, "vec_id", "embedding", m=4)
    with pytest.raises(ValueError, match="not divisible"):
        ivfpq_seeded_topk_sql("t", "vec_id", "embedding", dim=10, m=4)


def test_ivfpq_neighbors_come_from_probed_cells(spark):
    """Structural ANN contract: every reported neighbor shares one of the
    query's nprobe cells (same contract the plain IVF kernel pins)."""
    from rust_triplets_spark.operators.similarity import (
        ivfpq_seeded_topk,
        seeded_cells,
    )

    df = _clustered(spark)
    cells = {
        r["id"]: r["cell"]
        for r in seeded_cells(df, "vec_id", "embedding",
                              n_centroids=12, seed=7000).collect()
    }
    out = ivfpq_seeded_topk(
        df, "vec_id", "embedding", k=3, m=4, n_codes=16,
        n_centroids=12, nprobe=1,
    ).collect()
    # nprobe=1: neighbor must live in the query's own (nearest) cell
    for r in out:
        assert cells[r["nid"]] == cells[r["qid"]], r


def test_ivfpq_lut_scoring_equals_recon(spark):
    """score_via='lut' (ADC proper — candidates carry m-int codes, partial
    dots looked up per subspace) must equal score_via='recon' bit-for-bit:
    the integer partial-dot sums regroup the SAME exact int64 terms."""
    from rust_triplets_spark.operators.similarity import ivfpq_seeded_topk

    df = _clustered(spark)
    kw = dict(k=3, m=4, n_codes=16, n_centroids=12, nprobe=2)
    recon = ivfpq_seeded_topk(df, "vec_id", "embedding", **kw).collect()
    lut = ivfpq_seeded_topk(
        df, "vec_id", "embedding", score_via="lut", **kw
    ).collect()
    key = lambda r: (r["qid"], r["rank"])
    assert sorted(map(tuple, lut), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, recon), key=lambda t: (t[0], t[1])
    )
    # and with the exact-rerank stage on top
    recon_r = ivfpq_seeded_topk(df, "vec_id", "embedding", rerank=10, **kw).collect()
    lut_r = ivfpq_seeded_topk(
        df, "vec_id", "embedding", rerank=10, score_via="lut", **kw
    ).collect()
    assert sorted(map(tuple, lut_r), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, recon_r), key=lambda t: (t[0], t[1])
    )
