"""Invariants for the end-to-end training funnel (plans/funnel.py) and
fuzzy MinHash decontamination (operators/decontam.py) — the composition
layer over the individually oracle-checked dedup/split/pack/shard stages."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

BUDGET = 16
N_SHARDS = 3


def _phrase(i: int, n: int = 40) -> str:
    """Per-doc token namespace: no shingle ever collides across docs."""
    return " ".join(f"d{i}w{j}" for j in range(n))


def _near_copy(text: str) -> str:
    """One middle token changed: of the 38 3-shingles only 3 break, so
    the MinHash signature agreement stays ≳0.85 — far above every band
    threshold used here (deterministic under the fixed seed)."""
    toks = text.split()
    toks[len(toks) // 2] = "CHANGED"
    return " ".join(toks)


@pytest.fixture(scope="module")
def corpus(spark):
    """40 docs in two sources with planted duplicate families: 30/31/32
    share one text (exact family), 33 is a near-copy of 3 (one token
    changed), the rest unique."""
    rows = []
    for i in range(40):
        if i in (30, 31, 32):
            text = _phrase(1000)
        elif i == 33:
            text = _near_copy(_phrase(3))
        else:
            text = _phrase(i)
        rows.append(Row(doc_id=i, source=f"s{i % 2}", text=text))
    return spark.createDataFrame(rows)


def _manifest(corpus):
    from rust_triplets_spark.plans.funnel import training_manifest

    return training_manifest(
        corpus, "doc_id", "text", "source", budget=BUDGET, n_shards=N_SHARDS
    )


def test_funnel_equals_stagewise_composition(corpus):
    """The one-plan funnel selects EXACTLY the ids the independent
    operators select when chained by hand: minhash keep=true ∩ cluster
    split=='train' ∩ n_tok>0 — the composition can't drift from its
    stages."""
    from rust_triplets_spark.functions.text import token_count_col
    from rust_triplets_spark.operators.dedup import minhash_dedup_keep
    from rust_triplets_spark.operators.splits import cluster_aware_splits

    got = {r.id for r in _manifest(corpus).select("id").collect()}
    keep = {
        r.id
        for r in minhash_dedup_keep(corpus, "doc_id", "text")
        .where("keep")
        .collect()
    }
    train = {
        r.id
        for r in cluster_aware_splits(corpus, "doc_id", "text")
        .where(F.col("split") == "train")
        .collect()
    }
    nonempty = {
        r.doc_id
        for r in corpus.where(token_count_col("text") > 0).collect()
    }
    assert got == (keep & train & nonempty)
    assert got  # the gate must not be vacuous on this corpus


def test_funnel_excludes_non_rep_family_members(corpus):
    """The exact-duplicate family (30,31,32) contributes at most its
    min-id rep; 33 (near-copy of 3) and 3 are in one cluster so at most
    one of them survives."""
    ids = {r.id for r in _manifest(corpus).select("id").collect()}
    assert not ids & {31, 32}  # non-rep family members never survive
    assert not (ids >= {3, 33})  # near-copies can't BOTH survive


def test_funnel_pack_offsets_and_shard_ranks(corpus):
    """Inherited stage invariants hold through the composition: per-source
    offsets tile the token stream; per-shard positions are dense 0..n-1."""
    rows = _manifest(corpus).collect()
    by_src = {}
    for r in sorted(rows, key=lambda r: (r.source, r.seq_idx)):
        by_src.setdefault(r.source, []).append(r)
    for src, items in by_src.items():
        expect = 0
        for r in items:
            assert r.start_tok == expect, (src, r)
            assert r.bin_id == r.start_tok // BUDGET
            expect += r.n_tok
    by_shard = {}
    for r in rows:
        assert 0 <= r.shard < N_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard


def test_funnel_is_deterministic(corpus):
    a = sorted((r.id, r.start_tok, r.shard, r.pos) for r in _manifest(corpus).collect())
    b = sorted((r.id, r.start_tok, r.shard, r.pos) for r in _manifest(corpus).collect())
    assert a == b


@pytest.fixture(scope="module")
def split_corpora(spark):
    """Train/eval frames with planted leaks: train 0 is an EXACT copy of
    eval 100; train 1 is a near-copy (one token changed) of eval 101;
    train 2.. are unrelated."""
    ev = [
        Row(doc_id=100, text=_phrase(500)),
        Row(doc_id=101, text=_phrase(501)),
        Row(doc_id=102, text=_phrase(502)),
    ]
    tr = [Row(doc_id=0, text=_phrase(500)),
          Row(doc_id=1, text=_near_copy(_phrase(501)))]
    tr += [Row(doc_id=i, text=_phrase(i)) for i in range(2, 12)]
    return spark.createDataFrame(tr), spark.createDataFrame(ev)


def test_fuzzy_decontaminate_flags_planted_leaks(split_corpora):
    from rust_triplets_spark.operators.decontam import fuzzy_decontaminate

    train, ev = split_corpora
    rows = {
        r.id: r
        for r in fuzzy_decontaminate(
            train, ev, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert set(rows) == set(range(12))  # complete frame, one row per train doc
    assert rows[0].contaminated and rows[0].max_est_jaccard == 1.0  # exact copy
    assert rows[1].contaminated  # near-copy: most signature slots agree
    assert rows[1].max_est_jaccard >= 0.5
    for i in range(2, 12):
        assert not rows[i].contaminated, i
        assert rows[i].n_eval_matches == 0


def test_fuzzy_decontaminate_threshold_gates_flag(split_corpora):
    """A threshold above the near-copy's estimate keeps the candidate
    visible (n_candidates) but clears the flag — the audit/act split."""
    from rust_triplets_spark.operators.decontam import fuzzy_decontaminate

    train, ev = split_corpora
    rows = {
        r.id: r
        for r in fuzzy_decontaminate(
            train, ev, "doc_id", "text", threshold=1.0
        ).collect()
    }
    assert rows[0].contaminated  # the exact copy still trips at 1.0
    assert not rows[1].contaminated  # the near-copy no longer does
    assert rows[1].n_candidates >= 1  # but remains auditable


def test_corpus_datasheet_metrics_are_exact(spark):
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from rust_triplets_spark.plans.datasheet import corpus_datasheet

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    rows = [
        Row(doc_id=0, text="alpha beta gamma", source="s1", lang="en"),
        Row(doc_id=1, text="alpha beta gamma", source="s1", lang="en"),  # exact dup
        Row(doc_id=2, text="delta epsilon", source="s2", lang="de"),
        Row(doc_id=3, text="", source="s2", lang="de"),  # empty
    ]
    got = {r.metric: r.value for r in corpus_datasheet(
        spark.createDataFrame(rows, schema), "doc_id", "text", "source", "lang"
    ).collect()}
    assert got["n_docs"] == 4.0
    assert got["n_sources"] == 2.0 and got["n_langs"] == 2.0
    assert got["total_tokens"] == 8.0
    assert got["mean_doc_tokens"] == 2.0
    assert got["empty_doc_frac"] == 0.25
    assert got["exact_dup_frac"] == 0.25  # 3 distinct fingerprints / 4 docs
    assert 0.0 <= got["gopher_pass_frac"] <= 1.0
    assert len(got) == 9


def test_text_granularity_funnel_excision_order_sensitivity(spark):
    """The composed funnel's documented order (paragraph → line →
    substring) is load-bearing: substring excision re-joins surviving
    tokens with single spaces, destroying the line structure the
    boilerplate stage keys on. Three docs share a 7-token banner line;
    in the documented order the line stage removes it from ALL three,
    while the swapped order (substring first) removes nothing — the
    banner survives in every doc."""
    from pyspark.sql import functions as F

    from rust_triplets_spark.operators.lines import boilerplate_line_dedup
    from rust_triplets_spark.operators.substrings import excise_duplicate_spans
    from rust_triplets_spark.plans.funnel import text_granularity_funnel

    banner = "click accept cookies to continue browsing here"
    rows = [
        (1, "alpha beta gamma delta epsilon zeta\n" + banner),
        (2, "one two three four five six seven\n" + banner),
        (3, "red orange yellow green blue indigo\n" + banner),
    ]
    df = spark.createDataFrame(rows, "id long, text string")

    out = {
        r["name"]: (r["n_docs"], r["n_tokens"])
        for r in text_granularity_funnel(
            df, "id", "text", min_line_docs=3
        ).collect()
    }
    # 6+7 / 7+7 / 6+7 tokens; single \n so each doc is ONE paragraph
    assert out["raw"] == (3, 40)
    assert out["paragraph"] == (3, 40)
    # the banner line (3 docs >= min_line_docs) drops from every doc
    assert out["line"] == (3, 19)
    # remaining lines are distinct and shorter than SPAN_N windows
    assert out["substring"] == (3, 19)
    assert out["minhash"] == (3, 19)

    # swapped order: substring excision first (no cross-doc 8-token
    # window exists — every window crosses into doc-specific tokens),
    # then line dedup sees single-line docs and removes NOTHING
    sub_first = excise_duplicate_spans(df, "id", "text").select(
        "id", F.col("clean_text").alias("text")
    )
    swapped = boilerplate_line_dedup(sub_first, "id", "text", 3)
    assert swapped.agg(F.sum("n_removed")).collect()[0][0] == 0
    n_tok = sub_first.agg(
        F.sum(F.size(F.split("text", r"\s+")))
    ).collect()[0][0]
    assert n_tok == 40  # the banner survives in all three docs
