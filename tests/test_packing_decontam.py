"""Invariants for sequence packing and benchmark decontamination — the
training-batch construction and hygiene steps of the pipeline."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

BUDGET = 16


@pytest.fixture(scope="module")
def toy_docs(spark):
    rows = [
        Row(doc_id=i, source=f"s{i % 2}",
            text=" ".join(f"w{(i * 7 + j) % 11}" for j in range(3 + i % 9)))
        for i in range(40)
    ]
    return spark.createDataFrame(rows)


def _packed(toy_docs):
    from rust_triplets_spark.operators.packing import pack_sequences

    return pack_sequences(toy_docs, "doc_id", "text", "source", BUDGET)


def test_packing_offsets_are_contiguous(toy_docs):
    """start offsets in seq order exactly tile the token stream: each
    document starts where the previous one ends — the defining property
    of concatenation packing."""
    rows = _packed(toy_docs).orderBy("source", "seq_idx").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src) == 2
    for src, items in by_src.items():
        expect = 0
        for i, r in enumerate(items):
            assert r.seq_idx == i, (src, i, r)
            assert r.start_tok == expect, (src, i, r)
            assert r.bin_id == r.start_tok // BUDGET
            assert r.crosses == ((r.start_tok + r.n_tok - 1) // BUDGET > r.bin_id)
            expect += r.n_tok


def test_packing_is_deterministic_and_seeded(toy_docs):
    a = {(r.id, r.start_tok) for r in _packed(toy_docs).collect()}
    b = {(r.id, r.start_tok) for r in _packed(toy_docs).collect()}
    assert a == b
    from rust_triplets_spark.operators.packing import pack_sequences

    other = {
        (r.id, r.start_tok)
        for r in pack_sequences(
            toy_docs, "doc_id", "text", "source", BUDGET, seed=7
        ).collect()
    }
    assert a != other  # a different seed is a different order


def test_packing_drops_empty_docs(spark):
    from rust_triplets_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [Row(doc_id=1, source="s", text="a b c"), Row(doc_id=2, source="s", text="   ")]
    )
    out = pack_sequences(df, "doc_id", "text", "source", BUDGET).collect()
    assert [r.id for r in out] == [1]
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "text", "source", 0)


def test_bin_stats_fill_exact(toy_docs):
    """Every bin except each source's tail is exactly full, no bin is
    missing (contiguous ids from 0), and fills total the stream length."""
    from rust_triplets_spark.operators.packing import pack_bin_stats

    packed = _packed(toy_docs)
    stats = pack_bin_stats(packed, BUDGET).collect()
    stream_len = {
        r.source: r.total
        for r in packed.groupBy("source")
        .agg(F.max(F.col("start_tok") + F.col("n_tok")).alias("total"))
        .collect()
    }
    for src in stream_len:
        bins = sorted((r for r in stats if r.source == src), key=lambda r: r.bin_id)
        assert [r.bin_id for r in bins] == list(range(len(bins)))
        assert sum(r.fill_tokens for r in bins) == stream_len[src]
        for r in bins[:-1]:
            assert r.fill_tokens == BUDGET
        assert 0 < bins[-1].fill_tokens <= BUDGET
        for r in bins:
            assert r.n_docs_overlap >= r.n_docs_start
            assert r.n_docs_overlap >= 1


def test_decontamination_flags_planted_overlap(spark):
    """A train doc sharing a 13-gram with an eval doc is flagged; disjoint
    docs are clean; short docs (< n tokens) are trivially clean."""
    from rust_triplets_spark.operators.decontam import decontaminate

    shared = " ".join(f"tok{i}" for i in range(13))
    train = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"lead in {shared} trailing words here"),
            Row(doc_id=2, text=" ".join(f"other{i}" for i in range(20))),
            Row(doc_id=3, text="too short"),
        ]
    )
    ev = spark.createDataFrame(
        [Row(doc_id=100, text=f"benchmark prompt {shared} benchmark answer")]
    )
    out = {r.id: r for r in decontaminate(train, ev, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].contaminated and out[1].n_matched_ngrams >= 1
    assert out[1].n_eval_docs == 1
    assert not out[2].contaminated and out[2].n_matched_ngrams == 0
    assert not out[3].contaminated


def test_decontamination_counts_distinct_eval_docs(spark):
    from rust_triplets_spark.operators.decontam import decontaminate

    shared = " ".join(f"tok{i}" for i in range(13))
    train = spark.createDataFrame([Row(doc_id=1, text=f"{shared} tail")])
    ev = spark.createDataFrame(
        [
            Row(doc_id=100, text=f"{shared} v1"),
            Row(doc_id=101, text=f"{shared} v2"),
        ]
    )
    out = decontaminate(train, ev, "doc_id", "text").collect()[0]
    assert out.n_eval_docs == 2


def test_decontam_plan_broadcasts_eval_side(spark, toy_docs):
    """The eval shingle frame must reach the join as a broadcast — the
    corpus side never shuffles for the match."""
    from rust_triplets_spark.operators.decontam import decontaminate

    out = decontaminate(
        toy_docs.where("doc_id % 10 <> 0"),
        toy_docs.where("doc_id % 10 = 0"),
        "doc_id",
        "text",
        n=3,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontam_sql_binds_with_id_named_id():
    """The generated oracle must bind even when the corpus id column is
    literally named `id` (the matched CTE aliases its key privately)."""
    import duckdb

    from rust_triplets_spark.operators.decontam import decontaminate_sql

    con = duckdb.connect()
    shared = " ".join(f"tok{i}" for i in range(13))
    con.execute("CREATE TABLE train_t(id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO train_t VALUES (1, ?), (2, 'clean short')", [f"{shared} tail"])
    con.execute("CREATE TABLE eval_t(id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO eval_t VALUES (9, ?)", [f"prefix {shared}"])
    sql = decontaminate_sql("SELECT * FROM train_t", "SELECT * FROM eval_t", "id", "text")
    rows = {r[0]: r for r in con.execute(sql).fetchall()}
    assert rows[1][3] is True and rows[2][3] is False


def test_validation_guards():
    from rust_triplets_spark.operators.dedup import (
        ngram_fingerprint_array_col,
        ngram_fingerprint_array_sql,
    )
    from rust_triplets_spark.operators.packing import pack_bin_stats
    from rust_triplets_spark.operators.quality import (
        repetition_signals_sql,
    )

    with pytest.raises(ValueError, match="combiner"):
        ngram_fingerprint_array_col("text", 3, 42, combiner="mix-31")
    with pytest.raises(ValueError, match="combiner"):
        ngram_fingerprint_array_sql("text", 3, 42, combiner="minhash")
    with pytest.raises(ValueError, match="at least one"):
        repetition_signals_sql("documents", "doc_id", "text", ns=())
    with pytest.raises(ValueError, match="duplicate"):
        repetition_signals_sql("documents", "doc_id", "text", ns=(2, 2))
    with pytest.raises(ValueError, match="budget"):
        pack_bin_stats(None, 0)


def test_contamination_fraction_exact_ratio(spark):
    from pyspark.sql import types as T

    from rust_triplets_spark.operators.decontam import contamination_fraction

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    # train doc 0: 6 tokens -> 4 distinct 3-grams; the first 3 tokens
    # replicate an eval trigram -> exactly 1 of 4 matches
    train = spark.createDataFrame(
        [Row(doc_id=0, text="alpha beta gamma zz yy xx"),
         Row(doc_id=1, text="nothing shared here at all now"),
         Row(doc_id=2, text="ab")],  # < n tokens -> trivially clean
        schema,
    )
    evaldf = spark.createDataFrame(
        [Row(doc_id=100, text="alpha beta gamma completely different tail")],
        schema,
    )
    out = {
        r.id: r
        for r in contamination_fraction(
            train, evaldf, "doc_id", "text", n=3
        ).collect()
    }
    assert out[0].n_total_ngrams == 4 and out[0].n_matched_ngrams == 1
    assert out[0].contamination_frac == 1.0 / 4.0
    assert out[1].n_matched_ngrams == 0 and out[1].contamination_frac == 0.0
    assert out[2].n_total_ngrams == 0 and out[2].contamination_frac == 0.0


def test_contamination_fraction_dedupes_eval_shingles(spark):
    from pyspark.sql import types as T

    from rust_triplets_spark.operators.decontam import contamination_fraction

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    train = spark.createDataFrame(
        [Row(doc_id=0, text="alpha beta gamma zz yy xx")], schema
    )
    # the SAME trigram appears in two eval docs — must count once
    evaldf = spark.createDataFrame(
        [Row(doc_id=100, text="alpha beta gamma one"),
         Row(doc_id=101, text="alpha beta gamma two")],
        schema,
    )
    row = contamination_fraction(train, evaldf, "doc_id", "text", n=3).collect()[0]
    assert row.n_matched_ngrams == 1 and row.contamination_frac == 0.25


def test_length_grouped_batches_minimize_padding(spark):
    from pyspark.sql import types as T

    from rust_triplets_spark.operators.packing import (
        length_grouped_batches,
        padding_efficiency,
    )

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    # 16 docs: 8 long (20 tokens), 8 short (2 tokens); batch_size 8 must
    # put all longs in batch 0 and all shorts in batch 1 -> zero padding
    rows = [Row(doc_id=i, text=" ".join(["w"] * (20 if i < 8 else 2)))
            for i in range(16)]
    df = spark.createDataFrame(rows, schema)
    out = {r.id: r for r in length_grouped_batches(
        df, "doc_id", "text", batch_size=8
    ).collect()}
    assert all(out[i].batch_idx == 0 for i in range(8))
    assert all(out[i].batch_idx == 1 for i in range(8, 16))
    eff = {r.batch_idx: r for r in padding_efficiency(
        df, "doc_id", "text", batch_size=8
    ).collect()}
    assert eff[0].pad_tokens == 0 and eff[1].pad_tokens == 0
    assert eff[0].max_len == 20 and eff[1].max_len == 2


def test_length_grouped_equal_lengths_shuffle_by_seed(spark):
    from pyspark.sql import types as T

    from rust_triplets_spark.operators.packing import length_grouped_batches

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    rows = [Row(doc_id=i, text="a b c") for i in range(32)]
    df = spark.createDataFrame(rows, schema)
    b1 = {r.id: r.batch_idx for r in length_grouped_batches(
        df, "doc_id", "text", 8, seed=1).collect()}
    b2 = {r.id: r.batch_idx for r in length_grouped_batches(
        df, "doc_id", "text", 8, seed=2).collect()}
    assert b1 != b2  # different epochs shuffle equal-length runs
    # deterministic per seed
    again = {r.id: r.batch_idx for r in length_grouped_batches(
        df, "doc_id", "text", 8, seed=1).collect()}
    assert again == b1
