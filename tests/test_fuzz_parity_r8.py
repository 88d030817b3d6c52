"""Randomized cross-engine parity for the mid-round-8 operators: seeded
random corpora (planted duplicate passages + shared n-grams, so every
code path actually fires) run through BOTH engines and compared
value-exactly — the whole-query analog of test_property_parity's scalar
fuzzing. Catches fixture-specific coincidences the driver corpus can't."""

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])

VOCAB = [f"w{i}" for i in range(40)] + ["the", "of", "and", "…", "€", "naïve"]


def _corpus(seed: int, n_docs: int = 60):
    rng = random.Random(seed)
    passage = " ".join(rng.choices(VOCAB, k=12))
    rows = []
    for i in range(n_docs):
        words = rng.choices(VOCAB, k=rng.randint(0, 30))
        if i % 7 == 0:  # plant the shared passage mid-document
            cut = rng.randint(0, len(words))
            words = words[:cut] + passage.split() + words[cut:]
        if i % 11 == 0 and i > 0:  # plant an exact duplicate of doc 0
            words = rows[0][1].split()
        rows.append((i, " ".join(words)))
    return rows


def _both(spark, rows, spark_fn, sql: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows], SCHEMA)
    got = spark_fn(df).toPandas()
    con = duckdb.connect()
    con.register("documents_pd", pd.DataFrame(rows, columns=["doc_id", "text"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_pd")
    want = con.sql(sql).df()
    return got, want


def _assert_match(got: pd.DataFrame, want: pd.DataFrame, ctx: str):
    assert sorted(got.columns) == sorted(want.columns), ctx
    assert len(got) == len(want), f"{ctx}: {len(got)} vs {len(want)}"
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    w = want[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    for c in cols:
        gv, wv = g[c].astype(str).to_numpy(), w[c].astype(str).to_numpy()
        assert (gv == wv).all(), f"{ctx}: col {c} differs"


@pytest.mark.parametrize("seed", [101, 202])
def test_substring_dedup_parity_on_random_corpus(spark, seed):
    from rust_triplets_spark.operators.substrings import (
        duplicate_ngram_spans,
        duplicate_ngram_spans_sql,
        excise_duplicate_spans,
        excise_duplicate_spans_sql,
    )

    rows = _corpus(seed)
    got, want = _both(
        spark, rows,
        lambda df: duplicate_ngram_spans(df, "doc_id", "text", n=4, seed=seed),
        duplicate_ngram_spans_sql("documents", "t.doc_id", "t.text", n=4, seed=seed),
    )
    assert len(got) > 0  # planted passages guarantee spans
    _assert_match(got, want, f"spans seed={seed}")
    got, want = _both(
        spark, rows,
        lambda df: excise_duplicate_spans(df, "doc_id", "text", n=4, seed=seed),
        excise_duplicate_spans_sql("documents", "t.doc_id", "t.text", n=4, seed=seed),
    )
    _assert_match(got, want, f"excise seed={seed}")


@pytest.mark.parametrize("seed", [303])
def test_contamination_fraction_parity_on_random_corpus(spark, seed):
    from rust_triplets_spark.operators.decontam import (
        contamination_fraction,
        contamination_fraction_sql,
    )

    rows = _corpus(seed)
    got, want = _both(
        spark, rows,
        lambda df: contamination_fraction(
            df.where("doc_id % 3 != 0"), df.where("doc_id % 3 = 0"),
            "doc_id", "text", n=3,
        ),
        contamination_fraction_sql(
            "SELECT * FROM documents WHERE doc_id % 3 != 0",
            "SELECT * FROM documents WHERE doc_id % 3 = 0",
            "doc_id", "text", n=3,
        ),
    )
    assert (got.contamination_frac > 0).any()  # planted overlap fires
    _assert_match(got, want, f"contamination seed={seed}")


@pytest.mark.parametrize("seed", [404])
def test_bloom_probe_parity_on_random_corpus(spark, seed):
    from pyspark.sql import functions as F

    from rust_triplets_spark.operators.bloom import (
        bloom_build,
        bloom_build_sql,
        bloom_probe,
        bloom_probe_sql,
        text_fingerprint_col,
        text_fingerprint_sql,
    )

    rows = _corpus(seed)
    m, k = 63 * 128, 4  # small filter → real false positives exercised
    fp_sql = text_fingerprint_sql("t.text")

    def run(df):
        fp = text_fingerprint_col(F.col("text"))
        filt = bloom_build(
            df.where("doc_id % 2 = 0").select(fp.alias("fp")), "fp", m, k, seed
        )
        return bloom_probe(filt, df.select("doc_id", fp.alias("fp")),
                           "doc_id", "fp", m, k, seed)

    got, want = _both(
        spark, rows, run,
        bloom_probe_sql(
            bloom_build_sql(
                f"SELECT {fp_sql} AS fp FROM documents t WHERE t.doc_id % 2 = 0",
                "fp", m, k, seed,
            ),
            f"SELECT t.doc_id AS doc_id, {fp_sql} AS fp FROM documents t",
            "doc_id", "fp", m, k, seed,
        ),
    )
    assert got.maybe_present.sum() >= len(got) // 2  # even half always hits
    _assert_match(got, want, f"bloom seed={seed}")


@pytest.mark.parametrize("seed", [505])
def test_curriculum_parity_on_random_corpus(spark, seed):
    from rust_triplets_spark.operators.curriculum import (
        curriculum_order,
        curriculum_order_sql,
    )

    rows = _corpus(seed)
    got, want = _both(
        spark, rows,
        lambda df: curriculum_order(df, "doc_id", "text", seed=seed),
        curriculum_order_sql("documents", "doc_id", "text", seed=seed),
    )
    assert len(got) == len(rows)
    _assert_match(got, want, f"curriculum seed={seed}")


@pytest.mark.parametrize("seed", [606])
def test_doremi_parity_on_random_corpus(spark, seed):
    import pandas as pd
    from pyspark.sql import Row

    from rust_triplets_spark.operators.doremi import (
        doremi_domain_weights,
        doremi_domain_weights_sql,
    )

    rows = _corpus(seed)
    # spread docs over 4 sources by id
    src_rows = [(i, t, f"s{i % 4}") for i, t in rows]
    schema = T.StructType(SCHEMA.fields + [T.StructField("source", T.StringType())])
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, source=s) for i, t, s in src_rows], schema
    )
    got = doremi_domain_weights(df, "doc_id", "text", "source").toPandas()
    con = duckdb.connect()
    con.register("documents_pd",
                 pd.DataFrame(src_rows, columns=["doc_id", "text", "source"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_pd")
    want = con.sql(
        doremi_domain_weights_sql("documents", "doc_id", "text", "source")
    ).df()
    assert abs(got.weight.sum() - 1.0) < 1e-9
    _assert_match(got, want, f"doremi seed={seed}")


@pytest.mark.parametrize("seed", [707])
def test_length_grouped_parity_on_random_corpus(spark, seed):
    from rust_triplets_spark.operators.packing import (
        length_grouped_batches,
        length_grouped_batches_sql,
        padding_efficiency,
        padding_efficiency_sql,
    )

    rows = _corpus(seed)
    got, want = _both(
        spark, rows,
        lambda df: length_grouped_batches(df, "doc_id", "text", 8, seed=seed),
        length_grouped_batches_sql("documents", "t.doc_id", "t.text", 8, seed=seed),
    )
    _assert_match(got, want, f"length_grouped seed={seed}")
    got, want = _both(
        spark, rows,
        lambda df: padding_efficiency(df, "doc_id", "text", 8, seed=seed),
        padding_efficiency_sql("documents", "t.doc_id", "t.text", 8, seed=seed),
    )
    _assert_match(got, want, f"padding seed={seed}")


def test_bpe_pairs_agree_on_hostile_whitespace(spark):
    """Java's \\s includes U+000B (vertical tab) where the pinned WS class
    does not — the bpe tokenizer must use the pinned class so both
    engines see the same tokens (regression: the original expr used \\s+)."""
    from rust_triplets_spark.operators.sketches import (
        bpe_merge_candidates,
        bpe_merge_candidates_sql,
    )

    rows = [(0, "ab\x0bcd ef"), (1, "gh ij")]
    got, want = _both(
        spark, rows,
        lambda df: bpe_merge_candidates(df, "text", top_k=20),
        bpe_merge_candidates_sql("documents", "t.text", top_k=20),
    )
    _assert_match(got, want, "bpe hostile ws")
    # the vertical tab stays INSIDE one token: the b–\x0b pair must exist
    pairs = {(r["left"], r["right"]) for _, r in got.iterrows()}
    assert ("b", "\x0b") in pairs
