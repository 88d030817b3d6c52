"""Model-based quality classifier — deploy-kernel pins (the feature
contract is pinned by the registered `quality_clf_features` oracle twin)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])

# two separable populations: clean English-ish prose vs symbol soup
CLEAN = ("the quick brown fox jumps over the lazy dog and that is all "
         "there was to say about the matter that day")
DIRTY = "@@ ## $$ %% ^^ && ** (( )) __ ++ == [[ ]] {{ }} || \\\\ ;; ::"


def _corpus(spark, n=60):
    rows = []
    for i in range(n):
        rows.append(Row(doc_id=i, text=f"{CLEAN} variant {i}"))
        rows.append(Row(doc_id=1000 + i, text=f"{DIRTY} v{i} ~~"))
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def scored(spark):
    from rust_triplets_spark.operators.quality_clf import (
        score_quality,
        train_quality_classifier,
    )

    docs = _corpus(spark)
    labeled = docs.withColumn(
        "label", F.when(F.col("doc_id") < 1000, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    # train on even ids, hold out odd ids
    model = train_quality_classifier(
        labeled.where("doc_id % 2 = 0"), "text", "label"
    )
    return {
        r.id: r.quality_prob
        for r in score_quality(model, docs, "doc_id").collect()
    }


def test_classifier_separates_holdout(scored):
    holdout_clean = [scored[i] for i in range(1, 60, 2)]
    holdout_dirty = [scored[1000 + i] for i in range(1, 60, 2)]
    acc = (
        sum(p > 0.5 for p in holdout_clean) + sum(p < 0.5 for p in holdout_dirty)
    ) / (len(holdout_clean) + len(holdout_dirty))
    assert acc >= 0.95
    assert all(0.0 <= p <= 1.0 for p in scored.values())


def test_training_is_deterministic(spark, scored):
    from rust_triplets_spark.operators.quality_clf import (
        score_quality,
        train_quality_classifier,
    )

    docs = _corpus(spark)
    labeled = docs.withColumn(
        "label", F.when(F.col("doc_id") < 1000, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    model2 = train_quality_classifier(
        labeled.where("doc_id % 2 = 0"), "text", "label"
    )
    again = {
        r.id: r.quality_prob
        for r in score_quality(model2, docs, "doc_id").collect()
    }
    assert again == scored  # LBFGS over a fixed frame is deterministic


def test_feature_frame_counts_bigrams_and_unigrams(spark):
    from rust_triplets_spark.operators.quality_clf import hashed_ngram_features

    df = spark.createDataFrame([Row(doc_id=0, text="a b a")], SCHEMA)
    out = hashed_ngram_features(df, "doc_id", "text").collect()
    # 3 unigrams ("a"×2 + "b") + 2 bigrams ("a b", "b a") = 5 events;
    # tf sums preserve multiplicity
    assert sum(r.tf for r in out) == 5
    assert max(r.tf for r in out) == 2  # the repeated "a"


def test_unicode_script_mix_multilingual(spark):
    """Exact per-script counts and first-max tie-break on a multilingual
    fixture, incl. null text and an all-other group."""
    from rust_triplets_spark.operators.quality import unicode_script_mix

    rows = [
        ("s1", "Hello world Привет мир"),
        ("s1", "Γειά σου κόσμε"),
        ("s2", "مرحبا بالعالم שלום עולם"),
        ("s3", "12345 !?#   "),
        ("s3", None),
        ("s4", "tie tie"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["group"]: r for r in
           unicode_script_mix(df, "source", "text").collect()}
    assert got["s1"]["latin"] == 10 and got["s1"]["cyrillic"] == 9
    assert got["s1"]["greek"] == 12 and got["s1"]["dominant_script"] == "greek"
    assert got["s2"]["arabic"] == 12 and got["s2"]["hebrew"] == 8
    assert got["s2"]["dominant_script"] == "arabic"
    assert got["s3"]["n_chars"] == 12 and got["s3"]["other"] == 12
    assert got["s3"]["dominant_script"] == "other"
    assert got["s4"]["dominant_script"] == "latin"
    # counts partition: scripts + other == n_chars
    for r in got.values():
        total = sum(r[s] for s in (
            "latin", "cyrillic", "greek", "arabic", "hebrew",
            "devanagari", "han", "hiragana", "katakana", "hangul"))
        assert total + r["other"] == r["n_chars"]
